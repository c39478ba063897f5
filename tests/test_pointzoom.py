"""PointZoomBBConverter tests (mirrors reference
TestPointZoomBBConverter.cpp coverage)."""

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.core.precision import precision_from_view
from fractalshark_tpu.core.views import get_view_preset


def test_home_view():
    # View 0: (0, 0, zoom 1) → box [-2, 2]² (Factor = 2)
    ptz = PointZoomBBConverter(pt_x="0", pt_y="0", zoom_factor="1")
    assert float(ptz.min_x) == -2.0
    assert float(ptz.max_x) == 2.0
    assert float(ptz.min_y) == -2.0
    assert float(ptz.max_y) == 2.0
    assert float(ptz.radius) == 2.0


def test_bb_round_trip():
    ptz = PointZoomBBConverter(pt_x="-0.75", pt_y="0.1", zoom_factor="1e5")
    bb = PointZoomBBConverter(min_x=ptz.min_x, min_y=ptz.min_y,
                              max_x=ptz.max_x, max_y=ptz.max_y)
    assert abs(float(bb.pt_x) - (-0.75)) < 1e-12
    assert abs(float(bb.pt_y) - 0.1) < 1e-12
    assert abs(float(bb.zoom_factor) - 1e5) / 1e5 < 1e-12


def test_screen_calc_round_trip():
    ptz = PointZoomBBConverter(pt_x="-0.5", pt_y="0.25", zoom_factor="10")
    w, h = 800, 600
    for sx, sy in [(0, 0), (400, 300), (799, 599)]:
        cx = ptz.x_screen_to_calc(sx, w)
        cy = ptz.y_screen_to_calc(sy, h)
        assert abs(ptz.x_calc_to_screen(cx, w) - sx) < 1e-6
        assert abs(ptz.y_calc_to_screen(cy, h) - sy) < 1e-6


def test_zoom_at_center():
    ptz = PointZoomBBConverter(pt_x="0", pt_y="0", zoom_factor="1")
    z = ptz.zoomed_at_center(2.0)
    assert float(z.max_x) == 1.0
    assert float(z.pt_x) == 0.0


def test_zoom_toward_point_keeps_target():
    ptz = PointZoomBBConverter(pt_x="0", pt_y="0", zoom_factor="1")
    target = (HighPrecision("0.5"), HighPrecision("-0.25"))
    sx0 = ptz.x_calc_to_screen(target[0], 100)
    z = ptz.zoomed_toward_point(target[0], target[1], 4.0)
    sx1 = z.x_calc_to_screen(target[0], 100)
    assert abs(sx0 - sx1) < 1e-9
    assert float(z.zoom_factor) == 4.0


def test_square_aspect_expands():
    ptz = PointZoomBBConverter(pt_x="0", pt_y="0", zoom_factor="1")
    wide = ptz.square_aspect_ratio(200, 100)
    # width doubles, height unchanged
    assert float(wide.max_x - wide.min_x) == 8.0
    assert float(wide.max_y - wide.min_y) == 4.0
    tall = ptz.square_aspect_ratio(100, 200)
    assert float(tall.max_x - tall.min_x) == 4.0
    assert float(tall.max_y - tall.min_y) == 8.0


def test_pan():
    ptz = PointZoomBBConverter(pt_x="0", pt_y="0", zoom_factor="1")
    p = ptz.panned("0.5", "-0.5")
    assert float(p.pt_x) == 0.5
    assert float(p.pt_y) == -0.5
    assert float(p.zoom_factor) == 1.0


def test_all_views_parse():
    from fractalshark_tpu.core.views import num_views
    assert num_views() == 33
    for i in range(33):
        v = get_view_preset(i)
        assert not v.ptz.degenerate(), i
        assert v.num_iterations > 0


def test_view5_consistency():
    v = get_view_preset(5)
    assert v.num_iterations == 4718592
    # zoom factor == 2*Factor/deltaY
    dy = v.ptz.max_y - v.ptz.min_y
    prod = v.ptz.zoom_factor * dy
    assert abs(float(prod) - 4.0) < 1e-10


def test_view30_depth():
    import math
    v = get_view_preset(30)
    assert v.num_iterations == 200_000_000
    expected_exp = 114514 * math.log2(10)
    assert abs(-v.ptz.radius.exponent2() - expected_exp) < 16


def test_precision_calculator():
    v0 = get_view_preset(0)
    assert precision_from_view(v0.ptz) < 200
    v30 = get_view_preset(30)
    p30 = precision_from_view(v30.ptz)
    assert 380_000 < p30 < 381_000  # ~114514*log2(10) + 120
    assert precision_from_view(v30.ptz, requires_reuse=True) == p30 + 680
