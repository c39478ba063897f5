"""Feature Finder tests: known minibrot nuclei as ground truth
(the reference validates its NR loop against
EvaluateCriticalOrbitAndDerivsMT the same way, TestNewtonRaphson.cpp)."""

import numpy as np
import pytest

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.feature_finder import (
    FeatureSummary, evaluate_critical_orbit_and_derivs,
    find_period_candidate, find_periodic_point, refine_periodic_point,
    resume_refinement)

# period-3 nucleus on the real axis: root of c³ + 2c² + c + 1 = 0
PERIOD3_RE = "-1.754877666246692760049520"


def test_evaluate_orbit_derivs_vs_f64():
    cx = HighPrecision("-0.15", prec=128)
    cy = HighPrecision("0.4", prec=128)
    z_x, z_y, d_x, d_y = evaluate_critical_orbit_and_derivs(
        cx, cy, 6, 128)[:4]
    # f64 oracle
    c = complex(-0.15, 0.4)
    z = c
    dz = 1 + 0j
    for _ in range(5):
        dz = 2 * z * dz + 1
        z = z * z + c
    assert abs(float(z_x) - z.real) < 1e-12
    assert abs(float(z_y) - z.imag) < 1e-12
    assert abs(float(d_x) - dz.real) < 1e-10
    assert abs(float(d_y) - dz.imag) < 1e-10


def test_newton_converges_to_period3_nucleus():
    # start slightly off the nucleus
    cx = HighPrecision("-1.754", prec=256)
    cy = HighPrecision("0.0005", prec=256)
    feat = refine_periodic_point(cx, cy, 3, 256)
    assert abs(float(feat.center_x) - float(
        HighPrecision(PERIOD3_RE))) < 1e-20
    assert abs(float(feat.center_y)) < 1e-20
    # residual z_3(c) tiny
    assert feat.residual_exp2 < -200


def test_halley_converges_too():
    cx = HighPrecision("-1.754", prec=256)
    cy = HighPrecision("0.0003", prec=256)
    feat = refine_periodic_point(cx, cy, 3, 256, method="halley")
    assert abs(float(feat.center_x) - float(
        HighPrecision(PERIOD3_RE))) < 1e-18
    assert feat.diagnostics["method"] == "halley"


def test_find_period_candidate():
    # tiny view centered near the period-3 nucleus
    c = HighPrecision(PERIOD3_RE, prec=256)
    period = find_period_candidate(
        c, HighPrecision("1e-7", prec=64), HighPrecision("1e-5", prec=64),
        100, prec=256)
    # detection reports orbit-entry count = true period + 1 (zero seed)
    assert period - 1 == 3


def test_find_periodic_point_end_to_end():
    ptz = PointZoomBBConverter(pt_x="-1.7549", pt_y="1e-6",
                               zoom_factor="1e4", prec=256)
    feat = find_periodic_point(ptz, max_period=50)
    assert feat is not None
    assert feat.period == 3
    assert abs(float(feat.center_x) - float(
        HighPrecision(PERIOD3_RE))) < 1e-15
    # zoom-to-feature: size estimate within a few orders of the known
    # period-3 minibrot scale (~0.03 across)
    size = feat.size_estimate.to_float()
    assert 1e-4 < size < 1.0


def test_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "nr.json")
    cx = HighPrecision("-1.754", prec=256)
    cy = HighPrecision("0.0004", prec=256)
    # run only 2 steps, checkpointing
    partial = refine_periodic_point(cx, cy, 3, 256, max_steps=2,
                                    checkpoint_path=ck)
    assert partial.nr_iterations == 2
    resumed = resume_refinement(ck)
    assert abs(float(resumed.center_x) - float(
        HighPrecision(PERIOD3_RE))) < 1e-20
    assert resumed.nr_iterations > 2


def test_deep_feature_period859():
    """The zoom-1e8 test view sits on a period-858 island; the finder
    must lock onto it and drive the residual to ~0."""
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512)
    feat = find_periodic_point(ptz, max_period=3000)
    assert feat is not None
    assert feat.period == 858
    assert feat.residual_exp2 < -100  # |z_858| ≲ 1e-30: a true nucleus
    # the nucleus lies near the (approximately-published) view center
    dist = float(((feat.center_x - ptz.pt_x) ** 2 +
                  (feat.center_y - ptz.pt_y) ** 2).sqrt())
    assert dist < 1e-6
    # and the island size is consistent with the zoom that showcases
    # it (intrinsic radius 4/|zcoeff*dzdc|, the Imagina formula --
    # this island sits at ~1e12 zoom, so its size is ~1e-10 scale)
    assert 1e-11 < feat.size_estimate.to_float() < 1e-7


def test_grid_scan_finds_minibrot():
    """Grid-scan mode (reference DirectScan/PTScan/LAScan,
    FeatureFinderOrchestrator.cpp:537): cell centers at (2g+1)/(2N)
    screen fractions; the cell landing in the period-3 atom domain
    must detect and refine the nucleus."""
    from fractalshark_tpu.core.highprecision import HighPrecision as HP
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine.feature_finder import (
        find_periodic_points_scan)
    ptz = PointZoomBBConverter(pt_x=HP("-1.75487766624669276"),
                               pt_y=HP("0"),
                               zoom_factor=HP("100000"))
    feats = find_periodic_points_scan(ptz, 64, grid=(3, 3))
    assert len(feats) >= 1
    assert feats[0].period == 3
    assert abs(float(feats[0].center_x) -
               (-1.754877666246692760049520)) < 1e-15
    assert feats[0].residual_exp2 < -100


def test_scan_commands_dispatch():
    from fractalshark_tpu.core.commands import (FractalCommand,
                                                find_command_for_key)
    assert find_command_for_key("n", ctrl=True) == \
        FractalCommand.FEATUREFINDER_DIRECT_SCAN
    assert find_command_for_key("m", ctrl=True) == \
        FractalCommand.FEATUREFINDER_PT_SCAN


def test_pt_scan_agrees_with_direct():
    """The PT evaluator policy (one reference orbit + f64 delta
    probes, FeatureFinderMode::PT) must find the same feature as the
    direct full-precision policy."""
    from fractalshark_tpu.core.highprecision import HighPrecision as HP
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine.feature_finder import (
        find_periodic_points_scan)
    ptz = PointZoomBBConverter(pt_x=HP("-1.75487766624669276"),
                               pt_y=HP("0"),
                               zoom_factor=HP("100000"))
    direct = find_periodic_points_scan(ptz, 64, grid=(3, 3),
                                       mode="direct")
    pt = find_periodic_points_scan(ptz, 64, grid=(3, 3), mode="pt")
    assert [f.period for f in direct] == [f.period for f in pt] == [3]
    assert abs(float(direct[0].center_x) -
               float(pt[0].center_x)) < 1e-14


def test_la_scan_agrees_with_pt():
    """The LA evaluator policy (FeatureFinderMode::LA — stage-0 LA
    skips with a can't-fire guard, exact PT tail near minima) must
    find the same feature as the PT policy."""
    from fractalshark_tpu.core.highprecision import HighPrecision as HP
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine.feature_finder import (
        find_periodic_points_scan)
    ptz = PointZoomBBConverter(pt_x=HP("-1.75487766624669276"),
                               pt_y=HP("0"),
                               zoom_factor=HP("100000"))
    pt = find_periodic_points_scan(ptz, 64, grid=(3, 3), mode="pt")
    la = find_periodic_points_scan(ptz, 64, grid=(3, 3), mode="la")
    assert [f.period for f in la] == [f.period for f in pt] == [3]
    assert abs(float(la[0].center_x) - float(pt[0].center_x)) < 1e-14


def test_la_evaluator_skips_on_deep_view():
    """On a deeper view with a real LA table the LA evaluator agrees
    with PT while touching far fewer per-iteration steps (the guard
    lets whole stage-0 spans be skipped)."""
    from fractalshark_tpu.core.hdr_host import HD
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine import feature_finder as FF
    from fractalshark_tpu.engine.la_reference import LAReferenceHost
    from fractalshark_tpu.engine.reforbit import RefOrbitCalc
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(8, 8)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 5000)
    radius = ptz.radius
    la = LAReferenceHost.generate_auto(res.orbit_x, res.orbit_y,
                                       HD.from_hp(radius))
    # probe a handful of nearby candidate points
    from fractalshark_tpu.core.highprecision import HighPrecision as HP
    span = ptz.max_x - ptz.min_x
    for k in range(4):
        cx = (ptz.pt_x + span * HP(2 * k - 3) / HP(32)).with_precision(512)
        cy = ptz.pt_y.with_precision(512)
        p_pt = FF.find_period_candidate_pt(res, cx, cy, radius, 5000)
        p_la = FF.find_period_candidate_la(res, la, cx, cy, radius, 5000)
        assert p_pt == p_la, (k, p_pt, p_la)
