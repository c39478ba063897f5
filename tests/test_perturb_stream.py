"""Streaming (HBM-windowed, lockstep-sweep) perturbation kernel vs the
XLA reference implementation (interpret mode on CPU; the TPU path is
exercised by bench)."""

import numpy as np
import pytest

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.reforbit import RefOrbitCalc
from fractalshark_tpu.ops import perturb
from fractalshark_tpu.ops.perturb_stream import perturb_render_stream


@pytest.fixture(scope="module")
def deep():
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(64, 64)
    calc = RefOrbitCalc()
    return ptz, calc.get_and_create_useful_results(ptz, 2000)


def test_stream_matches_xla_bit_exact(deep):
    ptz, res = deep
    out = perturb_render_stream(res, ptz, 64, 64, 2000, tile_h=32,
                                interpret=True)
    assert out is not None
    xla = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 64, 64, 2000, sub_dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(out), xla)


def test_stream_nondivisible_dims(deep):
    ptz, res = deep
    out = perturb_render_stream(res, ptz, 50, 37, 1000, tile_h=16,
                                interpret=True)
    xla = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 50, 37, 1000, sub_dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(out), xla)


def test_stream_multi_window(deep):
    """Orbit spanning several WIN-sized windows (rebases force extra
    sweeps) still matches the gather-based XLA path."""
    ptz, res = deep
    assert res.count_orbit_entries() > 512, "fixture must span windows"
    out = perturb_render_stream(res, ptz, 32, 32, 1800, tile_h=16,
                                interpret=True)
    xla = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 32, 32, 1800, sub_dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(out), xla)


def _fake_results(x, y, cx, cy):
    import types

    import numpy as np

    def device_orbit(dtype=np.float64):
        xx = x.astype(dtype)
        yy = y.astype(dtype)
        return (np.concatenate([xx, xx[-1:]]),
                np.concatenate([yy, yy[-1:]]))

    return types.SimpleNamespace(
        count_orbit_entries=lambda: len(x),
        max_ref_iteration=lambda: len(x) - 1,
        device_orbit=device_orbit, center_x=cx, center_y=cy)


def _df32_reconstruct(comp):
    """Host mirror of the kernel's double-float reconstruction (exact
    same IEEE f32 operation sequence); returns the f32 orbit the kernel
    sees."""
    f = np.float32
    split_c = f(4097.0)  # 2^12 + 1 (Dekker splitter for f32)

    def two_sum(a, b):
        s = f(a + b)
        bb = f(s - a)
        e = f(f(a - f(s - bb)) + f(b - bb))
        return s, e

    def quick_two_sum(a, b):
        s = f(a + b)
        return s, f(b - f(s - a))

    def split(a):
        c = f(split_c * a)
        hi = f(c - f(c - a))
        return hi, f(a - hi)

    def two_prod(a, b):
        p = f(a * b)
        ah, al = split(a)
        bh, bl = split(b)
        e = f(f(f(f(ah * bh) - p) + f(ah * bl) + f(al * bh)) + f(al * bl))
        return p, e

    def df_add(a, b):
        s1, s2 = two_sum(a[0], b[0])
        t1, t2 = two_sum(a[1], b[1])
        s2 = f(s2 + t1)
        s1, s2 = quick_two_sum(s1, s2)
        s2 = f(s2 + t2)
        return quick_two_sum(s1, s2)

    def df_sub(a, b):
        return df_add(a, (f(-b[0]), f(-b[1])))

    def df_mul(a, b):
        p1, p2 = two_prod(a[0], b[0])
        p2 = f(f(p2 + f(a[0] * b[1])) + f(a[1] * b[0]))
        return quick_two_sum(p1, p2)

    def df_sqr(a):
        p1, p2 = two_prod(a[0], a[0])
        p2 = f(p2 + f(f(f(2.0) * a[0]) * a[1]))
        return quick_two_sum(p1, p2)

    cx = (f(comp.cx_low), f(comp.cx_low - float(f(comp.cx_low))))
    cy = (f(comp.cy_low), f(comp.cy_low - float(f(comp.cy_low))))
    n = comp.total_count
    ox = np.empty(n, np.float32)
    oy = np.empty(n, np.float32)
    ai = comp.anchor_index
    a = 0
    zx = zy = (f(0), f(0))
    for i in range(n):
        if a < len(ai) and ai[a] == i:
            xh = f(comp.anchors_x[a])
            yh = f(comp.anchors_y[a])
            zx = (xh, f(comp.anchors_x[a] - float(xh)))
            zy = (yh, f(comp.anchors_y[a] - float(yh)))
            a += 1
        else:
            x2 = df_sqr(zx)
            y2 = df_sqr(zy)
            xy = df_mul(zx, zy)
            nzx = df_add(df_sub(x2, y2), cx)
            nzy = df_add((f(xy[0] * 2), f(xy[1] * 2)), cy)
            zx, zy = nzx, nzy
        ox[i] = zx[0]
        oy[i] = zy[0]
    return ox, oy


def test_rc_kernel_matches_df32_mirror(deep):
    """On-device decompression (anchors + in-kernel df32 recurrence,
    Perturb.cuh:8-120 analogue): bit-exact against a host mirror of the
    same reconstruction arithmetic, even at a coarse threshold where
    long spans amplify rounding."""
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc

    ptz, res = deep
    comp = CompressedOrbit.from_uncompressed(res, error_exp=8)
    assert comp.compression_ratio() > 1.5, "want real compression"
    rc = perturb_render_stream_rc(comp, res.center_x, res.center_y,
                                  ptz, 48, 48, 1800, tile_h=16,
                                  interpret=True)
    mx, my = _df32_reconstruct(comp)
    fake = _fake_results(mx, my, res.center_x, res.center_y)
    plain = perturb_render_stream(fake, ptz, 48, 48, 1800, tile_h=16,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(plain))


def test_rc_kernel_default_threshold_exact(deep):
    """At the reference default error exponent (20) reconstruction is
    f32-exact, so the RC render equals the uncompressed render."""
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc

    ptz, res = deep
    comp = CompressedOrbit.from_uncompressed(res, error_exp=20)
    rc = perturb_render_stream_rc(comp, res.center_x, res.center_y,
                                  ptz, 48, 48, 1800, tile_h=16,
                                  interpret=True)
    plain = perturb_render_stream(res, ptz, 48, 48, 1800, tile_h=16,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(plain))


def test_stream_chunked_relaunch_bit_exact(deep):
    """launch_windows=1 forces a host relaunch per window (suspend /
    resume through the per-tile state); must be invisible."""
    ptz, res = deep
    one = perturb_render_stream(res, ptz, 48, 48, 1500, tile_h=16,
                                interpret=True)
    many = perturb_render_stream(res, ptz, 48, 48, 1500, tile_h=16,
                                 interpret=True, launch_windows=1)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(many))


def test_lav2_rc_two_phase_matches_full(deep):
    """LAv2-RC: LA phase to tail entry, then the RC streaming tail
    from the compressed orbit with per-pixel jwait handoff — must
    reproduce the one-kernel FULL LAv2 render at the default error
    exponent (reconstruction is f32-exact there)."""
    from fractalshark_tpu.core.hdr_host import HD
    from fractalshark_tpu.engine.la_reference import LAReferenceHost
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    from fractalshark_tpu.ops import la_kernel
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc

    ptz, res = deep
    la = LAReferenceHost.generate(res.orbit_x, res.orbit_y,
                                  HD.from_hp(res.max_radius))
    assert la.is_valid
    n = 1800
    full = np.asarray(la_kernel.la_perturb_render(
        res, la, ptz, 32, 32, n, sub_dtype=np.float32))
    state = la_kernel.la_perturb_render(
        res, la, ptz, 32, 32, n, sub_dtype=np.float32,
        la_only=True, return_state=True)
    _, _, ref_iter, dzr, dzi, dze, it, _ = state
    it32 = np.asarray(it).astype(np.int32)
    init = {"dzr": np.asarray(dzr), "dzi": np.asarray(dzi),
            "dze": np.asarray(dze), "it": it32,
            "jwait": np.asarray(ref_iter).astype(np.int32),
            "done": (it32 >= n).astype(np.int32)}
    comp = CompressedOrbit.from_uncompressed(res, error_exp=20)
    rc = np.asarray(perturb_render_stream_rc(
        comp, res.center_x, res.center_y, ptz, 32, 32, n,
        tile_h=16, interpret=True, init_state=init))
    match = (rc == full).mean()
    assert match >= 0.995, match


def test_abort_monitor_semantics(deep):
    """A live (non-aborted) monitor must NOT stop the render (the
    .aborted attribute is a METHOD — regression for truthiness bugs);
    a pre-aborted monitor stops between launches."""
    from fractalshark_tpu.utils.aux import AbortMonitor

    ptz, res = deep
    mon = AbortMonitor()
    try:
        full = perturb_render_stream(res, ptz, 32, 32, 1200, tile_h=16,
                                     interpret=True, launch_windows=1,
                                     abort_monitor=mon)
        ref = perturb_render_stream(res, ptz, 32, 32, 1200, tile_h=16,
                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(ref))
        mon.flag.set()
        partial = perturb_render_stream(res, ptz, 32, 32, 1200,
                                        tile_h=16, interpret=True,
                                        launch_windows=1,
                                        abort_monitor=mon)
        assert int(np.asarray(partial).max()) <= int(np.asarray(ref).max())
    finally:
        mon.close()


def test_identity_two_phase_matches_full_exactly(deep):
    """Identity anchors (every entry stored) make the RC tail an EXACT
    streaming evaluator: the two-phase render must equal the one-kernel
    FULL LAv2 machine pixel for pixel (the TPU dispatch default)."""
    from fractalshark_tpu.core.hdr_host import HD
    from fractalshark_tpu.engine.la_reference import LAReferenceHost
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    from fractalshark_tpu.ops import la_kernel
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc

    ptz, res = deep
    la = LAReferenceHost.generate(res.orbit_x, res.orbit_y,
                                  HD.from_hp(res.max_radius))
    assert la.is_valid
    n = 1800
    full = np.asarray(la_kernel.la_perturb_render(
        res, la, ptz, 32, 32, n, sub_dtype=np.float32))
    state = la_kernel.la_perturb_render(
        res, la, ptz, 32, 32, n, sub_dtype=np.float32,
        la_only=True, return_state=True)
    _, _, ref_iter, dzr, dzi, dze, it, _ = state
    it32 = np.asarray(it).astype(np.int32)
    init = {"dzr": np.asarray(dzr), "dzi": np.asarray(dzi),
            "dze": np.asarray(dze), "it": it32,
            "jwait": np.asarray(ref_iter).astype(np.int32),
            "done": (it32 >= n).astype(np.int32)}
    two = np.asarray(perturb_render_stream_rc(
        CompressedOrbit.identity(res), res.center_x, res.center_y,
        ptz, 32, 32, n, tile_h=16, interpret=True, init_state=init))
    np.testing.assert_array_equal(two, full)


def _escaping_view():
    """Every pixel escapes within ~40 iterations (center well outside
    the set) — a >2^31 budget exercises the 64-bit compare/decrement
    path without ever running 2^31 steps."""
    ptz = PointZoomBBConverter(pt_x="0.8", pt_y="0.5",
                               zoom_factor="100", prec=128)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 1000)
    return ptz, res


def test_stream_64bit_budget_matches_32bit():
    """A >2^31 iteration budget through the streaming kernel
    (remaining-count hi/lo pairs, IterTypeEnum::Bits64,
    RenderAlgorithm.h:81-159): identical per-pixel counts to a small-
    budget render on an everywhere-escaping view, returned as uint64."""
    ptz, res = _escaping_view()
    big = (1 << 31) + 12345
    out = perturb_render_stream(res, ptz, 24, 24, big, tile_h=8,
                                interpret=True)
    assert out is not None
    got = np.asarray(out)
    assert got.dtype == np.uint64
    small = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 24, 24, 1000, sub_dtype=np.float32))
    assert (small < 1000).all(), "view must escape everywhere"
    np.testing.assert_array_equal(got.astype(np.int64),
                                  small.astype(np.int64))


def test_rem_borrow_path(deep, monkeypatch):
    """Shrink the remaining-count radix so the hi/lo borrow executes
    many times within an ordinary render; counts must be identical to
    the untouched kernel."""
    import fractalshark_tpu.ops.perturb_stream as ps
    ptz, res = deep
    want = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 16, 16, 1800, sub_dtype=np.float32))
    monkeypatch.setattr(ps, "REM_LOG", 6)     # borrow every 64 steps
    # NOTE: distinct (w, h, budget) from every other test in this file
    # so the jit cache cannot reuse a trace made at REM_LOG=30
    out = ps.perturb_render_stream(res, ptz, 16, 16, 1800, tile_h=8,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(out).astype(np.int64),
                                  want.astype(np.int64))


def test_rc_64bit_budget_and_jwait_pairs():
    """RC kernel with a >2^31 budget: (window, local) orbit-position
    pairs + remaining pairs; identical counts to the 32-bit-budget RC
    render on an everywhere-escaping view."""
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc
    ptz, res = _escaping_view()
    comp = CompressedOrbit.from_uncompressed(res, error_exp=20)
    small = np.asarray(perturb_render_stream_rc(
        comp, res.center_x, res.center_y, ptz, 24, 16, 1900,
        tile_h=8, interpret=True))
    big = (1 << 31) + 7
    out = perturb_render_stream_rc(
        comp, res.center_x, res.center_y, ptz, 24, 16, big,
        tile_h=8, interpret=True)
    got = np.asarray(out)
    assert got.dtype == np.uint64
    assert (small < 1900).all()
    np.testing.assert_array_equal(got.astype(np.int64),
                                  small.astype(np.int64))


def test_rc_orbit_positions_beyond_2_31():
    """A compressed orbit whose TOTAL COUNT exceeds 2^31 entries
    (View #27 class, period ~28B, Notes/FractalShark-06-RefOrbit.tex:
    744-747): the (window, local) position pairs must address it
    without overflow.  Every pixel escapes within the first windows
    (anchors cover the live prefix), so counts must equal the plain
    short-orbit render."""
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc
    ptz, res = _escaping_view()
    ident = CompressedOrbit.identity(res)
    big_total = (1 << 31) + 4096
    comp = CompressedOrbit(
        anchors_x=ident.anchors_x, anchors_y=ident.anchors_y,
        anchor_index=ident.anchor_index, total_count=big_total,
        cx_low=ident.cx_low, cy_low=ident.cy_low,
        error_exp=ident.error_exp)
    out = perturb_render_stream_rc(
        comp, res.center_x, res.center_y, ptz, 16, 24, 1700,
        tile_h=8, interpret=True)
    small = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 16, 24, 1700, sub_dtype=np.float32))
    assert (small < 1700).all(), "view must escape everywhere"
    np.testing.assert_array_equal(np.asarray(out).astype(np.int64),
                                  small.astype(np.int64))


def test_budget_ladder_helpers():
    """Measured-escalation ladder: static rungs, escalate only after a
    fast launch, de-escalate after a slow one, clamp at the ends."""
    from fractalshark_tpu.ops.perturb_stream import (_budget_ladder,
                                                     _next_rung)
    lad = _budget_ladder(128)
    assert lad == (128, 1024, 8192)
    n = len(lad)
    assert _next_rung(0, 0.1, n) == 1          # fast → escalate
    assert _next_rung(2, 0.1, n) == 2          # clamp at top
    assert _next_rung(1, 2.0, n) == 1          # mid-range → hold
    assert _next_rung(2, 9.0, n) == 1          # slow → de-escalate
    assert _next_rung(0, 9.0, n) == 0          # clamp at bottom


def test_virtual_results_two_phase_matches_real(deep):
    """VirtualResults (CompressedOrbit-only input — the View #27 class
    where the uncompressed orbit never exists): the la_only LA phase
    never touches the orbit arrays, so phase-1 state from a 1-row dummy
    orbit must equal the real-results state, and the RC tail from that
    handoff must equal the one-kernel FULL LAv2 render."""
    from fractalshark_tpu.core.hdr_host import HD
    from fractalshark_tpu.engine.la_reference import LAReferenceHost
    from fractalshark_tpu.engine.perturbation_results import (
        CompressedOrbit, VirtualResults)
    from fractalshark_tpu.ops import la_kernel
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc

    ptz, res = deep
    la = LAReferenceHost.generate(res.orbit_x, res.orbit_y,
                                  HD.from_hp(res.max_radius))
    assert la.is_valid
    n = 1800
    ident = CompressedOrbit.identity(res)
    virt = VirtualResults.from_compressed(ident, res.center_x,
                                          res.center_y)
    kw = dict(sub_dtype=np.float32, la_only=True, return_state=True)
    sr = la_kernel.la_perturb_render(res, la, ptz, 24, 24, n, **kw)
    la2 = LAReferenceHost.generate(res.orbit_x, res.orbit_y,
                                   HD.from_hp(res.max_radius))
    sv = la_kernel.la_perturb_render(virt, la2, ptz, 24, 24, n, **kw)
    for i, (a, b) in enumerate(zip(sr, sv)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"state[{i}]")
    full = np.asarray(la_kernel.la_perturb_render(
        res, la, ptz, 24, 24, n, sub_dtype=np.float32))
    _, _, ref_iter, dzr, dzi, dze, it, _ = sv
    it32 = np.asarray(it).astype(np.int32)
    init = {"dzr": np.asarray(dzr), "dzi": np.asarray(dzi),
            "dze": np.asarray(dze), "it": it32,
            "jwait": np.asarray(ref_iter).astype(np.int32),
            "done": (it32 >= n).astype(np.int32)}
    two = np.asarray(perturb_render_stream_rc(
        ident, virt.center_x, virt.center_y,
        ptz, 24, 24, n, tile_h=8, interpret=True, init_state=init))
    np.testing.assert_array_equal(two, full)
