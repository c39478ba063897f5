"""Streaming LA machine (ops/la_stream.py) vs the one-kernel XLA LAv2
machine — the handoff state and the full two-phase render must be
bit-identical (interpret mode on CPU; TPU exercised by bench)."""

import numpy as np
import pytest

from fractalshark_tpu.core.hdr_host import HD
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.la_reference import LAReferenceHost
from fractalshark_tpu.engine.reforbit import RefOrbitCalc
from fractalshark_tpu.ops import la_kernel
from fractalshark_tpu.ops.la_stream import la_phase_stream


@pytest.fixture(scope="module")
def deep():
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(32, 32)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 2000)
    la = LAReferenceHost.generate(res.orbit_x, res.orbit_y,
                                  HD.from_hp(res.max_radius))
    assert la.is_valid
    return ptz, res, la


def _one_kernel_state(res, la, ptz, w, h, n):
    state = la_kernel.la_perturb_render(
        res, la, ptz, w, h, n, sub_dtype=np.float32,
        la_only=True, return_state=True)
    _, _, ref_iter, dzr, dzi, dze, it, _ = state
    return {"dzr": np.asarray(dzr), "dzi": np.asarray(dzi),
            "dze": np.asarray(dze),
            "it": np.asarray(it).astype(np.int64),
            "jwait": np.asarray(ref_iter).astype(np.int64),
            "done": (np.asarray(it).astype(np.int64) >= n)
            .astype(np.int32)}


def _assert_handoff_equal(a, b):
    for k in ("it", "jwait", "done", "dzr", "dzi", "dze"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_handoff_matches_one_kernel(deep):
    ptz, res, la = deep
    n = 1800
    ref = _one_kernel_state(res, la, ptz, 32, 32, n)
    out = la_phase_stream(res, la, ptz, 32, 32, n, tile_h=16,
                          interpret=True)
    assert out is not None
    _assert_handoff_equal(out, ref)


def test_multi_window_stage(deep):
    """win=8 forces every stage across multiple streamed windows
    (cross-window lockstep continuation + re-DMA per sweep)."""
    ptz, res, la = deep
    n = 1500
    ref = _one_kernel_state(res, la, ptz, 32, 32, n)
    out = la_phase_stream(res, la, ptz, 32, 32, n, tile_h=16,
                          interpret=True, win=8)
    assert out is not None
    _assert_handoff_equal(out, ref)


def test_budget_bounded_relaunch(deep):
    """launch_windows=1 suspends after every window; the resumed
    phases must still match bit for bit."""
    ptz, res, la = deep
    n = 1200
    ref = _one_kernel_state(res, la, ptz, 32, 32, n)
    out = la_phase_stream(res, la, ptz, 32, 32, n, tile_h=16,
                          interpret=True, win=8, launch_windows=1)
    assert out is not None
    _assert_handoff_equal(out, ref)


def test_nondivisible_dims(deep):
    ptz0, res, la = deep
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(50, 37)
    n = 1200
    ref = _one_kernel_state(res, la, ptz, 50, 37, n)
    out = la_phase_stream(res, la, ptz, 50, 37, n, tile_h=16,
                          interpret=True)
    assert out is not None
    _assert_handoff_equal(out, ref)


def test_two_phase_stream_la_matches_full(deep):
    """Streaming LA phase + identity RC streaming tail == the
    one-kernel FULL LAv2 machine, pixel for pixel (the production TPU
    deep-render path with BOTH phases streamed)."""
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    from fractalshark_tpu.ops.perturb_stream import \
        perturb_render_stream_rc

    ptz, res, la = deep
    n = 1800
    full = np.asarray(la_kernel.la_perturb_render(
        res, la, ptz, 32, 32, n, sub_dtype=np.float32))
    init = la_phase_stream(res, la, ptz, 32, 32, n, tile_h=16,
                           interpret=True)
    assert init is not None
    two = np.asarray(perturb_render_stream_rc(
        CompressedOrbit.identity(res), res.center_x, res.center_y,
        ptz, 32, 32, n, tile_h=16, interpret=True, init_state=init))
    np.testing.assert_array_equal(two, full)
