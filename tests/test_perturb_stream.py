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
