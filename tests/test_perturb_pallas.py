"""Pallas perturbation kernel vs the XLA reference implementation
(interpret mode on CPU; the TPU path is exercised by bench)."""

import numpy as np
import pytest

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.reforbit import RefOrbitCalc
from fractalshark_tpu.ops import perturb
from fractalshark_tpu.ops.perturb_pallas import (MAX_ORBIT_ROWS,
                                                 perturb_render_pallas)


@pytest.fixture(scope="module")
def deep():
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(64, 64)
    calc = RefOrbitCalc()
    return ptz, calc.get_and_create_useful_results(ptz, 2000)


def test_pallas_matches_xla_bit_exact(deep):
    ptz, res = deep
    pal = perturb_render_pallas(res, ptz, 64, 64, 2000, tile_h=32,
                                interpret=True)
    assert pal is not None
    xla = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 64, 64, 2000, sub_dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(pal), xla)


def test_pallas_nondivisible_dims(deep):
    ptz, res = deep
    pal = perturb_render_pallas(res, ptz, 50, 37, 1000, tile_h=16,
                                interpret=True)
    xla = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 50, 37, 1000, sub_dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(pal), xla)


def test_pallas_orbit_budget_fallback(deep):
    ptz, res = deep
    # fake an oversized orbit: count beyond the VMEM row cap
    import types
    big = types.SimpleNamespace(
        count_orbit_entries=lambda: MAX_ORBIT_ROWS * 128 + 1,
        max_ref_iteration=lambda: MAX_ORBIT_ROWS * 128,
        device_orbit=res.device_orbit,
        center_x=res.center_x, center_y=res.center_y)
    assert perturb_render_pallas(big, ptz, 16, 16, 100) is None
