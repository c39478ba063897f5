"""Pallas LAv2 kernel vs the XLA reference implementation."""

import numpy as np
import pytest

from fractalshark_tpu.core.hdr_host import HD
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.la_reference import LAReferenceHost
from fractalshark_tpu.engine.reforbit import RefOrbitCalc
from fractalshark_tpu.ops import la_kernel
from fractalshark_tpu.ops.la_pallas import la_render_pallas


@pytest.fixture(scope="module")
def deep():
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(64, 64)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 2000)
    la = LAReferenceHost.generate(res.orbit_x, res.orbit_y,
                                  HD.from_hp(res.max_radius))
    return ptz, res, la


def test_la_pallas_matches_xla(deep):
    ptz, res, la = deep
    pal = la_render_pallas(res, la, ptz, 64, 64, 2000, tile_h=32,
                           interpret=True)
    assert pal is not None
    xla = np.asarray(la_kernel.la_perturb_render(
        res, la, ptz, 64, 64, 2000, sub_dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(pal), xla)


def test_la_pallas_nondivisible(deep):
    ptz, res, la = deep
    pal = la_render_pallas(res, la, ptz, 45, 29, 1500, tile_h=16,
                           interpret=True)
    xla = np.asarray(la_kernel.la_perturb_render(
        res, la, ptz, 45, 29, 1500, sub_dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(pal), xla)
