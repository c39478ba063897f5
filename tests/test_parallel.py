"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(the rebuild's substitute for multi-chip hardware, SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.core.views import get_view_preset
from fractalshark_tpu.engine.reforbit import RefOrbitCalc
from fractalshark_tpu.ops import escape, perturb
from fractalshark_tpu.parallel import render as pr


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return pr.make_mesh()


def test_sharded_escape_matches_single(mesh):
    v = get_view_preset(0)
    h = 8 * len(jax.devices())
    ptz = v.ptz.square_aspect_ratio(64, h)
    params = escape.PlainParams.from_view(ptz, 64, h)
    single = np.asarray(escape.escape_jax(params, 64, h, 100))
    shard = np.asarray(pr.sharded_escape_render(params, 64, h, 100, mesh))
    np.testing.assert_array_equal(single, shard)


def test_sharded_perturb_matches_single(mesh):
    n_dev = len(jax.devices())
    h = 8 * n_dev
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(48, h)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 2000)
    single = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 48, h, 2000, sub_dtype=np.float32))
    shard = np.asarray(pr.sharded_perturb_render_hdr(
        res, ptz, 48, h, 2000, mesh, sub_dtype=np.float32))
    np.testing.assert_array_equal(single, shard)


def test_sharded_output_actually_sharded(mesh):
    v = get_view_preset(0)
    n_dev = len(jax.devices())
    h = 8 * n_dev
    ptz = v.ptz.square_aspect_ratio(32, h)
    params = escape.PlainParams.from_view(ptz, 32, h)
    out = pr.sharded_escape_render(params, 32, h, 50, mesh)
    # the iteration buffer must be row-sharded over all devices
    assert len(out.sharding.device_set) == n_dev
    stats = pr.sharded_stats(out, mesh)
    assert int(stats["max"]) == 50


def test_height_divisibility_error(mesh):
    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(32, 30)
    params = escape.PlainParams.from_view(ptz, 32, 30)
    n = len(jax.devices())
    if 30 % n == 0:
        pytest.skip("30 divisible by device count")
    with pytest.raises(ValueError):
        pr.sharded_escape_render(params, 32, 30, 10, mesh)
