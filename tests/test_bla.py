"""BLA tests (mirrors reference TestBLA.cpp): merge math vs direct
linearization, lookup invariants, and render agreement with the
perturbation-only path."""

import numpy as np
import pytest

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.bla import FIRST_LEVEL, BLATable
from fractalshark_tpu.engine.reforbit import RefOrbitCalc
from fractalshark_tpu.ops import bla_kernel, perturb


@pytest.fixture(scope="module")
def deep():
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(32, 32)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 3000)
    from fractalshark_tpu.core.hdr_host import HD
    rad = HD.from_hp(res.max_radius)
    bla = BLATable.build(res.orbit_x, res.orbit_y, rad.m, rad.e)
    return ptz, res, bla


def test_table_structure(deep):
    _, res, bla = deep
    m = res.count_orbit_entries()
    assert bla.m_total == m
    # level counts halve
    for i in range(1, bla.num_levels):
        assert bla.level_count[i] == (bla.level_count[i - 1] + 1) // 2
    # first stored level covers 2^FIRST_LEVEL = 4 steps except the tail
    li0 = slice(int(bla.level_offset[0]),
                int(bla.level_offset[0] + bla.level_count[0]))
    assert bla.l[li0][:-1].max() <= (1 << FIRST_LEVEL)
    assert (bla.l[li0] >= 1).all()


def test_single_step_linearization(deep):
    """A level-0 BLA is dz' = 2·Z_m·dz + dc; verify via one perturbation
    step with tiny dz (the linearization is exact as dz→0)."""
    _, res, bla = deep
    # rebuild level-0 maths directly
    m = 5
    z = complex(res.orbit_x[m], res.orbit_y[m])
    dz = 1e-12 + 2e-12j
    dc = -3e-13 + 1e-13j
    exact = dz * (2 * z + dz) + dc
    linear = 2 * z * dz + dc
    assert abs(exact - linear) / abs(exact) < 1e-10


def test_lookup_backwards_invariants(deep):
    _, res, bla = deep
    # odd k → no BLA
    assert bla.lookup_backwards(2, 0.0, -10000) is None
    # m == 0 → None
    assert bla.lookup_backwards(0, 1.0, -100) is None
    # tiny dz at a deep-divisibility index gets a long step
    g = bla.lookup_backwards(1, 1.0, -100000)
    assert g is not None
    assert bla.l[g] > 1
    # huge dz → nothing valid
    assert bla.lookup_backwards(1, 1.0, 100) is None


def _host_bla_pixel(bla, Z, dc, n):
    """Direct Python transcription of the BLA pixel loop
    (BLAKernels.cuh:63-160) — the semantic oracle for the device
    kernel."""
    import math
    count = len(Z)
    max_ref = count - 1
    dz = 0j
    j = 0
    it = 0
    while it < n:
        while True:
            dz2 = abs(dz) ** 2
            if dz2 == 0:
                m2, e2 = 0.0, -10 ** 9
            else:
                fm, fe = math.frexp(dz2)
                m2, e2 = fm * 2, fe - 1
            g = bla.lookup_backwards(j, m2, e2)
            if g is None:
                break
            l = int(bla.l[g])
            if j + l >= count or it + l >= n:
                break
            it += l
            j += l
            A = complex(bla.a_m[g]) * 2.0 ** int(bla.a_e[g])
            B = complex(bla.b_m[g]) * 2.0 ** int(bla.b_e[g])
            dz = A * dz + B * dc
            z = Z[j] + dz
            if abs(z) ** 2 > 256:
                return it
            if abs(z) ** 2 < abs(dz) ** 2 or j >= max_ref:
                dz = z
                j = 0
        if it >= n:
            break
        dz = dz * (2 * Z[j] + dz) + dc
        j += 1
        z = Z[j] + dz
        it += 1
        if abs(z) ** 2 > 256:
            return it - 1
        if abs(z) ** 2 < abs(dz) ** 2 or j >= max_ref:
            dz = z
            j = 0
    return it


def test_bla_device_matches_host_oracle(deep):
    ptz, res, bla = deep
    blar = np.asarray(bla_kernel.bla_perturb_render(
        res, bla, ptz, 32, 32, 3000, sub_dtype=np.float64))
    from fractalshark_tpu.ops.perturb import delta_params
    dx, dy, cxo, cyo = delta_params(ptz, res.center_x, res.center_y, 32, 32)
    fdx, fdy, fcx, fcy = float(dx), float(dy), float(cxo), float(cyo)
    Z = res.orbit_x + 1j * res.orbit_y
    for (y, x) in [(0, 0), (0, 1), (5, 7), (10, 20), (31, 31), (16, 16),
                   (3, 29), (25, 4)]:
        dc = complex(x * fdx - fcx, -y * fdy - fcy)
        assert _host_bla_pixel(bla, Z, dc, 3000) == blar[y, x], (y, x)


def test_bla_render_vs_perturbation_statistics(deep):
    """BLA is an approximation (per-step tolerance 2^-23) — exact
    pixel agreement with perturbation is NOT expected, but interior
    pixels and bulk statistics must hold together."""
    ptz, res, bla = deep
    pert = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 32, 32, 3000, sub_dtype=np.float64))
    blar = np.asarray(bla_kernel.bla_perturb_render(
        res, bla, ptz, 32, 32, 3000, sub_dtype=np.float64))
    interior = pert == 3000
    assert interior.any()
    # near a minibrot boundary the 2^-23 linearization perturbs escape
    # decisions; the bulk must still track the exact render closely and
    # a meaningful interior core must survive
    rate = (blar[interior] == 3000).mean()
    assert rate > 0.4
    # regression pin: the current implementation measures 0.5405 on this
    # fixture — a drop below the margin means the BLA path degraded
    assert abs(rate - 0.5405) < 0.1, rate
    rel = np.abs(blar.astype(float) - pert.astype(float)) / \
        np.maximum(pert.astype(float), 1)
    assert np.median(rel) < 0.02


def test_engine_bla_algorithms():
    from fractalshark_tpu.engine.fractal import Fractal
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512)
    f = Fractal(width=16, height=16, view=ptz,
                algorithm="GpuHDRx32PerturbedBLA",
                num_iterations=2000, backend="cpu")
    iters = np.asarray(f.calc_fractal())
    assert iters.shape == (16, 16)
    assert "bla_build_s" in f.benchmark.extra
