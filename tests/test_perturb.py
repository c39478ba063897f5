"""Perturbation tests.

Key correctness property (the reference pins this with CrummyTest view
renders): a perturbation render must match the direct render — the
delta iteration is algebraically the same orbit, so iteration counts
should agree everywhere except a thin boundary set where float rounding
flips the escape test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.core.views import get_view_preset
from fractalshark_tpu.engine.perturbation_results import CompressedOrbit
from fractalshark_tpu.engine.reforbit import (RefOrbitCalc,
                                              compute_reference_orbit)
from fractalshark_tpu.ops import escape, perturb


@pytest.fixture(scope="module")
def view0_orbit():
    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(64, 64)
    # center (0,0): immediately periodic — use an interior-ish offset
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4", zoom_factor="2")
    res = compute_reference_orbit(
        ptz.pt_x.with_precision(256), ptz.pt_y.with_precision(256),
        500, ptz.radius, periodicity=True, precision_bits=256)
    return ptz, res


def test_orbit_matches_f64_iteration(view0_orbit):
    """Fixed-point orbit shadow == plain f64 iteration of the center
    while values stay in range (the low-precision shadow is the rounded
    high-precision truth; early iterations agree with f64 to ~1 ulp)."""
    ptz, res = view0_orbit
    cx, cy = float(ptz.pt_x), float(ptz.pt_y)
    # orbit[0] = 0 (seed entry); orbit[i+1] = z_i with z_0 = c
    assert res.orbit_x[0] == 0.0 and res.orbit_y[0] == 0.0
    zx, zy = cx, cy
    for i in range(min(30, res.count_orbit_entries() - 1)):
        assert abs(res.orbit_x[i + 1] - zx) <= 4 * abs(zx) * 2 ** -52 + 1e-300
        assert abs(res.orbit_y[i + 1] - zy) <= 4 * abs(zy) * 2 ** -52 + 1e-300
        zx, zy = zx * zx - zy * zy + cx, 2 * zx * zy + cy


def test_orbit_escape_detection():
    # center far outside: escapes immediately
    res = compute_reference_orbit(
        HighPrecision("3.0", prec=128), HighPrecision("0", prec=128),
        100, HighPrecision("0.01"), periodicity=True, precision_bits=128)
    assert res.escaped_at > 0
    # escape tests |old_z + c|²>256 (reference semantics): center 3 needs
    # three entries (|3+3|²=36, |12+3|²=225, then 147 escapes)
    assert res.count_orbit_entries() <= 4


def test_orbit_periodicity_detection():
    # center at a superattracting point (0,0): period 1 found instantly
    res = compute_reference_orbit(
        HighPrecision("0", prec=128), HighPrecision("0", prec=128),
        100, HighPrecision("0.5"), periodicity=True, precision_bits=128)
    assert res.period > 0


def test_perturb_f64_matches_direct():
    """Perturbation render ≡ direct f64 render (≤2% boundary pixels)."""
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4",
                               zoom_factor="4").square_aspect_ratio(64, 64)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 300)
    pert = np.asarray(perturb.perturb_render_float(
        res, ptz, 64, 64, 300, dtype=np.float64))
    params = escape.PlainParams.from_view(ptz, 64, 64)
    direct = np.asarray(escape.escape_jax(params, 64, 64, 300,
                                          dtype=jnp.float64,
                                          escape_radius_sq=256.0))
    mismatch = (pert != direct).mean()
    assert mismatch < 0.02, mismatch
    # and matching pixels dominate with exact agreement
    agree = pert == direct
    assert agree.mean() > 0.98


def test_perturb_hdr32_matches_direct():
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4",
                               zoom_factor="4").square_aspect_ratio(48, 48)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 200)
    pert = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 48, 48, 200, sub_dtype=np.float32))
    params = escape.PlainParams.from_view(ptz, 48, 48)
    direct = np.asarray(escape.escape_jax(params, 48, 48, 200,
                                          dtype=jnp.float64,
                                          escape_radius_sq=256.0))
    assert (pert != direct).mean() < 0.05


def test_perturb_deep_zoom_hdr():
    """Deep zoom (1e-30 extent): direct f64 still works, perturbation
    HDR must agree with it."""
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512).square_aspect_ratio(32, 32)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 3000)
    params = escape.PlainParams.from_view(ptz, 32, 32)
    direct = np.asarray(escape.escape_jax(params, 32, 32, 3000,
                                          dtype=jnp.float64,
                                          escape_radius_sq=256.0))
    # HDR with f64 mantissas: precision-matched to the direct render.
    # Interior pixels must be identical; escaped pixels exact except a
    # small chaotic boundary set (escape time near the set boundary is
    # sensitive at the last-ulp level — the reference accepts the same
    # per-pixel tolerance under perturbation, BASELINE.md).
    pert64 = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 32, 32, 3000, sub_dtype=np.float64))
    interior = direct == 3000
    assert interior.any()
    np.testing.assert_array_equal(pert64[interior], direct[interior])
    esc = ~interior
    assert (pert64[esc] == direct[esc]).mean() > 0.93
    # HDR f32: 24-bit deltas → looser, but the bulk must agree
    pert32 = np.asarray(perturb.perturb_render_hdr(
        res, ptz, 32, 32, 3000, sub_dtype=np.float32))
    assert (pert32 == direct).mean() > 0.85


def test_orbit_cache_hit():
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4", zoom_factor="4")
    calc = RefOrbitCalc()
    r1 = calc.get_and_create_useful_results(ptz, 100)
    assert calc.last_details["cache_hit"] is False
    r2 = calc.get_and_create_useful_results(ptz, 100)
    assert calc.last_details["cache_hit"] is True
    assert r1 is r2


def test_orbit_cache_recomputes_on_deeper_zoom():
    """A shallow render must NOT satisfy a later, much deeper view: the
    stored center precision is insufficient for the deep dc grid
    (usefulness intent, RefOrbitCalc.cpp:2264-2288)."""
    shallow = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e4", prec=512)
    deep = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e30", prec=512)
    calc = RefOrbitCalc()
    r1 = calc.get_and_create_useful_results(shallow, 100)
    assert not r1.is_useful_for(deep, 100)
    r2 = calc.get_and_create_useful_results(deep, 100)
    assert calc.last_details["cache_hit"] is False
    assert r2 is not r1
    assert r2.precision_bits > r1.precision_bits
    # and the deep orbit still serves the deep view from cache
    r3 = calc.get_and_create_useful_results(deep, 100)
    assert r3 is r2


def test_compression_round_trip():
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4", zoom_factor="4")
    res = compute_reference_orbit(
        ptz.pt_x.with_precision(256), ptz.pt_y.with_precision(256),
        2000, ptz.radius, periodicity=True, precision_bits=256)
    comp = CompressedOrbit.from_uncompressed(res, error_exp=20)
    assert len(comp.anchors_x) < res.count_orbit_entries()
    x, y = comp.decompress()
    # relative reconstruction error bounded by ~2^-20
    mag = np.hypot(res.orbit_x, res.orbit_y) + 1e-30
    err = np.hypot(x - res.orbit_x, y - res.orbit_y) / mag
    assert err.max() < 2.0 ** -18


def test_orbit_save_load(tmp_path):
    res = compute_reference_orbit(
        HighPrecision("-0.6", prec=128), HighPrecision("0.4", prec=128),
        200, HighPrecision("0.5"), periodicity=True, precision_bits=128)
    p = str(tmp_path / "orbit")
    res.save(p)
    back = type(res).load(p)
    np.testing.assert_array_equal(back.orbit_x, res.orbit_x)
    assert back.period == res.period
    assert float(back.center_x - res.center_x) == 0.0


def test_engine_perturbed_algorithms():
    """End-to-end through the engine: Cpu64PerturbedBLA and the HDR
    LAv2 names (currently PO fallback) must render."""
    from fractalshark_tpu.engine.fractal import Fractal
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4", zoom_factor="8")
    for alg in ["Cpu64PerturbedBLA", "GpuHDRx32PerturbedLAv2PO"]:
        f = Fractal(width=32, height=32, view=ptz, algorithm=alg,
                    num_iterations=200, backend="cpu")
        iters = np.asarray(f.calc_fractal())
        assert iters.shape == (32, 32)
        assert iters.max() > 0


def test_max_compression_round_trip(tmp_path):
    """MaxCompression (waypoint+rebase, CompressMax/DecompressMax):
    round-trip reconstruction error stays within the threshold class
    and the encoding beats SimpleCompression on a period-heavy orbit."""
    from fractalshark_tpu.engine.perturbation_results import (
        CompressedOrbit, MaxCompressedOrbit)
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512)
    # periodicity off: the orbit runs past its period (~859) for 20k
    # entries — the near-periodic tail is exactly what the delta
    # encoding exploits (period-heavy deep views, View #27 class)
    res = compute_reference_orbit(
        ptz.pt_x.with_precision(512), ptz.pt_y.with_precision(512),
        20000, ptz.radius, periodicity=False, precision_bits=512)
    assert res.count_orbit_entries() > 10000

    comp = MaxCompressedOrbit.from_uncompressed(res, error_exp=20)
    assert len(comp.rebases) > 0  # Zhuoran rebases exercised
    x, y = comp.decompress()
    assert len(x) == res.count_orbit_entries()
    mag = np.maximum(np.maximum(np.abs(res.orbit_x), np.abs(res.orbit_y)),
                     1e-30)
    err = np.maximum(np.abs(x - res.orbit_x), np.abs(y - res.orbit_y)) / mag
    # threshold2 = sqrt(10^20) -> relative drift bound ~1e-10 per span;
    # allow an order of magnitude for span accumulation
    assert err.max() < 1e-8, err.max()

    simple = CompressedOrbit.from_uncompressed(res, error_exp=20)
    assert comp.compression_ratio() > simple.compression_ratio()

    # disk round trip
    p = str(tmp_path / "maxcomp.npz")
    comp.save(p)
    loaded = MaxCompressedOrbit.load(p)
    x2, y2 = loaded.decompress()
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)


def test_save_honors_compression_flag(tmp_path):
    """save() with compression='simple'/'max' persists anchors, not raw
    arrays, and load() reconstructs the orbit transparently."""
    from fractalshark_tpu.engine.perturbation_results import (
        PerturbationResults)
    import os
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512)
    res = compute_reference_orbit(
        ptz.pt_x.with_precision(512), ptz.pt_y.with_precision(512),
        5000, ptz.radius, periodicity=False, precision_bits=512)
    for mode in ("simple", "max"):
        p = str(tmp_path / f"orb_{mode}")
        res.save(p, compression=mode, error_exp=25)
        raw = str(tmp_path / "orb_raw")
        res.save(raw, compression="none")
        comp_bytes = sum(os.path.getsize(str(f)) for f in tmp_path.iterdir()
                         if f.name.startswith(f"orb_{mode}.orbit"))
        raw_bytes = sum(os.path.getsize(str(f)) for f in tmp_path.iterdir()
                        if f.name.startswith("orb_raw.orbit"))
        assert comp_bytes < raw_bytes / 10, (mode, comp_bytes, raw_bytes)
        loaded = PerturbationResults.load(p)
        assert loaded.count_orbit_entries() == res.count_orbit_entries()
        mag = np.maximum(np.abs(res.orbit_x), 1e-30)
        assert (np.abs(loaded.orbit_x - res.orbit_x) / mag).max() < 1e-9


def test_memory_budget_evicts_orbits():
    """A MemoryBudget attached to RefOrbitCalc evicts oldest cached
    orbits until the cache fits the commit cap (OptimizeMemory,
    RefOrbitCalc.cpp:128)."""
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine.reforbit import RefOrbitCalc
    from fractalshark_tpu.utils.aux import MemoryBudget

    calc = RefOrbitCalc()
    calc.memory_budget = MemoryBudget(64 * 1024)  # 64 KB cap

    def view(cx):
        return PointZoomBBConverter(
            pt_x=cx, pt_y="0.3", zoom_factor="1e6",
            prec=256).square_aspect_ratio(16, 16)

    r1 = calc.get_and_create_useful_results(view("-0.5"), 3000)
    r2 = calc.get_and_create_useful_results(view("0.1"), 3000)
    total = sum(r.orbit_x.nbytes + r.orbit_y.nbytes for r in calc.cache)
    assert total <= 64 * 1024 or len(calc.cache) == 1
    assert calc.cache[-1] is r2
