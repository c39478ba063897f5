"""Scaled-kernel + glitch-path tests and aux-subsystem tests."""

import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.reforbit import RefOrbitCalc
from fractalshark_tpu.ops import escape, perturb, scaled


def test_bad_flags_criteria():
    x = np.array([0.0, 1e-40, 0.5, 1e-39, 1e-3])
    y = np.array([0.0, 1e-40, 0.5, 0.5, 1e-3])
    bad = scaled.bad_flags(x, y)
    assert not bad[0]           # seed entry exempt
    assert bad[1]               # both components denormal
    assert not bad[2]           # healthy
    assert bad[3]               # one component denormal
    assert not bad[4]           # 1e-3 components: norm 2e-6·1e-7 ≫ min


def test_bad_flags_norm_criterion():
    # norm criterion fires when |z|²·1e-7 <= f32 min normal
    v = 1e-16  # |z|² = 2e-32; ·1e-7 = 2e-39 < 1.17e-38 → bad
    bad = scaled.bad_flags(np.array([1.0, v]), np.array([1.0, v]))
    assert not bad[0]
    assert bad[1]


def test_scaled_render_matches_f64_when_clean():
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4",
                               zoom_factor="4").square_aspect_ratio(48, 48)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 300)
    it, stats = scaled.perturb_render_scaled(res, ptz, 48, 48, 300,
                                             return_stats=True)
    it = np.asarray(it)
    params = escape.PlainParams.from_view(ptz, 48, 48)
    direct = np.asarray(escape.escape_jax(params, 48, 48, 300,
                                          dtype=jnp.float64,
                                          escape_radius_sq=256.0))
    # f32 deltas at shallow zoom: near-complete agreement
    assert (it == direct).mean() > 0.95
    assert stats["bad_entries"] == 0 or stats["glitched_pixels"] >= 0


def test_glitch_repair_pass_triggers():
    """An orbit with artificially-bad entries must route glitched pixels
    through the HDR repair pass and still produce the exact result."""
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4",
                               zoom_factor="4").square_aspect_ratio(32, 32)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 200)
    # poison an orbit entry magnitude so the bad-flag fires
    res2 = type(res)(
        center_x=res.center_x, center_y=res.center_y,
        orbit_x=res.orbit_x.copy(), orbit_y=res.orbit_y.copy(),
        max_radius=res.max_radius, period=res.period,
        escaped_at=res.escaped_at, max_iterations=res.max_iterations,
        precision_bits=res.precision_bits)
    bad = scaled.bad_flags(res2.orbit_x, res2.orbit_y)
    assert bad.sum() == 0  # healthy baseline
    res2.orbit_x[5] = 1e-40
    res2.orbit_y[5] = 1e-40
    it, stats = scaled.perturb_render_scaled(res2, ptz, 32, 32, 200,
                                             return_stats=True)
    assert stats["bad_entries"] >= 1
    assert stats["glitched_pixels"] > 0
    assert np.asarray(it).shape == (32, 32)


def test_engine_scaled_algorithm():
    from fractalshark_tpu.engine.fractal import Fractal
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4", zoom_factor="16")
    f = Fractal(width=24, height=24, view=ptz,
                algorithm="Gpu1x32PerturbedScaled",
                num_iterations=200, backend="cpu")
    iters = np.asarray(f.calc_fractal())
    assert iters.shape == (24, 24)
    assert "glitched_pixels" in f.benchmark.extra


# ---------------------------------------------------------------- aux utils


def test_abort_monitor_sentinel(tmp_path):
    from fractalshark_tpu.utils.aux import AbortMonitor
    sentinel = str(tmp_path / "stop")
    mon = AbortMonitor(sentinel_file=sentinel, poll_s=0.02)
    assert not mon.aborted()
    open(sentinel, "w").close()
    time.sleep(0.1)
    assert mon.aborted()
    mon.close()


def test_abort_stops_orbit():
    from fractalshark_tpu.core.highprecision import HighPrecision
    from fractalshark_tpu.engine.reforbit import compute_reference_orbit
    flag = threading.Event()
    flag.set()
    res = compute_reference_orbit(
        HighPrecision("-0.6", prec=128), HighPrecision("0.4", prec=128),
        1_000_000, HighPrecision("0.5"), periodicity=False,
        precision_bits=128, abort_flag=flag)
    assert res.count_orbit_entries() <= 2  # stopped immediately


def test_benchmark_timer_and_budget():
    from fractalshark_tpu.utils.aux import (BenchmarkDataCollection,
                                            MemoryBudget)
    col = BenchmarkDataCollection()
    with col.ref_orbit.scope():
        time.sleep(0.01)
    assert col.ref_orbit.total_s > 0.005
    assert "ref_orbit" in col.report()

    budget = MemoryBudget(limit_bytes=1000)
    with budget.reserved(800):
        with pytest.raises(MemoryError):
            budget.reserve(300)
    budget.reserve(900)  # released on context exit


def test_verbose_toggle(capsys):
    from fractalshark_tpu.utils.aux import (VerboseMode, set_verbose,
                                            vlog)
    set_verbose(VerboseMode.NONE)
    vlog("hidden")
    set_verbose(VerboseMode.BASIC)
    vlog("shown")
    set_verbose(VerboseMode.NONE)
    out = capsys.readouterr().out
    assert "shown" in out and "hidden" not in out
