"""Native (C++/GMP mpn) reference-orbit evaluator tests: differential
against the Python fixed-point path."""

import numpy as np
import pytest

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.engine import native_orbit as NO
from fractalshark_tpu.engine.reforbit import (RefOrbitCalc,
                                              compute_reference_orbit)

pytestmark = pytest.mark.skipif(not NO.available(),
                                reason="native toolchain/libgmp missing")


def test_native_matches_python_orbit():
    cx = HighPrecision("-0.743643887037158704752191506114774", prec=256)
    cy = HighPrecision("0.131825904205311970493132056385139", prec=256)
    rad = HighPrecision("1e-9", prec=64)
    nat = NO.compute_reference_orbit_native(cx, cy, 2000, rad,
                                            precision_bits=256)
    host = compute_reference_orbit(cx, cy, 2000, rad, periodicity=True,
                                   precision_bits=256)
    assert nat.count_orbit_entries() == host.count_orbit_entries()
    assert nat.period == host.period
    n = nat.count_orbit_entries()
    assert np.abs(nat.orbit_x[:n] - host.orbit_x[:n]).max() < 1e-14
    assert np.abs(nat.orbit_y[:n] - host.orbit_y[:n]).max() < 1e-14


def test_native_escape():
    nat = NO.compute_reference_orbit_native(
        HighPrecision("3.0", prec=128), HighPrecision("0", prec=128),
        50, HighPrecision("0.01"), precision_bits=128)
    assert nat.escaped_at > 0
    assert nat.count_orbit_entries() <= 5


def test_native_negative_coords():
    # exercises all sign combinations in the signed fixed-point adds
    for cxs, cys in [("-0.5", "-0.6"), ("0.3", "-0.4"),
                     ("-0.1", "0.7"), ("0.25", "0.55")]:
        nat = NO.compute_reference_orbit_native(
            HighPrecision(cxs, prec=192), HighPrecision(cys, prec=192),
            300, HighPrecision("1e-6"), precision_bits=192)
        host = compute_reference_orbit(
            HighPrecision(cxs, prec=192), HighPrecision(cys, prec=192),
            300, HighPrecision("1e-6"), periodicity=True,
            precision_bits=192)
        assert nat.count_orbit_entries() == host.count_orbit_entries()
        n = nat.count_orbit_entries()
        assert np.abs(nat.orbit_x[:n] - host.orbit_x[:n]).max() < 1e-13


def test_mixed_component_hdr_dip_native_vs_device():
    """One component representable in f64, the other sub-f64: the HDR
    (mantissa, shared exponent) form must be emitted and carry BOTH
    components — the pre-r3 policy stored the entry as plain f64
    whenever either component was representable, zeroing the dipped one
    (the reference stores HDRFloat per entry unconditionally,
    PeriodicityChecker.h:32-33)."""
    import math

    from fractalshark_tpu.ops.bignum.orbit import \
        compute_reference_orbit_device

    prec = 2048
    cx = HighPrecision.from_mant_exp(1, -900, prec=prec)    # f64-representable
    cy = HighPrecision.from_mant_exp(1, -1200, prec=prec)   # sub-f64
    rad = HighPrecision.from_mant_exp(1, -1500, prec=64)

    nat = NO.compute_reference_orbit_native(cx, cy, 4, rad,
                                            periodicity=False,
                                            precision_bits=prec)
    dev = compute_reference_orbit_device(cx, cy, 4, rad,
                                         periodicity=False,
                                         chunk_steps=4)
    for res in (nat, dev):
        assert res.orbit_e is not None, "mixed dip must select HDR form"
        e1 = int(res.orbit_e[1])
        assert e1 != 0
        vx = float(res.orbit_x[1]) * math.exp2(e1 + 900)
        assert vx == pytest.approx(1.0, rel=1e-12)
        # the dipped component survives: y·2^e == 2^-1200 exactly
        vy = float(res.orbit_y[1]) * math.exp2(e1 + 1200)
        assert vy == pytest.approx(1.0, rel=1e-12)
        assert np.isfinite(res.orbit_x).all()    # ADVICE r2 #1: no inf
        # plain-view consumers flush the dipped component only
        px = res.orbit_plain()[0][1]
        assert px == pytest.approx(math.exp2(-900), rel=1e-12)
        assert res.orbit_plain()[1][1] == 0.0


def test_auto_backend_prefers_native():
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    calc = RefOrbitCalc()  # default "auto"
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.4", zoom_factor="1e6",
                               prec=256)
    calc.get_and_create_useful_results(ptz, 500)
    assert calc.last_details["backend"] == "native"


def test_mt3_pipeline_matches_single_thread(monkeypatch):
    """The MT3 squaring pipeline (2 workers + coordinator, the
    reference's RefOrbitCalc MT3 analogue) must produce the exact
    orbit of the single-threaded path."""
    import importlib
    import os

    from fractalshark_tpu.core.highprecision import HighPrecision
    import fractalshark_tpu.engine.native_orbit as m
    if not m.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    prec = 2048
    cx = HighPrecision("-0.743643887037158704752191506114774", prec=prec)
    cy = HighPrecision("0.131825904205311970493132056385139", prec=prec)
    rad = HighPrecision("1e-30", prec=64)

    def run():
        return m.compute_reference_orbit_native(
            cx, cy, 200, rad, periodicity=True, precision_bits=prec)

    monkeypatch.setenv("FS_ORBIT_MT", "0")
    st = run()
    monkeypatch.setenv("FS_ORBIT_MT", "1")
    mt = run()
    import numpy as np
    np.testing.assert_array_equal(st.orbit_x, mt.orbit_x)
    np.testing.assert_array_equal(st.orbit_y, mt.orbit_y)
    assert st.period == mt.period


# --- chunked / checkpointable session (endurance path) ----------------------


@pytest.fixture
def _view5_setup():
    from fractalshark_tpu.core.precision import precision_from_view
    from fractalshark_tpu.core.views import get_view_preset
    if not NO.available():
        pytest.skip("native toolchain unavailable")
    v = get_view_preset(5)
    ptz = v.ptz.square_aspect_ratio(64, 64)
    prec = precision_from_view(ptz) + 32
    return (ptz.pt_x.with_precision(prec), ptz.pt_y.with_precision(prec),
            ptz.radius, prec)


def test_session_chunked_matches_oneshot(_view5_setup):
    """Chunked emission across odd chunk boundaries reproduces the
    one-shot orbit exactly (incl. period detection)."""
    cx, cy, rad, prec = _view5_setup
    res = NO.compute_reference_orbit_native(cx, cy, 200000, rad,
                                            precision_bits=prec)
    s = NO.NativeOrbitSession(cx, cy, rad, precision_bits=prec)
    st = s.run(200000, chunk=7777)
    r2 = s.results()
    np.testing.assert_array_equal(res.orbit_x, r2.orbit_x)
    np.testing.assert_array_equal(res.orbit_y, r2.orbit_y)
    assert res.period == r2.period and st == 1


def test_session_compressed_matches_oracle(_view5_setup):
    """On-the-fly native SimpleCompression == the Python compressor
    run over the uncompressed orbit (PerturbationResults.cpp:2347-2381
    semantics), bit-exact anchors and indices."""
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    cx, cy, rad, prec = _view5_setup
    res = NO.compute_reference_orbit_native(cx, cy, 200000, rad,
                                            precision_bits=prec)
    oracle = CompressedOrbit.from_uncompressed(res, error_exp=20)
    s = NO.NativeOrbitSession(cx, cy, rad, precision_bits=prec,
                              compression_error_exp=20)
    s.run(200000, chunk=7777)
    co = s.compressed()
    np.testing.assert_array_equal(co.anchors_x, oracle.anchors_x)
    np.testing.assert_array_equal(co.anchors_y, oracle.anchors_y)
    np.testing.assert_array_equal(co.anchor_index, oracle.anchor_index)
    assert co.total_count == oracle.total_count
    assert co.compression_ratio() > 50


def test_session_checkpoint_resume_identity(tmp_path, _view5_setup):
    """Interrupt mid-run, resume from the on-disk checkpoint, finish:
    anchors and period identical to an uninterrupted run."""
    from fractalshark_tpu.engine.perturbation_results import \
        CompressedOrbit
    cx, cy, rad, prec = _view5_setup
    res = NO.compute_reference_orbit_native(cx, cy, 200000, rad,
                                            precision_bits=prec)
    oracle = CompressedOrbit.from_uncompressed(res, error_exp=20)
    base = str(tmp_path / "ck")
    s1 = NO.NativeOrbitSession(cx, cy, rad, precision_bits=prec,
                               compression_error_exp=20,
                               checkpoint_path=base)
    s1.run(9000, chunk=2000)
    assert s1.status == 0
    s1.close()
    s2 = NO.NativeOrbitSession(cx, cy, rad, precision_bits=prec,
                               compression_error_exp=20,
                               checkpoint_path=base)
    assert s2._resumed and s2.iters == 9000
    s2.run(200000, chunk=7777)
    co = s2.compressed()
    np.testing.assert_array_equal(co.anchors_x, oracle.anchors_x)
    np.testing.assert_array_equal(co.anchor_index, oracle.anchor_index)
    assert co.total_count == oracle.total_count and s2.status == 1


def test_session_resume_truncates_ahead_arrays(tmp_path, _view5_setup):
    """Crash-consistency: anchors appended after the last state
    snapshot (arrays flushed, state not yet written) are dropped on
    resume and recomputed — the result is still exact."""
    cx, cy, rad, prec = _view5_setup
    base = str(tmp_path / "ck")
    s1 = NO.NativeOrbitSession(cx, cy, rad, precision_bits=prec,
                               compression_error_exp=20,
                               checkpoint_path=base)
    s1.run(9000, chunk=2000)
    n_ck = s1.n_emitted
    # simulate post-checkpoint appends that never made it into a state
    s1._gx.extend([1.0, 2.0])
    s1._gy.extend([1.0, 2.0])
    s1._ge.extend([0, 0])
    s1._gi.extend([10 ** 9, 10 ** 9 + 1])
    for g in (s1._gx, s1._gy, s1._ge, s1._gi):
        g.finalize()
    s1.close()
    s2 = NO.NativeOrbitSession(cx, cy, rad, precision_bits=prec,
                               compression_error_exp=20,
                               checkpoint_path=base)
    assert s2.n_emitted == n_ck
    assert int(np.asarray(s2._gi.view())[-1]) < 10 ** 9
