"""Device-orbit session tests: the on-device periodicity/escape
bookkeeping (orbit_chunk flags) must reproduce the host fixed-point
loop's decisions exactly (PeriodicityChecker.h:46-95 semantics)."""

import numpy as np

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.engine.reforbit import compute_reference_orbit
from fractalshark_tpu.ops.bignum.orbit import compute_reference_orbit_device

CX = "-0.743643887037158704752191506114774"
CY = "0.131825904205311970493132056385139"


def test_device_session_period_matches_host():
    cx = HighPrecision(CX, prec=200)
    cy = HighPrecision(CY, prec=200)
    rad = HighPrecision("1e-9", prec=64)
    host = compute_reference_orbit(cx, cy, 1200, rad, periodicity=True,
                                   precision_bits=200)
    dev = compute_reference_orbit_device(cx, cy, 1200, rad,
                                         periodicity=True, chunk_steps=100)
    assert dev.period == host.period > 0
    assert dev.count_orbit_entries() == host.count_orbit_entries()
    n = host.count_orbit_entries()
    np.testing.assert_allclose(dev.orbit_x[:n], host.orbit_x[:n],
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(dev.orbit_y[:n], host.orbit_y[:n],
                               rtol=0, atol=1e-14)


def test_device_session_escape_matches_host():
    cx = HighPrecision("0.5", prec=200)
    cy = HighPrecision("0.5", prec=200)
    rad = HighPrecision("0.01", prec=64)
    host = compute_reference_orbit(cx, cy, 200, rad, periodicity=False,
                                   precision_bits=200)
    dev = compute_reference_orbit_device(cx, cy, 200, rad,
                                         periodicity=False, chunk_steps=16)
    assert host.escaped_at > 0
    assert dev.escaped_at == host.escaped_at
    assert dev.count_orbit_entries() == host.count_orbit_entries()


def test_device_session_budget_run():
    """No period, no escape: runs to the budget with matching shadows."""
    cx = HighPrecision("0.3", prec=200)
    cy = HighPrecision(CY, prec=200)
    rad = HighPrecision("1e-9", prec=64)
    host = compute_reference_orbit(cx, cy, 300, rad, periodicity=False,
                                   precision_bits=200)
    dev = compute_reference_orbit_device(cx, cy, 300, rad,
                                         periodicity=False, chunk_steps=64)
    assert dev.count_orbit_entries() == host.count_orbit_entries() == 301
    np.testing.assert_allclose(dev.orbit_x, host.orbit_x, rtol=0, atol=1e-14)


def test_growable_store_roundtrip(tmp_path):
    """GrowableArray (Vectors.h analogue): anonymous and file-backed
    growth, sidecar finalize, open_existing."""
    import numpy as np

    from fractalshark_tpu.utils.growable import (AddPointOptions,
                                                 GrowableArray)
    g = GrowableArray(np.float64, capacity=4)
    for i in range(100):
        g.append(i * 0.5)
    assert len(g) == 100 and g.view()[99] == 49.5

    path = str(tmp_path / "orbit.x")
    f = GrowableArray(np.float64, path, AddPointOptions.ENABLE_WITH_SAVE,
                      capacity=8)
    f.extend(np.arange(1000, dtype=np.float64))
    f.finalize()
    f.close()
    r = GrowableArray.open_existing(path)
    assert len(r) == 1000
    np.testing.assert_array_equal(r.view(), np.arange(1000.0))


def test_session_file_backed_store(tmp_path):
    """A device-orbit session with store_path writes the orbit into
    the mmap store as it computes; the store reopens to the same
    orbit."""
    import numpy as np

    from fractalshark_tpu.core.highprecision import HighPrecision
    from fractalshark_tpu.ops.bignum import fixedpoint as FP
    from fractalshark_tpu.ops.bignum.orbit import TpuOrbitSession
    from fractalshark_tpu.utils.growable import GrowableArray

    spec = FP.FixedSpec.for_limbs(8)
    prec = spec.frac_bits - 20
    cx = HighPrecision("-0.5", prec=prec)
    cy = HighPrecision("0.3", prec=prec)
    rad = HighPrecision("1e-6", prec=64)
    sess = TpuOrbitSession(spec, cx, cy, rad, chunk_steps=32)
    store = str(tmp_path / "orb")
    res = sess.run(100, periodicity=False, store_path=store)
    rx = GrowableArray.open_existing(store + ".x")
    np.testing.assert_array_equal(res.orbit_x, rx.view())


def test_session_checkpoint_resume_bit_identical(tmp_path):
    """Checkpoint/resume on the device session (the multi-hour View #32
    endurance path): a run capped mid-orbit + a resumed run must
    reproduce the straight-through orbit and period BIT-exactly,
    including the dzdc periodicity state carried across the boundary."""
    from fractalshark_tpu.ops.bignum.orbit import (
        compute_reference_orbit_device)

    cx = HighPrecision(CX, prec=200)
    cy = HighPrecision(CY, prec=200)
    rad = HighPrecision("1e-9", prec=64)
    oracle = compute_reference_orbit_device(
        cx, cy, 1200, rad, periodicity=True, chunk_steps=100)
    assert oracle.period > 400  # the resume boundary sits inside it

    ck = str(tmp_path / "v")
    part = compute_reference_orbit_device(
        cx, cy, 400, rad, periodicity=True, chunk_steps=100,
        checkpoint_path=ck, checkpoint_every_s=0.0)
    assert part.period == 0 and part.count_orbit_entries() == 401

    full = compute_reference_orbit_device(
        cx, cy, 1200, rad, periodicity=True, chunk_steps=100,
        checkpoint_path=ck, checkpoint_every_s=0.0)
    assert full.period == oracle.period
    n = oracle.count_orbit_entries()
    assert full.count_orbit_entries() == n
    np.testing.assert_array_equal(full.orbit_x[:n], oracle.orbit_x[:n])
    np.testing.assert_array_equal(full.orbit_y[:n], oracle.orbit_y[:n])
    if oracle.orbit_e is None:
        assert full.orbit_e is None or not np.asarray(full.orbit_e).any()
    else:
        np.testing.assert_array_equal(full.orbit_e[:n], oracle.orbit_e[:n])
