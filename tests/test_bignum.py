"""Big-number TPU pipeline tests — differential testing against Python
ints as the oracle, mirroring the reference's strategy of checking GPU
HpSharkFloat results against MPIR (``HpSharkFloatTest``,
``Tests.cpp:312 DiffAgainstHost``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum import ntt as N


# ------------------------------------------------------------------ u32


def test_mul_full_exact():
    from fractalshark_tpu.ops.bignum.u32 import mul_full
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, 256, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, 256, dtype=np.uint64).astype(np.uint32)
    hi, lo = mul_full(jnp.asarray(a), jnp.asarray(b))
    want = a.astype(object) * b.astype(object)
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
    assert (got == want).all()


# ------------------------------------------------------------------ NTT


@pytest.mark.parametrize("prime_idx,p", [(0, N.P1), (1, N.P2)])
def test_ntt_round_trip(prime_idx, p):
    n = 128
    plan = N.make_plan(n)
    rng = np.random.default_rng(p)
    a = rng.integers(0, p, n, dtype=np.uint64).astype(np.uint32)
    am = N.to_mont(jnp.asarray(a), p)
    back = np.asarray(N.from_mont(
        N.ntt_inverse(N.ntt_forward(am, plan, prime_idx), plan, prime_idx),
        p))
    np.testing.assert_array_equal(back, a)


def test_mont_mul_exact():
    rng = np.random.default_rng(3)
    for p in (N.P1, N.P2):
        pprime, _, _ = N._MONT[p]
        a = rng.integers(0, p, 512, dtype=np.uint64)
        b = rng.integers(0, p, 512, dtype=np.uint64)
        got = np.asarray(N.mont_mul(jnp.asarray(a.astype(np.uint32)),
                                    jnp.asarray(b.astype(np.uint32)),
                                    p, pprime)).astype(np.uint64)
        # mont_mul(a,b) = a·b·R^-1 mod p
        rinv = pow(1 << 32, -1, p)
        want = (a.astype(object) * b.astype(object) * rinv) % p
        assert (got.astype(object) == want).all()


# ------------------------------------------------------------ fixed point


@pytest.mark.parametrize("limbs", [8, 32, 128])
def test_multiply_3way_vs_python_int(limbs):
    spec = FP.FixedSpec.for_limbs(limbs)
    rng = np.random.default_rng(limbs)
    prec = spec.frac_bits + 30
    x = HighPrecision(rng.uniform(-2, 2), prec=prec)
    y = HighPrecision(rng.uniform(-2, 2), prec=prec)
    _, dx = FP.hp_to_digits(x, spec)
    _, dy = FP.hp_to_digits(y, spec)
    xx, yy, xy = FP.multiply_3way(jnp.asarray(dx), jnp.asarray(dy), spec)
    ix = FP.digits_to_int(dx)
    iy = FP.digits_to_int(dy)
    half = 1 << (spec.frac_bits - 1)

    def rs(v):
        return (v + half) >> spec.frac_bits

    assert FP.digits_to_int(np.asarray(xx)) == rs(ix * ix)
    assert FP.digits_to_int(np.asarray(yy)) == rs(iy * iy)
    assert FP.digits_to_int(np.asarray(xy)) == rs(ix * iy)


def test_signed_add_cases():
    spec = FP.FixedSpec.for_limbs(8)

    def mk(v):
        s, d = FP.hp_to_digits(HighPrecision(v, prec=260), spec)
        return jnp.int32(s), jnp.asarray(d)

    cases = [("1.5", "2.25"), ("1.5", "-2.25"), ("-1.5", "2.25"),
             ("-1.5", "-2.25"), ("3.0", "-3.0"), ("0.0001", "-0.00005")]
    for a, b in cases:
        sa, da = mk(a)
        sb, db = mk(b)
        s, m = FP.signed_add(sa, da, sb, db)
        got = FP.digits_to_float(int(s), np.asarray(m), spec)
        want = float(a) + float(b)
        assert abs(got - want) < 1e-12, (a, b, got, want)


def test_carry_borrow_ripple():
    # adversarial long carry chain: 0xFFFF everywhere + 1
    D = 32
    a = np.full(D, 0xFFFF, np.uint32)
    b = np.zeros(D, np.uint32)
    b[0] = 1
    s = np.asarray(FP.add_mag(jnp.asarray(a), jnp.asarray(b)))
    assert s[0] == 0 and (s[1:-1] == 0).all()  # all carried away
    # subtraction borrowing across the whole number
    x = np.zeros(D, np.uint32)
    x[-1] = 1
    y = np.zeros(D, np.uint32)
    y[0] = 1
    d = np.asarray(FP.sub_mag(jnp.asarray(x), jnp.asarray(y)))
    assert d[0] == 0xFFFF and (d[1:-1] == 0xFFFF).all() and d[-1] == 0


# ------------------------------------------------------------ device orbit


def test_device_orbit_matches_host():
    from fractalshark_tpu.engine.reforbit import compute_reference_orbit
    from fractalshark_tpu.ops.bignum.orbit import (
        compute_reference_orbit_device)
    cx = HighPrecision("-0.743643887037158704752191506114774", prec=256)
    cy = HighPrecision("0.131825904205311970493132056385139", prec=256)
    rad = HighPrecision("1e-9", prec=64)
    dev = compute_reference_orbit_device(cx, cy, 1200, rad, limbs32=16,
                                         chunk_steps=128)
    host = compute_reference_orbit(cx, cy, 1200, rad, periodicity=True,
                                   precision_bits=16 * 32 - 64)
    assert dev.count_orbit_entries() == host.count_orbit_entries()
    assert dev.period == host.period
    n = dev.count_orbit_entries()
    assert np.abs(dev.orbit_x[:n] - host.orbit_x[:n]).max() < 1e-13
    assert np.abs(dev.orbit_y[:n] - host.orbit_y[:n]).max() < 1e-13


def test_device_orbit_escape():
    from fractalshark_tpu.ops.bignum.orbit import (
        compute_reference_orbit_device)
    dev = compute_reference_orbit_device(
        HighPrecision("3.0", prec=128), HighPrecision("0", prec=128),
        50, HighPrecision("0.01"), limbs32=8, chunk_steps=16)
    assert dev.escaped_at > 0
    assert dev.count_orbit_entries() <= 5
