"""Device NR-mode (W0..W3) tests: the NTT pipeline's derivative
tracking vs the host fixed-point evaluator (the reference checks its
GPU NR loop against EvaluateCriticalOrbitAndDerivsMT the same way,
TestNewtonRaphson.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.engine.feature_finder import (
    evaluate_critical_orbit_and_derivs, refine_periodic_point)
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum.orbit import (
    evaluate_critical_orbit_and_derivs_device)


def test_multiply_nr_vs_python_int():
    spec = FP.FixedSpec.for_limbs(8)
    rng = np.random.default_rng(5)
    vals = [HighPrecision(rng.uniform(-2, 2), prec=spec.frac_bits + 20)
            for _ in range(4)]
    digs = [FP.hp_to_digits(v, spec)[1] for v in vals]
    outs = FP.multiply_nr(*(jnp.asarray(d) for d in digs), spec)
    ints = [FP.digits_to_int(d) for d in digs]
    half = 1 << (spec.frac_bits - 1)

    def rs(v):
        return (v + half) >> spec.frac_bits

    x, y, dx, dy = ints
    want = [rs(x * x), rs(y * y), rs(x * y),
            rs(x * dx), rs(x * dy), rs(y * dx), rs(y * dy)]
    for got, w in zip(outs, want):
        assert FP.digits_to_int(np.asarray(got)) == w


def test_device_derivs_match_host():
    cx = HighPrecision("-0.15", prec=200)
    cy = HighPrecision("0.4", prec=200)
    hz = evaluate_critical_orbit_and_derivs(cx, cy, 12, 200)
    dz = evaluate_critical_orbit_and_derivs_device(cx, cy, 12, 200)
    for h, d in zip(hz[:4], dz):
        err = h - d
        assert err.is_zero() or \
            err.exponent2() < h.exponent2() - 150, (h.to_string(30),
                                                    d.to_string(30))


def test_device_nr_refines_period3():
    cx = HighPrecision("-1.754", prec=256)
    cy = HighPrecision("0.0004", prec=256)
    feat = refine_periodic_point(cx, cy, 3, 256, backend="device")
    assert abs(float(feat.center_x) -
               float(HighPrecision(
                   "-1.754877666246692760049520"))) < 1e-18
    assert abs(float(feat.center_y)) < 1e-18
