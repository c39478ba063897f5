"""Tail-emitted orbit shadows: orbit_chunk's carried shadow rows
(fused-tail path) must reproduce the XLA argmax/dynamic_slice glue
bit for bit — shadows, periodicity/escape flags, and final state."""

import numpy as np
import jax.numpy as jnp
import pytest

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum import ntt_pallas as NP
from fractalshark_tpu.ops.bignum import orbit as O


def _chunk(spec, steps):
    cx = HighPrecision("-0.7436438870371587", prec=spec.frac_bits)
    cy = HighPrecision("0.1318259042053119", prec=spec.frac_bits)
    scx, cxd = FP.hp_to_digits(cx, spec)
    scy, cyd = FP.hp_to_digits(cy, spec)
    args = (jnp.int32(scx), jnp.asarray(cxd), jnp.int32(scy),
            jnp.asarray(cyd))
    dzdc0 = (jnp.float64(1.0), jnp.float64(0.0), jnp.int32(0))
    consts = (jnp.float64(1.0), jnp.int32(-40),
              jnp.float64(float(cx)), jnp.float64(float(cy)))
    st, sh = O.orbit_chunk(*args, *dzdc0, *args, *consts,
                           spec=spec, steps=steps)
    return ([np.asarray(a) for a in st],
            [np.asarray(a) for a in sh])


def test_orbit_tail_shadow_matches_xla_glue(monkeypatch):
    spec = FP.FixedSpec.for_limbs(1024)   # nfft 4096 == 2·digits
    steps = 24
    ref_st, ref_sh = _chunk(spec, steps)

    # route through the fused tail (interpret on CPU) WITH in-kernel
    # shadow emission; clear the jit cache so the body retraces
    real_ft = NP.fused_tail

    def ft(*a, **k):
        k["interpret"] = True
        return real_ft(*a, **k)

    monkeypatch.setattr(NP, "fused_tail", ft)
    monkeypatch.setattr(
        FP, "_use_fused_tail",
        lambda nf, D: 2 * D == nf and nf % 128 == 0 and nf >= 2048)
    monkeypatch.setattr(O, "SPLIT_BOOKKEEPING", False)  # legacy path
    O.orbit_chunk.clear_cache()
    try:
        got_st, got_sh = _chunk(spec, steps)
    finally:
        O.orbit_chunk.clear_cache()

    for k, (a, b) in enumerate(zip(ref_st, got_st)):
        np.testing.assert_array_equal(a, b, err_msg=f"state[{k}]")
    for k, (a, b) in enumerate(zip(ref_sh, got_sh)):
        np.testing.assert_array_equal(a, b, err_msg=f"out[{k}]")


def test_orbit_split_bookkeeping_bit_identity(monkeypatch):
    """SPLIT_BOOKKEEPING (digit-only kernel scan + exact host f64
    bookkeeping) reproduces the interleaved device scan bit for bit:
    digit state, final dzdc, and the packed shadow/flag rows."""
    spec = FP.FixedSpec.for_limbs(1024)   # nfft 4096 == 2·digits
    steps = 24
    ref_st, ref_sh = _chunk(spec, steps)

    real_ft = NP.fused_tail

    def ft(*a, **k):
        k["interpret"] = True
        return real_ft(*a, **k)

    monkeypatch.setattr(NP, "fused_tail", ft)
    monkeypatch.setattr(
        FP, "_use_fused_tail",
        lambda nf, D: 2 * D == nf and nf % 128 == 0 and nf >= 2048)
    monkeypatch.setattr(O, "SPLIT_BOOKKEEPING", True)
    O.orbit_chunk.clear_cache()
    try:
        got_st, rows = _chunk(spec, steps)
    finally:
        O.orbit_chunk.clear_cache()

    for k, (a, b) in enumerate(zip(ref_st[:4], got_st)):
        np.testing.assert_array_equal(a, b, err_msg=f"state[{k}]")

    cx = -0.7436438870371587
    cy = 0.1318259042053119
    packed, dzf = O.host_bookkeeping(
        np.stack(rows), (1.0, 0.0, 0), 1.0, -40, cx, cy,
        spec.frac_bits,
        periodicity=False)   # full loop: final dzdc must match
    ref = np.asarray(ref_sh)
    # flags must agree exactly; f64 shadows/dzdc to a few ulp — the
    # device scan's XLA lowering contracts mul+add chains into FMAs,
    # so bitwise cross-path identity is unattainable.  The host pass
    # (pure IEEE ldexp/frexp, no contraction) is the better-defined
    # semantic and matches the native C++ evaluator.
    np.testing.assert_array_equal(ref[2], packed[2], err_msg="period")
    np.testing.assert_array_equal(ref[3], packed[3], err_msg="escape")
    np.testing.assert_array_equal(ref[6], packed[6], err_msg="e_sh")
    for r in (0, 1, 4, 5):
        np.testing.assert_allclose(ref[r], packed[r], rtol=1e-14,
                                   err_msg=f"row {r}")
    np.testing.assert_allclose([float(ref_st[4]), float(ref_st[5])],
                               [dzf[0], dzf[1]], rtol=1e-13)
    assert int(ref_st[6]) == dzf[2]


def test_host_bookkeeping_chunk_continuity(monkeypatch):
    """dz carried across two host_bookkeeping chunks == one long
    chunk, and the packed rows concatenate identically (the session's
    cross-chunk dz handoff)."""
    spec = FP.FixedSpec.for_limbs(1024)
    cx = -0.7436438870371587
    cy = 0.1318259042053119

    real_ft = NP.fused_tail

    def ft(*a, **k):
        k["interpret"] = True
        return real_ft(*a, **k)

    monkeypatch.setattr(NP, "fused_tail", ft)
    monkeypatch.setattr(
        FP, "_use_fused_tail",
        lambda nf, D: 2 * D == nf and nf % 128 == 0 and nf >= 2048)
    monkeypatch.setattr(O, "SPLIT_BOOKKEEPING", True)
    O.orbit_chunk.clear_cache()
    try:
        cxh = HighPrecision(str(cx), prec=spec.frac_bits)
        cyh = HighPrecision(str(cy), prec=spec.frac_bits)
        scx, cxd = FP.hp_to_digits(cxh, spec)
        scy, cyd = FP.hp_to_digits(cyh, spec)
        args = (jnp.int32(scx), jnp.asarray(cxd), jnp.int32(scy),
                jnp.asarray(cyd))
        dz0 = (jnp.float64(1.0), jnp.float64(0.0), jnp.int32(0))
        consts = (jnp.float64(1.0), jnp.int32(-40),
                  jnp.float64(cx), jnp.float64(cy))
        st1, r1 = O.orbit_chunk(*args, *dz0, *args, *consts,
                                spec=spec, steps=16)
        st2, r2 = O.orbit_chunk(*st1, *dz0, *args, *consts,
                                spec=spec, steps=16)
        _, rf = O.orbit_chunk(*args, *dz0, *args, *consts,
                              spec=spec, steps=32)
    finally:
        O.orbit_chunk.clear_cache()

    rows1 = np.stack([np.asarray(a) for a in r1])
    rows2 = np.stack([np.asarray(a) for a in r2])
    rowsf = np.stack([np.asarray(a) for a in rf])
    np.testing.assert_array_equal(
        np.concatenate([rows1, rows2], axis=1), rowsf)

    p1, dz1 = O.host_bookkeeping(rows1, (1.0, 0.0, 0), 1.0, -40,
                                 cx, cy, spec.frac_bits,
                                 periodicity=False)
    p2, dz2 = O.host_bookkeeping(rows2, dz1, 1.0, -40,
                                 cx, cy, spec.frac_bits,
                                 periodicity=False)
    pf, dzf = O.host_bookkeeping(rowsf, (1.0, 0.0, 0), 1.0, -40,
                                 cx, cy, spec.frac_bits,
                                 periodicity=False)
    np.testing.assert_array_equal(np.concatenate([p1, p2], axis=1), pf)
    assert dz2 == dzf
