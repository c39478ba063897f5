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
    O.orbit_chunk.clear_cache()
    try:
        got_st, got_sh = _chunk(spec, steps)
    finally:
        O.orbit_chunk.clear_cache()

    for k, (a, b) in enumerate(zip(ref_st, got_st)):
        np.testing.assert_array_equal(a, b, err_msg=f"state[{k}]")
    for k, (a, b) in enumerate(zip(ref_sh, got_sh)):
        np.testing.assert_array_equal(a, b, err_msg=f"out[{k}]")
