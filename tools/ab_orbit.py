"""A/B one orbit-iteration NTT config on the live backend.

Usage: python tools/ab_orbit.py CONFIG [limbs] [steps]
  CONFIG: xla    — XLA four-step transforms (+ fused tail default)
          split  — three-kernel split Pallas pipeline
          whole  — whole-chain aligned-table single kernel
          shadow — xla + in-tail shadow emission (TAIL_SHADOW)
Separate processes per config: the routing flags are read at trace
time and orbit_chunk's jit cache would not retrace on a flag flip.

Prints ms/iter (wall best-of-3 + device) and a shadow checksum so
runs are cross-comparable for bit-identity.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum import ntt_pallas as NP
from fractalshark_tpu.ops.bignum.orbit import orbit_chunk

cfg = sys.argv[1] if len(sys.argv) > 1 else "xla"
limbs = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 256

if cfg == "shadow":
    from fractalshark_tpu.ops.bignum import orbit as _O
    _O.TAIL_SHADOW = True
elif cfg == "split":
    FP.PALLAS_NTT_SPLIT = True
elif cfg == "whole":
    FP.PALLAS_NTT_SPLIT = True
    NP.WHOLE_ALIGNED = True
elif cfg == "mxuiter":
    from fractalshark_tpu.ops.bignum import ntt_mxu as NM
    NM.MXU_ITER = True
elif cfg == "mxufull":
    from fractalshark_tpu.ops.bignum import ntt_mxu as NM
    NM.MXU_ITER = True
    NM.MXU_ITER_FULL = True
elif cfg == "bksplit":
    from fractalshark_tpu.ops.bignum import orbit as _O2
    _O2.SPLIT_BOOKKEEPING = True
elif cfg == "btail":
    NP.BATCHED_TAIL = True
elif cfg == "nopair":
    FP.PAIRED_ITER = False
elif cfg == "xlashadow":
    from fractalshark_tpu.ops.bignum import orbit as _O3
    _O3.SPLIT_XLA_SHADOW = True
elif cfg not in ("xla",):
    raise SystemExit(f"unknown config {cfg}")

spec = FP.FixedSpec.for_limbs(limbs)
print(f"cfg={cfg} limbs={limbs} nfft={spec.nfft} steps={steps} "
      f"fused_tail={FP._use_fused_tail(spec.nfft, spec.digits)}",
      flush=True)

prec = spec.frac_bits
cx = HighPrecision("-0.74364388703715870475460905435480729"
                   "33907417816754225", prec=prec)
cy = HighPrecision("0.13182590420531197044950243419313988"
                   "70926304415521677", prec=prec)
scx, cxd = FP.hp_to_digits(cx, spec)
scy, cyd = FP.hp_to_digits(cy, spec)
args = (jnp.int32(scx), jnp.asarray(cxd), jnp.int32(scy),
        jnp.asarray(cyd))
dzdc0 = (jnp.float64(1.0), jnp.float64(0.0), jnp.int32(0))
consts = (jnp.float64(1.0), jnp.int32(-40),
          jnp.float64(float(cx)), jnp.float64(float(cy)))


def run():
    st, sh = orbit_chunk(*args, *dzdc0,
                         args[0], args[1], args[2], args[3],
                         *consts, spec=spec, steps=steps)
    np.asarray(sh[0][-1])
    return st, sh


t0 = time.perf_counter()
st, sh = run()
print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
# cross-config identity: f64 shadow checksum + final digit sums
print(f"checksum: shx={float(np.asarray(sh[0]).sum()):.17g} "
      f"shy={float(np.asarray(sh[1]).sum()):.17g} "
      f"x={int(np.asarray(st[1], np.uint64).sum())} "
      f"y={int(np.asarray(st[3], np.uint64).sum())}", flush=True)

best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
dev = ""
try:
    from fractalshark_tpu.utils.profiling import device_time_ms
    prof = device_time_ms(lambda: run())
    if prof["total_ms"] > 0:
        dev = f" device {prof['total_ms'] / steps:.3f}"
except Exception as e:  # noqa: BLE001
    dev = f" (prof error {e!r})"
print(f"RESULT cfg={cfg}: wall {best / steps * 1e3:.3f}{dev} ms/iter "
      f"({steps}-step chunks)", flush=True)
