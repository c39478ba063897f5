import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum.orbit import orbit_chunk

limbs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
if len(sys.argv) > 3 and sys.argv[3] == "xla":
    FP.PALLAS_NTT = False

spec = FP.FixedSpec.for_limbs(limbs)
print(f"limbs={limbs} digits={spec.digits} nfft={spec.nfft} "
      f"pallas={FP._use_pallas(spec.nfft)}", flush=True)

cx = HighPrecision("-0.7436438870371587", prec=spec.frac_bits)
cy = HighPrecision("0.1318259042053119", prec=spec.frac_bits)
scx, cxd = FP.hp_to_digits(cx, spec)
scy, cyd = FP.hp_to_digits(cy, spec)
state = (jnp.int32(scx), jnp.asarray(cxd), jnp.int32(scy), jnp.asarray(cyd))
args = (jnp.int32(scx), jnp.asarray(cxd), jnp.int32(scy), jnp.asarray(cyd))

t0 = time.perf_counter()
st, sh = orbit_chunk(*state, *args, spec=spec, steps=steps)
jax.block_until_ready(st)
_ = np.asarray(st[1][:4])
print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    st, sh = orbit_chunk(*state, *args, spec=spec, steps=steps)
    jax.block_until_ready(st)
    _ = np.asarray(st[1][:4])
    best = min(best, time.perf_counter() - t0)
print(f"orbit {limbs} limbs: {best / steps * 1e3:.3f} ms/iter", flush=True)
