"""Quantify the per-chunk host overhead of the orbit session loop:
dispatch latency, device compute, and the out[:7] readback pattern
(7 separate D2H transfers through the axon tunnel vs one packed).

Run from repo root:  python -c "exec(open('tools/probe_readback.py').read())"
Env: PR_LIMBS (16384), PR_STEPS (2048).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum.orbit import orbit_chunk

limbs = int(os.environ.get("PR_LIMBS", "16384"))
steps = int(os.environ.get("PR_STEPS", "2048"))
spec = FP.FixedSpec.for_limbs(limbs)
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


def dispatch(state):
    return orbit_chunk(*state, args[0], args[1], args[2], args[3],
                       *consts, spec=spec, steps=steps)


t0 = time.perf_counter()
st, out = dispatch(args + dzdc0)
np.asarray(out[0][-1])
print(f"compile+first: {time.perf_counter() - t0:.1f}s "
      f"(limbs={limbs} steps={steps})", flush=True)

# (a) full synchronous chunk: dispatch + block + 7 readbacks
for tag in ("sync1", "sync2"):
    t0 = time.perf_counter()
    st2, out = dispatch(args + dzdc0)
    t_disp = time.perf_counter() - t0
    jax.block_until_ready(st2)
    t_dev = time.perf_counter() - t0
    vals = [np.asarray(v) for v in out[:7]]
    t_all = time.perf_counter() - t0
    print(f"{tag}: dispatch {t_disp*1e3:.0f} ms; +device "
          f"{(t_dev-t_disp)*1e3:.0f} ms; +7 readbacks "
          f"{(t_all-t_dev)*1e3:.0f} ms; total {t_all*1e3:.0f} ms "
          f"({t_all/steps*1e3:.3f} ms/iter)", flush=True)

# (b) readback cost alone, already-computed outputs
jax.block_until_ready(out)
t0 = time.perf_counter()
vals = [np.asarray(v) for v in out[:7]]
t7 = time.perf_counter() - t0
t0 = time.perf_counter()
one = np.asarray(out[0])
t1 = time.perf_counter() - t0
print(f"readback: 7 arrays {t7*1e3:.0f} ms; 1 array {t1*1e3:.0f} ms",
      flush=True)

# (c) pipelined: dispatch chunk k+1 BEFORE reading chunk k's outputs
state = args + dzdc0
st_prev, out_prev = dispatch(state)
n = 4
t0 = time.perf_counter()
for _ in range(n):
    st_next, out_next = dispatch(st_prev[:7] if len(st_prev) > 7
                                 else st_prev)
    _ = [np.asarray(v) for v in out_prev[:7]]
    st_prev, out_prev = st_next, out_next
jax.block_until_ready(st_prev)
dt = (time.perf_counter() - t0) / n
print(f"pipelined: {dt*1e3:.0f} ms/chunk ({dt/steps*1e3:.3f} ms/iter)",
      flush=True)
