"""Measure the orbit session's end-to-end per-iteration wall after the
packed single-transfer chunk outputs + double-buffered loop, against
the raw synchronous chunk cost.

Run from repo root:  python -c "exec(open('tools/probe_readback.py').read())"
Env: PR_LIMBS (16384), PR_STEPS (2048), PR_ITERS (8192).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum.orbit import TpuOrbitSession, orbit_chunk

limbs = int(os.environ.get("PR_LIMBS", "16384"))
steps = int(os.environ.get("PR_STEPS", "2048"))
iters = int(os.environ.get("PR_ITERS", "8192"))
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
np.asarray(out)[0, -1]
print(f"compile+first: {time.perf_counter() - t0:.1f}s "
      f"(limbs={limbs} steps={steps})", flush=True)

# (a) synchronous chunk: dispatch + device + ONE packed readback
for tag in ("sync1", "sync2"):
    t0 = time.perf_counter()
    st2, out = dispatch(args + dzdc0)
    t_disp = time.perf_counter() - t0
    jax.block_until_ready(st2)
    t_dev = time.perf_counter() - t0
    arr = np.asarray(out)
    t_all = time.perf_counter() - t0
    print(f"{tag}: dispatch {t_disp*1e3:.0f} ms; +device "
          f"{(t_dev-t_disp)*1e3:.0f} ms; +packed readback "
          f"{(t_all-t_dev)*1e3:.0f} ms; total {t_all*1e3:.0f} ms "
          f"({t_all/steps*1e3:.3f} ms/iter)", flush=True)

# (b) the real session loop (double-buffered), budget-bounded
sess = TpuOrbitSession(spec=spec, center_x=cx, center_y=cy,
                       max_radius=HighPrecision("1e-40", prec=64),
                       chunk_steps=steps)
res = sess.run(iters, periodicity=False)       # warm path
t0 = time.perf_counter()
res = sess.run(iters, periodicity=False)
dt = time.perf_counter() - t0
print(f"session: {iters} iters in {dt:.2f} s "
      f"({dt/iters*1e3:.3f} ms/iter) orbit_len={res.count_orbit_entries()}",
      flush=True)
