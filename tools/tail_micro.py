"""Microbench the fused CRT+carry tail in isolation.

Times ntt_pallas.fused_tail on random (valid-range) residue planes at
a given nfft, K=2 (plain-orbit shape), device time per call.  Used to
establish whether the tail is data-size-bound (halving nfft halves the
time) or pass-count-bound (time ~flat in nfft) — the fork in the
road for the base-2^32 digit-pair restructure (VERDICT r3 #5).

Usage: python tools/tail_micro.py [nfft] [reps]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fractalshark_tpu.ops.bignum import ntt as N
from fractalshark_tpu.ops.bignum import ntt_pallas as NP

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

rng = np.random.default_rng(7)
K = 2
inv = jnp.asarray(np.stack([
    rng.integers(0, N.P1, size=(K, n), dtype=np.uint32),
    rng.integers(0, N.P2, size=(K, n), dtype=np.uint32)], axis=1))
cadd = jnp.asarray(rng.integers(0, 1 << 16, size=(K, n),
                                dtype=np.uint32))
rnd = jnp.zeros((n,), jnp.uint32)
sgs = jnp.asarray([1, 1, 1, 0], jnp.int32)


def run():
    dig, sgn, shw = NP.fused_tail(inv, cadd, rnd, sgs, n=n,
                                  shadow_fd=(n // 4, n // 2))
    return dig, sgn, shw


out = run()
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(reps):
    out = run()
jax.block_until_ready(out)
wall = (time.perf_counter() - t0) / reps
dev = ""
try:
    from fractalshark_tpu.utils.profiling import device_time_ms
    prof = device_time_ms(lambda: jax.block_until_ready(run()))
    if prof["total_ms"] > 0:
        dev = f" device {prof['total_ms'] * 1e3:.1f}"
except Exception as e:  # noqa: BLE001
    dev = f" (prof error {e!r})"
print(f"RESULT n={n} K={K}: wall {wall * 1e6:.1f}{dev} us/call",
      flush=True)
