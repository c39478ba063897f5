"""Benchmark driver — prints ONE JSON line for the round harness.

Primary metric this round: plain escape-time throughput (Mpix/s) on
View #0 at 2048×2048 / 2048 iterations via the Pallas f32 kernel on the
real TPU chip. Baseline for shallow views (BASELINE.md): 1 Gpix/s.

As deeper subsystems land (perturbation, LAv2, NTT reference orbit) this
script grows companion metrics; the headline line stays last.
"""

import json
import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fractalshark_tpu.core.views import get_view_preset
    from fractalshark_tpu.ops import escape

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    size = 4096 if on_tpu else 512
    max_iter = 512 if on_tpu else 256

    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(size, size)
    params = escape.PlainParams.from_view(ptz, size, size)

    def run():
        if on_tpu:
            out = escape.escape_pallas(params, size, size, max_iter,
                                       dtype=jnp.float32)
        else:
            out = escape.escape_jax(params, size, size, max_iter,
                                    dtype=jnp.float32)
        # force a real host readback: through the axon tunnel,
        # block_until_ready alone can return before device work completes
        import numpy as np
        return int(np.asarray(out[-1, -1]))

    import numpy as np

    run()  # compile
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run()
    dt = (time.perf_counter() - t0) / n_rep

    # effective iteration throughput matters more than pixels; report both
    # (sum on host: 64-bit device→scalar conversion is unsupported on
    # some TPU runtimes)
    if on_tpu:
        out = escape.escape_pallas(params, size, size, max_iter,
                                   dtype=jnp.float32)
    else:
        out = escape.escape_jax(params, size, size, max_iter,
                                dtype=jnp.float32)
    total_iters = int(np.asarray(out).astype(np.uint64).sum())
    mpix_s = size * size / dt / 1e6
    giter_s = total_iters / dt / 1e9

    result = {
        "metric": f"plain_escape_f32_view0_{size}x{size}_{max_iter}it",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / 1000.0, 4),  # baseline: 1 Gpix/s
        "extra": {
            "backend": backend,
            "wall_s": round(dt, 4),
            "giter_per_s": round(giter_s, 3),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
