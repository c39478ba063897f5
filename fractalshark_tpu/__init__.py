"""fractalshark_tpu — a TPU-native deep-zoom Mandelbrot rendering framework.

A ground-up rebuild of the capability set of FractalShark (reference:
mattsaccount364/FractalShark) designed for TPU hardware:

* escape-time rendering across dtype-parameterized algorithm families
  (f32 / f64 / 2x32 double-float / HDR float+exponent), expressed as
  branch-free masked JAX/Pallas kernels over pixel tiles;
* perturbation theory (one high-precision reference orbit + per-pixel
  low-precision delta orbits) with Zhuoran rebasing;
* linear approximation (LAv2) iteration skipping;
* a high-precision big-float pipeline (32-bit limb arrays, NTT multiply)
  for computing reference orbits on-device;
* multi-chip scale-out via `jax.sharding` meshes (pixel-tile data
  parallelism, broadcast orbit/LA tables).

Host orchestration is Python; compute runs under `jax.jit`/Pallas.
"""

import os

# Deep zoom fundamentally requires float64 on the host/CPU path (golden
# tests are pinned at f64, matching the reference's Cpu64 algorithms).
# TPU execution uses f32 / double-float / HDR kernels, which are native.
if os.environ.get("FRACTALSHARK_NO_X64", "0") != "1":
    import jax

    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first-time TPU compiles of the deep-zoom
# kernels are expensive (minutes through a remote-compile tunnel);
# caching makes every later process start warm.
if os.environ.get("FRACTALSHARK_NO_COMPILE_CACHE", "0") != "1":
    import jax

    _cache_dir = os.environ.get(
        "FRACTALSHARK_COMPILE_CACHE",
        os.path.expanduser("~/.cache/fractalshark_tpu_jax"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass

__version__ = "0.1.0"

from fractalshark_tpu.core.highprecision import HighPrecision  # noqa: E402
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter  # noqa: E402

__all__ = [
    "HighPrecision",
    "PointZoomBBConverter",
    "__version__",
]
