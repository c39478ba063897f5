"""Colorize a saved iteration grid (``*.npy``) into a PNG artifact.

The endurance drivers (tools/view27_render.py, run_view32.py) persist
raw per-pixel iteration counts; this applies the standard palette
pipeline (core/palette.FractalPalette -> ops/coloring.color_from_iters,
the same path the CLI renderer uses) with iteration counts rebased to
the grid's own min so deep-budget frames (iter_min ~ 49e9 at View #27)
land in palette range.

    python -c "exec(open('tools/iters_to_png.py').read())" in.npy out.png
Env: I2P_IN, I2P_OUT (fallbacks for argv), I2P_PALETTE (Default),
I2P_DEPTH (8).
"""

import os
import sys

import numpy as np

argv = sys.argv[1:]
IN = argv[0] if argv else os.environ.get("I2P_IN")
OUT = (argv[1] if len(argv) > 1 else
       os.environ.get("I2P_OUT", "/tmp/iters.png"))
PAL = os.environ.get("I2P_PALETTE", "Default")
DEPTH = int(os.environ.get("I2P_DEPTH", "8"))

from fractalshark_tpu.core.palette import FractalPalette  # noqa: E402
from fractalshark_tpu.io.png import write_png             # noqa: E402
from fractalshark_tpu.ops import coloring                 # noqa: E402

it = np.load(IN).astype(np.int64)
lo = int(it.min())
hi = int(it.max())
# rebase so the palette sweeps the frame's live range; budget-capped
# pixels (the interior) land on the max bucket
span = max(hi - lo, 1)
reb = (it - lo)
import jax.numpy as jnp  # noqa: E402

pal = FractalPalette()
pal.use_palette_type(PAL)
rgba16 = np.asarray(coloring.color_from_iters(
    jnp.asarray(reb.astype(np.uint32 if span < (1 << 31)
                           else np.uint64)),
    jnp.asarray(pal.current()),
    jnp.asarray(span + 1, np.uint64),
    jnp.asarray(0, np.uint32)))
img = coloring.rgba16_to_rgba8(rgba16)
write_png(OUT, img)
print(f"wrote {OUT} ({it.shape[1]}x{it.shape[0]}, "
      f"iters {lo}..{hi})")
