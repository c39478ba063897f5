"""Deep zoom SEQUENCE at View #30: one reference orbit + LA table,
N frames at successive zooms — the reference's interactive-zoom use
case (FractalShark renders every zoom step against the same reference
orbit until a recalc is needed, RefOrbitCalc reuse).

All frames share the compiled two-phase program (shapes are
zoom-invariant), so after frame 1 the sequence runs at warm-kernel
speed: this measures the frame rate a user panning/zooming at depth
actually sees, with compile amortized the way interactive use
amortizes it.

Reuses the orbit saved by tools/run_view30.py
(/tmp/view30_orbit_{x,y,e}.npy).

Usage: python tools/zoomseq_view30.py [size] [n_frames] [zoom_step]
"""

import json
import sys
import time

import numpy as np

size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
step = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

from fractalshark_tpu.core.hdr_host import HD                 # noqa: E402
from fractalshark_tpu.core.views import get_view_preset       # noqa: E402
from fractalshark_tpu.engine.la_reference import LAReferenceHost  # noqa: E402
from fractalshark_tpu.engine.perturbation_results import (    # noqa: E402
    CompressedOrbit, PerturbationResults)
from fractalshark_tpu.ops import la_kernel                    # noqa: E402
from fractalshark_tpu.ops.perturb_stream import (             # noqa: E402
    perturb_render_stream_rc)

v = get_view_preset(30)
base = v.ptz.square_aspect_ratio(size, size)
n = v.num_iterations

ox = np.load("/tmp/view30_orbit_x.npy")
oy = np.load("/tmp/view30_orbit_y.npy")
try:
    oe = np.load("/tmp/view30_orbit_e.npy")
except FileNotFoundError:
    oe = None
try:
    with open("/tmp/view30_progress.json") as f:
        period = int(json.load(f).get("period", 0)) or len(ox) - 1
except Exception:  # noqa: BLE001
    period = len(ox) - 1
res = PerturbationResults(
    center_x=base.pt_x, center_y=base.pt_y,
    orbit_x=ox, orbit_y=oy, max_radius=base.radius,
    period=period, escaped_at=0, max_iterations=n,
    precision_bits=base.pt_x.prec, orbit_e=oe)
print(f"orbit entries {res.count_orbit_entries()} period {res.period}",
      flush=True)

t0 = time.perf_counter()
la = LAReferenceHost.generate_auto(res.orbit_x, res.orbit_y,
                                   HD.from_hp(res.max_radius),
                                   orbit_e=res.orbit_e)
print(f"la build {time.perf_counter() - t0:.1f}s valid={la.is_valid}",
      flush=True)
ident = CompressedOrbit.identity(res)


def render_frame(ptz):
    st = la_kernel.la_perturb_render(
        res, la, ptz, size, size, n, sub_dtype=np.float32,
        la_only=True, return_state=True)
    _, _, ref_iter, dzr, dzi, dze, it, _ = st
    it64 = np.asarray(it).astype(np.int64)
    init = {"dzr": np.asarray(dzr), "dzi": np.asarray(dzi),
            "dze": np.asarray(dze), "it": it64,
            "jwait": np.asarray(ref_iter).astype(np.int64),
            "done": (it64 >= n).astype(np.int32)}
    return np.asarray(perturb_render_stream_rc(
        ident, res.center_x, res.center_y, ptz, size, size, n,
        init_state=init))


# frames zoom IN toward the view's final depth: frame k at
# final_zoom / step^(n_frames-1-k)
walls = []
for k in range(n_frames):
    scale = 1.0 / step ** (n_frames - 1 - k)
    ptz = base.zoomed_at_center(scale)
    t0 = time.perf_counter()
    o = render_frame(ptz)
    dt = time.perf_counter() - t0
    walls.append(dt)
    print(f"frame {k}: zoom final*{scale:.4g} wall {dt:.2f}s "
          f"iter_sum {int(o.astype(np.int64).sum())}", flush=True)

warm = walls[1:]
print(f"RESULT: {n_frames} frames {size}x{size}, first {walls[0]:.1f}s "
      f"(compile), warm avg {np.mean(warm):.2f}s/frame "
      f"= {size * size / np.mean(warm) / 1e6:.3f} Mpix/s "
      f"({1.0 / np.mean(warm):.2f} fps)", flush=True)
