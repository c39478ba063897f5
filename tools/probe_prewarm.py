"""Validate the prewarm + shape-bucketed two-phase render:

1. run engine.prewarm.prewarm_two_phase cold (timed) — this is what
   hides under the orbit phase in a record run;
2. LA build from the saved View #30 orbit (/tmp/view30_orbit_*.npy);
3. bucketed two_phase_render — should now run WARM in this cold
   process, and the iteration sum must match the known record value.

Usage: PYTHONPATH=. python tools/probe_prewarm.py [size]
"""

import sys
import time

import numpy as np

size = int(sys.argv[1]) if len(sys.argv) > 1 else 512

from fractalshark_tpu.core.hdr_host import HD                 # noqa: E402
from fractalshark_tpu.core.views import get_view_preset       # noqa: E402
from fractalshark_tpu.engine.la_reference import LAReferenceHost  # noqa: E402
from fractalshark_tpu.engine.perturbation_results import (    # noqa: E402
    PerturbationResults)
from fractalshark_tpu.engine.prewarm import (                 # noqa: E402
    deep_buckets, prewarm_two_phase)
from fractalshark_tpu.engine.renderers import two_phase_render  # noqa: E402

v = get_view_preset(30)
ptz = v.ptz.square_aspect_ratio(size, size)
n = v.num_iterations

t0 = time.perf_counter()
info = prewarm_two_phase(ptz, size, size, n,
                         log=lambda s: print(s, flush=True))
print(f"PREWARM {time.perf_counter() - t0:.1f}s {info}", flush=True)

ox = np.load("/tmp/view30_orbit_x.npy")
oy = np.load("/tmp/view30_orbit_y.npy")
try:
    oe = np.load("/tmp/view30_orbit_e.npy")
except FileNotFoundError:
    oe = None
res = PerturbationResults(
    center_x=ptz.pt_x, center_y=ptz.pt_y,
    orbit_x=ox, orbit_y=oy, max_radius=ptz.radius,
    period=len(ox), escaped_at=0, max_iterations=n,
    precision_bits=ptz.pt_x.prec, orbit_e=oe)

t0 = time.perf_counter()
la = LAReferenceHost.generate_auto(res.orbit_x, res.orbit_y,
                                   HD.from_hp(res.max_radius),
                                   orbit_e=res.orbit_e)
print(f"LA {time.perf_counter() - t0:.1f}s stages={la.stage_count}",
      flush=True)

pads = deep_buckets(res, la)
print(f"buckets: {pads}", flush=True)
for tag in ("first", "repeat"):
    t0 = time.perf_counter()
    o = np.asarray(two_phase_render(res, la, ptz, size, size, n, **pads))
    print(f"RENDER {tag}: {time.perf_counter() - t0:.1f}s "
          f"iter_sum {int(o.astype(np.int64).sum())}", flush=True)
print("EXPECT iter_sum 351206692131 (512 only)")
