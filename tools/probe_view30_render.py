"""A/B the View #30 render phase: XLA LA machine vs streaming LA
machine for phase 1, identical RC streaming tail for phase 2.

Reuses the orbit saved by tools/run_view30.py
(/tmp/view30_orbit_{x,y,e}.npy) so the 4-minute orbit phase is not
recomputed.  Prints per-phase wall times and the iteration sum so the
two configs are checked for pixel identity.

Usage: python tools/probe_view30_render.py [size] [xla|stream|both]
"""

import sys
import time

import numpy as np

size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
which = sys.argv[2] if len(sys.argv) > 2 else "both"

from fractalshark_tpu.core.hdr_host import HD                 # noqa: E402
from fractalshark_tpu.core.views import get_view_preset       # noqa: E402
from fractalshark_tpu.engine.la_reference import LAReferenceHost  # noqa: E402
from fractalshark_tpu.engine.perturbation_results import (    # noqa: E402
    CompressedOrbit, PerturbationResults)
from fractalshark_tpu.ops import la_kernel                    # noqa: E402
from fractalshark_tpu.ops.perturb_stream import (             # noqa: E402
    perturb_render_stream_rc)

v = get_view_preset(30)
ptz = v.ptz.square_aspect_ratio(size, size)
n = v.num_iterations

ox = np.load("/tmp/view30_orbit_x.npy")
oy = np.load("/tmp/view30_orbit_y.npy")
try:
    oe = np.load("/tmp/view30_orbit_e.npy")
except FileNotFoundError:
    oe = None
try:
    import json
    with open("/tmp/view30_progress.json") as f:
        period = int(json.load(f).get("period", 0)) or len(ox) - 1
except Exception:  # noqa: BLE001
    period = len(ox) - 1
res = PerturbationResults(
    center_x=ptz.pt_x, center_y=ptz.pt_y,
    orbit_x=ox, orbit_y=oy, max_radius=ptz.radius,
    period=period, escaped_at=0, max_iterations=n,
    precision_bits=ptz.pt_x.prec, orbit_e=oe)
print(f"orbit entries {res.count_orbit_entries()} period {res.period}",
      flush=True)

t0 = time.perf_counter()
la = LAReferenceHost.generate_auto(res.orbit_x, res.orbit_y,
                                   HD.from_hp(res.max_radius),
                                   orbit_e=res.orbit_e)
print(f"la build {time.perf_counter() - t0:.1f}s valid={la.is_valid} "
      f"stages={la.stage_count}", flush=True)
ident = CompressedOrbit.identity(res)


def tail(init):
    return np.asarray(perturb_render_stream_rc(
        ident, res.center_x, res.center_y, ptz, size, size, n,
        init_state=init))


def run_xla():
    t0 = time.perf_counter()
    st = la_kernel.la_perturb_render(
        res, la, ptz, size, size, n, sub_dtype=np.float32,
        la_only=True, return_state=True)
    _, _, ref_iter, dzr, dzi, dze, it, _ = st
    it64 = np.asarray(it).astype(np.int64)
    init = {"dzr": np.asarray(dzr), "dzi": np.asarray(dzi),
            "dze": np.asarray(dze), "it": it64,
            "jwait": np.asarray(ref_iter).astype(np.int64),
            "done": (it64 >= n).astype(np.int32)}
    p1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = tail(init)
    p2 = time.perf_counter() - t0
    return o, p1, p2


def run_stream():
    from fractalshark_tpu.ops.la_stream import la_phase_stream
    t0 = time.perf_counter()
    init = la_phase_stream(res, la, ptz, size, size, n)
    p1 = time.perf_counter() - t0
    if init is None:
        print("la_phase_stream returned None", flush=True)
        return None, p1, 0.0
    t0 = time.perf_counter()
    o = tail(init)
    p2 = time.perf_counter() - t0
    return o, p1, p2


for name, fn in (("xla", run_xla), ("stream", run_stream)):
    if which not in (name, "both"):
        continue
    # run twice: the first call carries the remote compiles, the
    # second is the honest warm number
    for tag in ("cold", "warm"):
        o, p1, p2 = fn()
        if o is None:
            break
        print(f"RESULT {name} {tag}: phase1 {p1:.1f}s phase2 {p2:.1f}s "
              f"total {p1 + p2:.1f}s "
              f"iter_sum {int(o.astype(np.int64).sum())}", flush=True)
