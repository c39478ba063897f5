"""A/B: LA table composition depth for poster-class deep renders.

VERDICT r3 weak #3: the 2048² View #6 poster spends ~10 s in phase-1
(gather-bound LA machine).  DESIGN ch.17's honest lever is FEWER LA
steps per pixel — low_bound=1 composes the stage pyramid down to a
terminal whole-orbit node (the View #27 recipe, la_reference.py:48-56),
dividing per-wrap macro-step counts by up to 64.  This measures the
full two-phase render (LA machine + RC streaming tail) at SIZE² on the
View #6 preset for low_bound ∈ {64 (default), 1} and prints wall times
+ iteration sums.

Run from the repo root:
    python -c "exec(open('tools/ab_la_depth.py').read())"
Env: AB_SIZE (512), AB_REPS (3).
"""

import json
import os
import time

import numpy as np

SIZE = int(os.environ.get("AB_SIZE", "512"))
REPS = int(os.environ.get("AB_REPS", "3"))

from fractalshark_tpu.core.hdr_host import HD                   # noqa: E402
from fractalshark_tpu.core.views import get_view_preset         # noqa: E402
from fractalshark_tpu.engine.la_reference import (LAParameters,  # noqa: E402
                                                  LAReferenceHost)
from fractalshark_tpu.engine.perturbation_results import \
    CompressedOrbit                                             # noqa: E402
from fractalshark_tpu.engine.reforbit import RefOrbitCalc       # noqa: E402
from fractalshark_tpu.ops import la_kernel                      # noqa: E402
from fractalshark_tpu.ops.perturb_stream import \
    perturb_render_stream_rc                                    # noqa: E402

v = get_view_preset(6)
ptz = v.ptz.square_aspect_ratio(SIZE, SIZE)
budget = v.num_iterations
calc = RefOrbitCalc()
t0 = time.perf_counter()
res = calc.get_and_create_useful_results(ptz, budget)
print(json.dumps({"orbit_s": round(time.perf_counter() - t0, 2),
                  "orbit_len": res.count_orbit_entries(),
                  "budget": int(budget), "size": SIZE}))
ident = CompressedOrbit.identity(res)


def run(la):
    n = budget
    t0 = time.perf_counter()
    state = la_kernel.la_perturb_render(
        res, la, ptz, SIZE, SIZE, n, sub_dtype=np.float32,
        la_only=True, return_state=True)
    _, _, ref_iter, dzr, dzi, dze, it, _ = state
    it64 = np.asarray(it).astype(np.int64)
    la_s = time.perf_counter() - t0
    init = {"dzr": np.asarray(dzr), "dzi": np.asarray(dzi),
            "dze": np.asarray(dze), "it": it64,
            "jwait": np.asarray(ref_iter).astype(np.int64),
            "done": (it64 >= n).astype(np.int32)}
    t0 = time.perf_counter()
    out = np.asarray(perturb_render_stream_rc(
        ident, res.center_x, res.center_y, ptz, SIZE, SIZE, n,
        init_state=init))
    tail_s = time.perf_counter() - t0
    return (la_s, tail_s, int(out.astype(np.int64).sum()),
            dict(la_kernel.last_run_stats))


def measure(label, la):
    info = {"cfg": label,
            "stages": int(la.stage_count), "n_nodes": len(la.las),
            "top_nodes": int(len(la.las) - la.stage_la_index[-1]),
            "top_macro": int(la.stage_macro_it_count[-1])}
    runs = []
    for r in range(REPS):
        la_s, tail_s, isum, stats = run(la)
        runs.append({"la_s": round(la_s, 2), "tail_s": round(tail_s, 2),
                     "iter_sum": isum, **stats})
    info["runs"] = runs
    print(json.dumps(info), flush=True)


for label, params in (("lb64", None),
                      ("lb1", LAParameters(low_bound=1))):
    t0 = time.perf_counter()
    la = LAReferenceHost.generate_auto(res.orbit_x, res.orbit_y,
                                       HD.from_hp(res.max_radius),
                                       params=params, orbit_e=res.orbit_e)
    print(json.dumps({"cfg": label,
                      "build_s": round(time.perf_counter() - t0, 2)}),
          flush=True)
    measure(label, la)
    # stage-windowed variants: straggler pixels that descended to the
    # fine stages pay ~one packed gather per ~20-iteration step in the
    # lockstep machine; the streaming tail amortizes micro-iterations
    # across ALL pixels per sweep.  Windowing reroutes exactly those
    # pixels to the tail (same mechanism as the View #27 HBM cap).
    if hasattr(la, "stage_window"):
        for k in (1, 2):
            if k < la.stage_count:
                measure(f"{label}-win{k}", la.stage_window(k))
