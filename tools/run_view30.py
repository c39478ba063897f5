"""One-shot View #30 end-to-end attempt on a single chip.

Computes the View #30 reference orbit on device (16384 limbs, NTT
pipeline, periodicity ON), then builds the LA table and renders the
view through the two-phase LAv2 pipeline.  The render's executables are
PRE-COMPILED on a background thread while the orbit computes
(engine/prewarm.py — shape-bucketed kernels), so the render phase runs
warm in a cold process.

Writes progress + results to /tmp/view30_progress.json so it can run
detached.

Run from the repo root:
    python -c "exec(open('tools/run_view30.py').read())"
"""

import json
import time

import numpy as np

OUT = "/tmp/view30_progress.json"
state = {"phase": "init", "t0": time.time()}


def save():
    state["elapsed_s"] = round(time.time() - state["t0"], 1)
    with open(OUT, "w") as f:
        json.dump(state, f)


def log(msg):
    state.setdefault("log", []).append(
        f"{time.time() - state['t0']:.1f}s {msg}")
    save()


save()

from fractalshark_tpu.core.views import get_view_preset  # noqa: E402
from fractalshark_tpu.engine.prewarm import (  # noqa: E402
    deep_buckets, start_prewarm_thread)
from fractalshark_tpu.ops.bignum.orbit import (  # noqa: E402
    compute_reference_orbit_device)

v = get_view_preset(30)
size = 512
ptz = v.ptz.square_aspect_ratio(size, size)
state["phase"] = "orbit"
state["zoom"] = str(ptz.zoom_factor)[:24]
save()

# render pre-compilation overlapped with the orbit phase — but only
# AFTER the orbit's own (GIL-heavy) trace + executable load completes:
# the first progress callback fires once the first chunk is processed,
# leaving ~55 s of orbit for the ~24 s prewarm
pre = None


def _maybe_start_prewarm(done_it, max_it, elapsed):
    global pre
    if pre is None:
        pre = start_prewarm_thread(ptz, size, size, v.num_iterations,
                                   log=log)


MAX_IT = 4_000_000
t0 = time.perf_counter()
res = compute_reference_orbit_device(
    ptz.pt_x, ptz.pt_y, MAX_IT, ptz.radius, limbs32=16384,
    periodicity=True, chunk_steps=4096,
    progress_cb=_maybe_start_prewarm)
orbit_s = time.perf_counter() - t0
state.update(phase="orbit_done", orbit_s=round(orbit_s, 1),
             orbit_len=res.count_orbit_entries(), period=res.period,
             escaped_at=res.escaped_at,
             it_per_s=int(res.count_orbit_entries() / orbit_s))
save()
np.save("/tmp/view30_orbit_x.npy", res.orbit_x)
np.save("/tmp/view30_orbit_y.npy", res.orbit_y)
if res.orbit_e is not None:
    np.save("/tmp/view30_orbit_e.npy", res.orbit_e)
state["use_hdr_orbit"] = bool(res.orbit_e is not None)
save()

if res.period > 0 or res.count_orbit_entries() > 1000:
    from fractalshark_tpu.core.hdr_host import HD
    from fractalshark_tpu.engine.la_reference import LAReferenceHost
    state["phase"] = "la_build"
    save()
    t0 = time.perf_counter()
    la = LAReferenceHost.generate_auto(res.orbit_x, res.orbit_y,
                                       HD.from_hp(res.max_radius),
                                       orbit_e=res.orbit_e)
    state.update(la_build_s=round(time.perf_counter() - t0, 1),
                 la_valid=bool(la.is_valid),
                 la_stages=int(la.stage_count))
    save()

    if la.is_valid:
        from fractalshark_tpu.engine.renderers import two_phase_render
        state["phase"] = "render"
        save()
        t0 = time.perf_counter()
        if pre is None:
            pre = start_prewarm_thread(ptz, size, size,
                                       v.num_iterations, log=log)
        pre.join(timeout=120)
        state["prewarm_join_s"] = round(time.perf_counter() - t0, 1)
        save()
        n = v.num_iterations
        pads = deep_buckets(res, la)
        state["buckets"] = bool(pads)
        out = two_phase_render(res, la, ptz, size, size, n, **pads)
        o = np.asarray(out)
        render_s = time.perf_counter() - t0
        state.update(phase="done", render_s=round(render_s, 1),
                     render_size=size,
                     iter_min=int(o.min()), iter_max=int(o.max()),
                     iter_sum=int(o.astype(np.int64).sum()),
                     total_s=round(time.time() - state["t0"], 1))
        save()
        np.save("/tmp/view30_iters.npy", o)
    else:
        state["phase"] = "done_no_la"
        save()
else:
    state["phase"] = "done_no_orbit"
    save()
print(json.dumps(state))
