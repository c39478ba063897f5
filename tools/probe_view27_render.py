"""Bounded-budget render probe against the (possibly still growing)
compressed View #27 orbit.

Loads the anchor stores + session state written by tools/run_view27.py
and renders a small frame with a bounded iteration budget through the
RC streaming kernel — proving the full endurance pipeline (multi-
billion-entry virtual orbit -> on-device decompression -> render)
end to end, and measuring px-it/s for an honest projection of the full
View #27 render cost.  The uncompressed orbit never exists anywhere.

Run from the repo root:
    python -c "exec(open('tools/probe_view27_render.py').read())"
Optional env: V27_SIZE (default 64), V27_BUDGET (default 10_000_000).
"""

import json
import os
import time

import numpy as np

CK = "/tmp/view27_orbit"
SIZE = int(os.environ.get("V27_SIZE", "64"))
BUDGET = int(os.environ.get("V27_BUDGET", "10000000"))

from fractalshark_tpu.core.views import get_view_preset  # noqa: E402
from fractalshark_tpu.engine.perturbation_results import (  # noqa: E402
    CompressedOrbit)
from fractalshark_tpu.ops.perturb_stream import (  # noqa: E402
    perturb_render_stream_rc)
from fractalshark_tpu.utils.growable import GrowableArray  # noqa: E402

blob = open(CK + ".state", "rb").read()
n_emitted = int.from_bytes(blob[:8], "little")
head = np.frombuffer(blob[8:8 + 26 * 8], np.uint64)
assert head[0] == 0x46534F5242434B31, "bad orbit checkpoint magic"
iters = int(head[2])
total_count = int(head[3])

gx = GrowableArray.open_existing(CK + ".ax")
gy = GrowableArray.open_existing(CK + ".ay")
gi = GrowableArray.open_existing(CK + ".ai")
n = min(n_emitted, len(gx), len(gy), len(gi))
# A budget-B render touches orbit positions <= B only (per-pixel ref
# cursors advance by one per iteration and rebase back to 0), so slice
# the anchor prefix covering [0, B] instead of shipping all ~362M
# anchors (~9 GB) to the device.  total_count is clamped to the
# covered span; no pixel can reach it.
ai_all = gi.view()[:n]
n_pref = int(np.searchsorted(ai_all, BUDGET + 2)) + 1
n_pref = min(n_pref + 1, n)
ax = np.asarray(gx.view()[:n_pref], np.float64).copy()
ay = np.asarray(gy.view()[:n_pref], np.float64).copy()
ai = np.asarray(ai_all[:n_pref], np.int64).copy()
covered = int(ai[-1]) if n_pref < n else int(head[3])

v = get_view_preset(27)
ptz = v.ptz.square_aspect_ratio(SIZE, SIZE)
co = CompressedOrbit(
    anchors_x=ax, anchors_y=ay, anchor_index=ai,
    total_count=covered, cx_low=float(ptz.pt_x),
    cy_low=float(ptz.pt_y),
    error_exp=int(v.compression_error_exp_low or 20))

print(json.dumps({
    "orbit_iters": iters, "total_count": total_count,
    "n_anchors": n, "ratio": round(total_count / max(1, n), 1),
    "prefix_anchors": n_pref, "prefix_covered": covered,
    "budget": BUDGET, "size": SIZE}))

assert BUDGET + 1 < covered, "budget must stay inside the anchor prefix"
t0 = time.perf_counter()
out = perturb_render_stream_rc(co, ptz.pt_x, ptz.pt_y, ptz,
                               SIZE, SIZE, BUDGET)
o = np.asarray(out)
dt = time.perf_counter() - t0
pxit = int(o.astype(np.int64).sum())
res = {
    "wall_s": round(dt, 1),
    "iter_min": int(o.min()), "iter_max": int(o.max()),
    "iter_sum": pxit,
    "gpxit_s": round(pxit / dt / 1e9, 3),
}
# honest projection of the RAW perturbation tail (no LA): an interior
# render runs ~2x period per pixel (View #30's measured band was ~2x
# period).  The number is astronomic by construction — it is WHY the
# reference (and we) treat LA iteration-skipping as mandatory at this
# class; the probe's claim is the working pipeline + px-it/s, not a
# render plan.
proj_pxit = 768 * 768 * 2.0 * 28e9
res["projected_raw_tail_768sq_h"] = round(
    proj_pxit / max(pxit / dt, 1) / 3600.0, 1)
print(json.dumps(res))
