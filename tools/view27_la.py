"""Build the FULL View #27 LA table from the compressed orbit store.

Runs after tools/run_view27.py completes (phase == done in
/tmp/view27_progress.json): opens the anchor store, then builds the LA
table THROUGH the native streaming reconstructing accessor
(fs_la_generate_rc) — the ~453 GB uncompressed orbit never exists.
The reference's hardest-render class needs exactly this step for
full-frame LAv2 (Notes/FractalShark-06-RefOrbit.tex:740-747).

Env overrides (all of them should point under a persistent dir, e.g.
<repo>/.v27cache/ — /tmp does not survive machine re-provisioning):
  V27_CK      orbit checkpoint store prefix (default /tmp/view27_orbit)
  V27_OUT     progress json INPUT from run_view27.py
              (default /tmp/view27_progress.json)
  V27_LA_OUT  this tool's status-json output (default /tmp/view27_la.json)
  V27_LA_DIR  the LA table output DIRECTORY: node arrays marshalled
              straight into la_<key>.npy memmaps + la_meta.npz
              (default /tmp/view27_la_dir).  The full table is ~51 GB /
              426.6M nodes; the directory format writes it exactly once
              and the render memmaps it back — an in-RAM marshal + npz
              copy OOM-killed a finished build on a 125 GB box.
  FS_LA_RESERVE is set to the known node count (+slack) below so the
  native node vector never pays a growth spike.
"""

import json
import os
import time

import numpy as np

OUT = os.environ.get("V27_LA_OUT", "/tmp/view27_la.json")
CK = os.environ.get("V27_CK", "/tmp/view27_orbit")
PROG = os.environ.get("V27_OUT", "/tmp/view27_progress.json")
LA_DIR = os.environ.get("V27_LA_DIR", "/tmp/view27_la_dir")
# counted by the 2026-08-20 full pass (la_progress.txt: 426,635,659
# nodes); the build is deterministic, slack covers only param drift
os.environ.setdefault("FS_LA_RESERVE", "440000000")

from fractalshark_tpu.core.hdr_host import HD                  # noqa: E402
from fractalshark_tpu.core.precision import precision_from_view  # noqa: E402
from fractalshark_tpu.core.views import get_view_preset        # noqa: E402
from fractalshark_tpu.engine import native_la as NL            # noqa: E402
from fractalshark_tpu.engine import native_orbit as NO         # noqa: E402

state = {"phase": "init", "t0": time.time()}


def save():
    state["elapsed_s"] = round(time.time() - state["t0"], 1)
    with open(OUT, "w") as f:
        json.dump(state, f)


with open(PROG) as f:
    prog = json.load(f)
assert prog.get("phase") == "done" and prog.get("period", 0) > 0, prog

v = get_view_preset(27)
ptz = v.ptz.square_aspect_ratio(128, 128)
prec = precision_from_view(ptz) + 32
cx = ptz.pt_x.with_precision(prec)
cy = ptz.pt_y.with_precision(prec)
sess = NO.NativeOrbitSession(
    cx, cy, ptz.radius, precision_bits=prec,
    compression_error_exp=int(v.compression_error_exp_low or 20),
    checkpoint_path=CK)
assert sess._resumed, "orbit store missing"
comp = sess.compressed()
state.update(phase="la_build", n_anchors=len(comp.anchors_x),
             total_count=int(comp.total_count),
             ratio=round(comp.compression_ratio(), 1),
             had_dip=bool(prog.get("had_dip", False)))
save()

rad = HD.from_hp(ptz.radius)
# deep-budget params: divisor 8 bounds the stage-0 table for the
# compressed orbit (reference LAReference.cpp:12-19), low_bound=1
# composes down to the terminal whole-orbit node so each of the
# ~35,700 per-pixel orbit wraps of a 10^15 budget costs ONE macro step
from fractalshark_tpu.engine.la_reference import LAParameters  # noqa: E402
params = LAParameters(period_divisor=8, low_bound=1)
# two-call protocol: builds first, sizes buffers to the exact node
# count — no cap guessing.  FS_LA_PROGRESS (set by the launcher) gives
# a live node-density stream for this hour-scale 28.3e9-entry pass.
# Marshalling lands directly in V27_LA_DIR's disk-backed memmaps.
os.makedirs(LA_DIR, exist_ok=True)
t0 = time.perf_counter()
la, la_info = NL.generate_native_rc_streamed(comp, rad, params=params,
                                             memmap_dir=LA_DIR)
state["build_s"] = round(time.perf_counter() - t0, 1)
state["la_info"] = la_info
save()

if la is None:
    state["phase"] = "failed"
    save()
    raise SystemExit(json.dumps(state))

state.update(phase="save", la_valid=bool(la.is_valid),
             n_nodes=len(la.las), stages=int(la.stage_count),
             stage_la_index=[int(x) for x in la.stage_la_index],
             stage_macro=[int(x) for x in la.stage_macro_it_count],
             use_at=bool(la.use_at))
save()
la.save_meta_npz(LA_DIR)
state["phase"] = "done"
save()
print(json.dumps(state))
