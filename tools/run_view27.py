"""View #27 endurance run: the reference's hardest known render class
(period ~28e9, 10^15-iteration budgets, requires reference-orbit
compression — Notes/FractalShark-06-RefOrbit.tex:740-747).

Computes the View #27 reference orbit through the chunked native
session with on-the-fly SimpleCompression and periodic checkpoints, so
the multi-hour run survives interruption and resumes exactly.  Progress
lands in /tmp/view27_progress.json; the orbit store is
/tmp/view27_orbit.{state,ax,ay,ae,ai}.

Run (resumable — just run it again after an interruption):
    nice -n 19 python tools/run_view27.py
"""

import json
import os
import time

# /tmp does not survive machine re-provisioning; point V27_CK at a
# persistent location (e.g. <repo>/.v27cache/view27_orbit) to let the
# multi-hour run resume across sessions
OUT = os.environ.get("V27_OUT", "/tmp/view27_progress.json")
CK = os.environ.get("V27_CK", "/tmp/view27_orbit")
MAX_IT = 40_000_000_000   # guard; period detection stops at ~28e9

from fractalshark_tpu.core.precision import precision_from_view  # noqa: E402
from fractalshark_tpu.core.views import get_view_preset  # noqa: E402
from fractalshark_tpu.engine import native_orbit as NO  # noqa: E402

v = get_view_preset(27)
ptz = v.ptz.square_aspect_ratio(128, 128)
prec = precision_from_view(ptz) + 32
cx = ptz.pt_x.with_precision(prec)
cy = ptz.pt_y.with_precision(prec)

sess = NO.NativeOrbitSession(
    cx, cy, ptz.radius, precision_bits=prec,
    compression_error_exp=int(v.compression_error_exp_low or 20),
    checkpoint_path=CK)

state = {"phase": "orbit", "resumed": sess._resumed,
         "start_iters": sess.iters, "prec_bits": prec,
         "nlimbs": sess.nlimbs, "t0": time.time(),
         "pid": os.getpid()}


def progress(it, max_it, elapsed):
    state.update(iters=it, elapsed_s=round(elapsed, 1),
                 n_anchors=sess.n_emitted,
                 it_per_s=int((it - state["start_iters"]) /
                              max(elapsed, 1e-9)),
                 ratio=round(it / max(1, sess.n_emitted), 1))
    with open(OUT, "w") as f:
        json.dump(state, f)


status = sess.run(MAX_IT, chunk=1 << 22, checkpoint_every_s=300,
                  progress_cb=progress)
state.update(phase="done", status=status, iters=sess.iters,
             period=sess.total_count if status == 1 else 0,
             escaped_at=sess.total_count if status == 2 else 0,
             n_anchors=sess.n_emitted, had_dip=sess.had_dip,
             total_s=round(time.time() - state["t0"], 1))
with open(OUT, "w") as f:
    json.dump(state, f)
print(json.dumps(state))
