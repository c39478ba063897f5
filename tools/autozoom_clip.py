"""Scripted autozoom ANIMATION clip — the acceptance artifact for the
feature-zoom pipeline (reference AutoZoomer feature-zoom animation,
FractalSharkLib/AutoZoomer.h:7-31: precomputed ×1.1 steps enqueued as
non-supersedable paced jobs through the render thread pool).

Zooms from View #0 onto View #5's center, presenting frames at a fixed
cadence through RenderThreadPool + PacedPresenter; every presented
frame is written as a PNG and the per-frame present timestamps land in
the clip manifest, so the artifact shows the animation actually MOVED
at the requested frame pacing (not just that N stills exist).

Usage: python tools/autozoom_clip.py [n_frames] [size] [fps] [outdir]
Defaults: 24 frames, 256 px, 10 fps cadence, <cwd>/.clips/autozoom.
Writes <outdir>/frame_NNN.png + <outdir>/clip.json.
"""

import json
import os
import sys
import time

import numpy as np

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 24
size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
fps = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
outdir = sys.argv[4] if len(sys.argv) > 4 else \
    os.path.join(os.getcwd(), ".clips", "autozoom")
os.makedirs(outdir, exist_ok=True)

from fractalshark_tpu.core.views import get_view_preset        # noqa: E402
from fractalshark_tpu.engine.autozoom import AutoZoomer        # noqa: E402
from fractalshark_tpu.engine.fractal import Fractal            # noqa: E402
from fractalshark_tpu.engine.render_pool import RenderThreadPool  # noqa: E402
from fractalshark_tpu.io.png import write_png                  # noqa: E402

f = Fractal(width=size, height=size, view=0, num_iterations=2048)
pool = RenderThreadPool(f, num_workers=2)
az = AutoZoomer(f)

target = get_view_preset(5).ptz
steps = az.setup_feature_zoom(target_ptz=target, target_iters=4096,
                              max_steps=n_frames)

t_start = time.perf_counter()
frames_meta = []


def on_frame(frame):
    i = len(frames_meta)
    path = os.path.join(outdir, f"frame_{i:03d}.png")
    write_png(path, frame.rgba)
    frames_meta.append({
        "i": i, "generation": frame.generation,
        "present_t": round(time.perf_counter() - t_start, 4),
        "render_wall_s": round(frame.wall_s, 4),
    })


res = az.run_feature_zoom_pipeline(pool, steps, interval_s=1.0 / fps,
                                   on_frame=on_frame, timeout_s=1800.0)
wall = time.perf_counter() - t_start
pool.shutdown()

gaps = [b["present_t"] - a["present_t"]
        for a, b in zip(frames_meta, frames_meta[1:])]
manifest = {
    "n_steps": len(steps),
    "presented": res["presented"],
    "aborted": res["aborted"],
    "size": size, "cadence_fps": fps,
    "wall_s": round(wall, 2),
    "achieved_fps": round((res["presented"] - 1) / max(1e-9, (
        frames_meta[-1]["present_t"] - frames_meta[0]["present_t"])), 2)
    if res["presented"] > 1 else 0.0,
    "min_gap_s": round(min(gaps), 4) if gaps else None,
    "max_gap_s": round(max(gaps), 4) if gaps else None,
    "zoom_start": str(steps[0].ptz.zoom_factor)[:20],
    "zoom_end": str(steps[-1].ptz.zoom_factor)[:20],
    "frames": frames_meta,
}
with open(os.path.join(outdir, "clip.json"), "w") as fp:
    json.dump(manifest, fp, indent=1)
print(json.dumps({k: v for k, v in manifest.items() if k != "frames"}))
