"""Device-time measurement via ``jax.profiler`` traces.

Wall-clock through the axon tunnel varies 2-4x with machine state
(~30-45 ms dispatch overhead); only profiler device events are a
trustworthy kernel-time signal (reference analogue: GPU-side
``BenchmarkTimer``, ``BenchmarkTimer.h:45``).  This helper runs a
callable under ``jax.profiler.start_trace`` and sums the device-lane
event durations from the dumped Chrome trace.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile
from collections import defaultdict


def device_time_ms(fn, *, trace_dir: str | None = None,
                   keep: bool = False) -> dict:
    """Run ``fn()`` once under a profiler trace; returns
    ``{"total_ms": float, "by_kernel": {name: ms}, "events": int}``
    summing every complete event on the device process lanes.

    ``fn`` must force its outputs (e.g. ``np.asarray(out)``): through
    the tunnel ``block_until_ready`` can return before device work
    completes.  Returns total_ms = 0.0 (with ``error``) when no device
    lane is found — callers should fall back to wall time.
    """
    import jax

    tdir = trace_dir or tempfile.mkdtemp(prefix="fs_trace_")
    try:
        jax.profiler.start_trace(tdir)
        fn()
        jax.profiler.stop_trace()
        files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                          recursive=True)
        if not files:
            return {"total_ms": 0.0, "by_kernel": {}, "events": 0,
                    "error": "no trace file"}
        ev = json.load(gzip.open(max(files, key=os.path.getmtime)))[
            "traceEvents"]
        name_pid = {}
        for e in ev:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                name_pid[e["pid"]] = e["args"].get("name", "")
        dev_pids = [p for p, n in name_pid.items()
                    if "TPU" in n or "GPU" in n or "/device" in n.lower()]
        agg: dict = defaultdict(float)
        total = 0.0
        count = 0
        for e in ev:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                nm = e["name"]
                # skip computation ROLLUPS (module/loop containers):
                # their durations nest the kernel events and would
                # double/triple-count the total
                if nm.startswith(("jit_", "jit(", "while", "body",
                                  "cond", "Thread", "XLA Modules")):
                    continue
                ms = e.get("dur", 0) / 1e3
                agg[nm] += ms
                total += ms
                count += 1
        return {"total_ms": total, "by_kernel": dict(agg),
                "events": count}
    finally:
        if not keep and trace_dir is None:
            shutil.rmtree(tdir, ignore_errors=True)


def top_kernels(prof: dict, k: int = 10) -> list[tuple[str, float]]:
    """The k most expensive kernels of a device_time_ms result."""
    return sorted(prof.get("by_kernel", {}).items(),
                  key=lambda kv: -kv[1])[:k]
