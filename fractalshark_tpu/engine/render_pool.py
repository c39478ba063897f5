"""Async render pipeline: worker pool, supersedable jobs, ordered frame
queue, progressive frames, abort.

Rebuild of ``FractalSharkLib/RenderThreadPool.{h,cpp}``:

* ``RenderWorkItem`` snapshots the view/algorithm state with a
  monotonically increasing generation; newer supersedable jobs cancel
  older ones still in the queue (RenderThreadPool.h:32-95);
* N workers render concurrently (the reference acquires one of 4
  GPURenderer slots per worker, RenderThreadPool.h:144-165 — here each
  worker dispatches into the same jit cache; XLA serializes device use);
* progressive frames: low-resolution passes stream out before the final
  full-resolution frame (the reference reads back partial GPU buffers);
* a completion queue delivers frames in generation order
  (FrameCompletionQueue, RenderThreadPool.h:184-260), dropping frames
  whose generation was superseded;
* EnqueueCommand/EnqueueMutation run state mutations on the pool
  (Fractal.h:185-196);
* abort: a shared event checked between progressive passes (the
  reference's AbortMonitor polls every 16384 iterations).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np


@dataclass(order=True)
class RenderFrame:
    generation: int
    pass_index: int
    final: bool = field(compare=False)
    rgba: np.ndarray = field(compare=False, repr=False)
    wall_s: float = field(compare=False, default=0.0)


@dataclass
class RenderWorkItem:
    generation: int
    supersedable: bool
    snapshot: dict              # view + params captured at enqueue time
    mutation: Callable | None = None


class RenderThreadPool:
    def __init__(self, fractal, num_workers: int = 2,
                 progressive_scales: tuple = (4, 1)):
        self.fractal = fractal
        self.progressive_scales = progressive_scales
        self._queue: "queue.Queue[RenderWorkItem|None]" = queue.Queue()
        self._frames: "queue.PriorityQueue[RenderFrame]" = \
            queue.PriorityQueue()
        self._gen = 0
        self._latest_supersedable = 0
        self._delivered_final = -1
        self._lock = threading.Lock()
        self.abort_flag = threading.Event()
        self._shutdown = False
        self._workers = [
            threading.Thread(target=self._worker_loop, daemon=True,
                             name=f"render-worker-{i}")
            for i in range(num_workers)]
        for w in self._workers:
            w.start()

    # ------------------------------------------------------------- enqueue

    def enqueue_render(self, supersedable: bool = True) -> int:
        with self._lock:
            self._gen += 1
            gen = self._gen
            if supersedable:
                self._latest_supersedable = gen
            snap = {
                "ptz": self.fractal.ptz,
                "algorithm": self.fractal.algorithm_name,
                "num_iterations": self.fractal.num_iterations,
                "antialiasing": self.fractal.antialiasing,
                "width": self.fractal.width,
                "height": self.fractal.height,
            }
        self._queue.put(RenderWorkItem(gen, supersedable, snap))
        return gen

    def enqueue_mutation(self, fn: Callable) -> int:
        """Run a state mutation on the pool (EnqueueMutation,
        Fractal.h:185-196), then trigger a render."""
        with self._lock:
            self._gen += 1
            gen = self._gen
            self._latest_supersedable = gen
        self._queue.put(RenderWorkItem(gen, True, {}, mutation=fn))
        return gen

    # -------------------------------------------------------------- worker

    def _stale(self, item: RenderWorkItem) -> bool:
        return (item.supersedable and
                item.generation < self._latest_supersedable)

    def _worker_loop(self) -> None:
        from fractalshark_tpu.engine.fractal import Fractal

        while True:
            item = self._queue.get()
            if item is None:
                return
            if self._stale(item):
                continue
            if item.mutation is not None:
                item.mutation(self.fractal)
                snap = {
                    "ptz": self.fractal.ptz,
                    "algorithm": self.fractal.algorithm_name,
                    "num_iterations": self.fractal.num_iterations,
                    "antialiasing": self.fractal.antialiasing,
                    "width": self.fractal.width,
                    "height": self.fractal.height,
                }
                item = RenderWorkItem(item.generation, item.supersedable,
                                      snap)
            snap = item.snapshot
            t0 = time.perf_counter()
            scales = self.progressive_scales
            for pi, scale in enumerate(scales):
                if self.abort_flag.is_set() or self._stale(item):
                    break
                w = max(8, snap["width"] // scale)
                h = max(8, snap["height"] // scale)
                frac = Fractal(width=w, height=h, view=snap["ptz"],
                               algorithm=snap["algorithm"],
                               num_iterations=snap["num_iterations"],
                               antialiasing=1, backend=self.fractal.backend)
                frac._orbit_cache = self.fractal._orbit_cache
                rgba = np.asarray(frac.render())
                final = pi == len(scales) - 1
                self._frames.put(RenderFrame(
                    generation=item.generation, pass_index=pi,
                    final=final, rgba=rgba,
                    wall_s=time.perf_counter() - t0))

    # ------------------------------------------------------------ consumer

    def next_frame(self, timeout: float | None = 5.0) -> RenderFrame | None:
        """Pop the next frame in generation order, skipping superseded
        generations' non-final frames."""
        deadline = time.monotonic() + (timeout or 0)
        while True:
            remaining = None if timeout is None else \
                max(0.0, deadline - time.monotonic())
            try:
                frame = self._frames.get(timeout=remaining)
            except queue.Empty:
                return None
            if (frame.generation < self._latest_supersedable and
                    not frame.final):
                continue  # superseded progressive frame: drop
            if frame.final and frame.generation <= self._delivered_final:
                continue  # stale duplicate
            if frame.final:
                self._delivered_final = frame.generation
            return frame

    def wait_idle(self, timeout: float = 60.0) -> bool:
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if self._queue.empty():
                return True
            time.sleep(0.01)
        return False

    def shutdown(self) -> None:
        self._shutdown = True
        for _ in self._workers:
            self._queue.put(None)
        for w in self._workers:
            w.join(timeout=10)
