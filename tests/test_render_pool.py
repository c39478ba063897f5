"""Async render pipeline tests (RenderThreadPool semantics)."""

import time

import numpy as np

from fractalshark_tpu.engine.fractal import Fractal
from fractalshark_tpu.engine.render_pool import RenderThreadPool


def make_pool(**kw):
    f = Fractal(width=32, height=32, view=0, algorithm="Cpu64",
                num_iterations=64, backend="cpu")
    return f, RenderThreadPool(f, **kw)


def test_progressive_frames_arrive_in_order():
    f, pool = make_pool(num_workers=1, progressive_scales=(4, 1))
    try:
        gen = pool.enqueue_render()
        first = pool.next_frame(timeout=60)
        assert first is not None and first.generation == gen
        assert not first.final
        assert first.rgba.shape == (8, 8, 4)
        final = pool.next_frame(timeout=60)
        assert final is not None and final.final
        assert final.rgba.shape == (32, 32, 4)
    finally:
        pool.shutdown()


def test_supersede_drops_stale():
    f, pool = make_pool(num_workers=1, progressive_scales=(1,))
    try:
        pool.enqueue_render()          # gen 1 (may or may not start)
        pool.enqueue_render()          # gen 2
        g3 = pool.enqueue_render()     # gen 3 supersedes 1 & 2
        pool.wait_idle(timeout=60)
        finals = []
        while True:
            fr = pool.next_frame(timeout=2)
            if fr is None:
                break
            if fr.final:
                finals.append(fr.generation)
        # the newest generation must be delivered; queued stale jobs
        # were skipped (an already-running older one may also finish)
        assert g3 in finals
        assert all(g <= g3 for g in finals)
    finally:
        pool.shutdown()


def test_mutation_runs_on_pool():
    f, pool = make_pool(num_workers=1, progressive_scales=(1,))
    try:
        def mutate(fr):
            fr.num_iterations = 99

        pool.enqueue_mutation(mutate)
        frame = pool.next_frame(timeout=60)
        assert frame is not None
        assert f.num_iterations == 99
    finally:
        pool.shutdown()


def test_abort_flag_stops_work():
    f, pool = make_pool(num_workers=1, progressive_scales=(4, 1))
    try:
        pool.abort_flag.set()
        pool.enqueue_render()
        frame = pool.next_frame(timeout=3)
        assert frame is None  # aborted before producing frames
    finally:
        pool.shutdown()
