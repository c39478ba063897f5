"""Pre-compilation ("prewarm") of the deep two-phase render.

A COLD process pays 17-37 s for the first deep-view render even with a
persistent compilation cache: per-process tracing, remote compile-cache
round trips, and uploads (measured on View #30 512²; the warm frame is
~1.5 s).  Meanwhile the reference-orbit phase runs ~70 s of
device-bound work with an idle host.  This module overlaps the two:

* every render executable's identity is made independent of the live
  orbit/LA sizes by SHAPE BUCKETS — the node/orbit/anchor tables are
  padded to fixed bucket lengths and the live lengths ride as traced
  scalars (``ops/la_kernel._lav2_impl``, ``ops/perturb_stream``);
* a background thread compiles every executable and eager glue op the
  real render will need — with dummy tables of the bucket shapes,
  before the orbit (and hence the real shapes) exists.

The reference has no analogue because its CUDA kernels are AOT-compiled
into the binary (``FractalSharkGpuLib``); prewarm is the JIT world's
way of shipping "already compiled" kernels for the interactive path.

Dummy-data design: phase-1 runs with ``stage_count = 0`` (every pixel
drops straight to the tail) against an orbit of huge values, so all
pixels escape on the first body step; phase-2 starts with every pixel
``done``.  Executables compile fully either way — only the traced data
differs — so each warm call costs one compile + one ~ms launch.
"""

from __future__ import annotations

import threading
import time

import numpy as np

# Default deep-render buckets: cover period-~1M orbits / ~0.5M-node LA
# tables (View #30: 669,773 / 333,763 / 9 stages).  Views beyond a
# bucket fall back to exact shapes (a cold compile, as before).
ORBIT_BUCKET = 1 << 20
NODES_BUCKET = 1 << 19
ANCHORS_BUCKET = 1 << 20
STAGE_CAP = 16


def _la_node_count(la) -> int:
    las = getattr(la, "las", None)
    if las is not None:
        return len(las)
    a = getattr(la, "_arrays", None)
    if a is not None:
        return int(a["ref_e"].shape[0])
    return int(la.device_arrays(np.float32)["ref_e"].shape[0])


def deep_buckets(results, la) -> dict:
    """Bucket pads for ``two_phase_render`` — {} when the live sizes
    exceed the default buckets (exact-shape fallback)."""
    count = results.count_orbit_entries()
    if (count <= ORBIT_BUCKET and count <= ANCHORS_BUCKET and
            _la_node_count(la) <= NODES_BUCKET and
            int(la.stage_count) <= STAGE_CAP):
        return dict(pad_orbit_to=ORBIT_BUCKET, pad_nodes_to=NODES_BUCKET,
                    pad_stages_to=STAGE_CAP,
                    pad_anchors_to=ANCHORS_BUCKET)
    return {}


def prewarm_two_phase(ptz, width: int, height: int, max_iter: int,
                      tile_h: int = 64, log=None) -> dict:
    """Compile every executable + glue op of the bucketed two-phase
    render for (width, height, max_iter): phase-1 LAv2 machine at all
    chunk-ladder rungs, the per-pixel handoff glue, and the RC
    streaming tail at all budget-ladder rungs.  Returns timing info.

    Safe to run on a background thread while the reference orbit
    computes — dummy launches are ~ms of device time each."""
    import time

    import jax.numpy as jnp

    from fractalshark_tpu.core.highprecision import HighPrecision
    from fractalshark_tpu.engine.perturbation_results import (
        CompressedOrbit, PerturbationResults)
    from fractalshark_tpu.engine.renderers import two_phase_render
    from fractalshark_tpu.ops import la_kernel as lk
    from fractalshark_tpu.ops import perturb_stream as ps
    from fractalshark_tpu.ops import hdrfloat as hdr

    t0 = time.perf_counter()
    info = {}

    def say(msg):
        if log is not None:
            log(f"prewarm: {msg} ({time.perf_counter() - t0:.1f}s)")

    # ---- dummy orbit/LA: every pixel escapes on its first tail step --
    n_dummy = 8
    big = np.full(n_dummy, 1.0e30, np.float64)
    res = PerturbationResults(
        center_x=HighPrecision(ptz.pt_x), center_y=HighPrecision(ptz.pt_y),
        orbit_x=big.copy(), orbit_y=big.copy(), max_radius=ptz.radius,
        period=n_dummy, escaped_at=0, max_iterations=max_iter,
        precision_bits=64)
    la = _DummyLA()
    comp = CompressedOrbit.identity(res)

    pads = dict(pad_orbit_to=ORBIT_BUCKET, pad_nodes_to=NODES_BUCKET,
                pad_stages_to=STAGE_CAP, pad_anchors_to=ANCHORS_BUCKET)

    # ---- full dummy render: rung-0 executables + ALL eager glue ops --
    out = two_phase_render(res, la, ptz, width, height, max_iter,
                           comp=comp, **pads)
    assert out is not None
    np.asarray(out)
    say("two-phase rung 0 + glue")

    # ---- phase-1 ladder rungs 1..: resume-state executables ----------
    # (the real relaunch loop escalates through these after measuring a
    # fast dispatch; dummy data finishes in one body step per call)
    cache = la._packed_cache
    key = (np.dtype(np.float32).name, ORBIT_BUCKET, NODES_BUCKET,
           STAGE_CAP)
    (packed_dev, orbit_dev, thrcm_dev, thrce_dev, sli_dev,
     smic_dev) = cache[key]
    from fractalshark_tpu.ops.perturb import _dc_grids_hdr, delta_params
    dx, dy, cxo, cyo = delta_params(ptz, res.center_x, res.center_y,
                                    width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, np.float32)
    args = (orbit_dev, dc.re, dc.im, dc.e, packed_dev, None,
            thrcm_dev, thrce_dev, sli_dev, smic_dev, None,
            jnp.int32(res.max_ref_iteration()), jnp.int32(0),
            jnp.int32(0))
    ladder1 = lk.chunk_ladder(lk.default_chunk_steps(width, height))
    state, _, _ = lk._lav2_impl(*args, max_iter=int(max_iter),
                                la_only=True, chunk_steps=ladder1[0])
    for rung in ladder1[1:]:
        state, _, _ = lk._lav2_impl(*args, max_iter=int(max_iter),
                                    la_only=True, chunk_steps=rung,
                                    resume_state=state)
    say(f"phase-1 rungs {ladder1}")

    # ---- phase-2 ladder rungs 1..: handcrafted resume states ---------
    grid = (-(-height // tile_h), -(-width // ps.LANE))
    ph = grid[0] * tile_h
    pw = grid[1] * ps.LANE
    n_tiles = grid[0] * grid[1]
    awh, awl, xh, xl, yh, yl, mpad = ps._prep_anchors(
        comp, ANCHORS_BUCKET)
    scal = jnp.asarray([1, 1, mpad // ps.ANC_BLK, 0], jnp.int32)
    cvals = jnp.zeros(4, jnp.float32)
    zero_i = jnp.zeros((ph, pw), jnp.int32)
    pstate = (jnp.zeros((ph, pw), jnp.float32),
              jnp.zeros((ph, pw), jnp.float32),
              jnp.full((ph, pw), int(hdr.MIN_BIG_EXPONENT), jnp.int32),
              zero_i, zero_i,
              jnp.ones((ph, pw), jnp.int32),     # done: compile only
              zero_i, zero_i, zero_i, zero_i,
              jnp.zeros((n_tiles * 8, 128), jnp.int32),
              jnp.zeros((n_tiles * 8, 128), jnp.float32))
    dcr = jnp.zeros((ph, pw), jnp.float32)
    dce = jnp.full((ph, pw), int(hdr.MIN_BIG_EXPONENT), jnp.int32)
    ladder2 = ps._budget_ladder(ps.default_launch_windows(n_tiles))
    import jax
    with jax.enable_x64(False):
        for rung in ladder2[1:]:
            pstate = ps._rc_launch(
                scal, cvals, jnp.asarray(awh), jnp.asarray(awl),
                jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh),
                jnp.asarray(yl), dcr, dcr, dce, pstate,
                tile_h, height, width, rung, False)
    np.asarray(pstate[10])
    say(f"phase-2 rungs {ladder2}")

    info["prewarm_s"] = round(time.perf_counter() - t0, 1)
    return info


class _DummyLA:
    """Minimal LA-table stand-in for prewarm: 0 live stages (every
    pixel drops straight to the perturbation tail), bucket-compatible
    array shapes after padding."""

    use_at = False
    at = None
    is_valid = True
    stage_count = 0

    def device_arrays(self, dtype=np.float32) -> dict:
        n = 4
        return {
            "ref_m": np.zeros((n, 2), dtype), "ref_e": np.zeros(n, np.int32),
            "zc_m": np.zeros((n, 2), dtype), "zc_e": np.zeros(n, np.int32),
            "cc_m": np.zeros((n, 2), dtype), "cc_e": np.zeros(n, np.int32),
            "thr_m": np.zeros(n, dtype), "thr_e": np.zeros(n, np.int32),
            "thrc_m": np.zeros(n, dtype), "thrc_e": np.zeros(n, np.int32),
            "step_length": np.zeros(n, np.int64),
            "next_stage_la_index": np.zeros(n, np.int32),
            "stage_la_index": np.zeros(1, np.int32),
            "stage_macro_it_count": np.zeros(1, np.int32),
            "stage_count": 0,
        }


_PREWARMED: set = set()
_PREWARM_LOCK = threading.Lock()
_LIVE_THREADS: list = []


def join_all(timeout: float | None = None) -> bool:
    """Join in-flight prewarm threads (True = all finished).  Call
    before process exit: a daemon thread killed mid-remote-compile
    aborts the interpreter from inside the runtime's C++ ("FATAL:
    exception not rethrown") — observed when a render used a different
    executable bucket than the one prewarm was still compiling."""
    deadline = None if timeout is None else time.monotonic() + timeout
    with _PREWARM_LOCK:
        threads = [t for t in _LIVE_THREADS if t.is_alive()]
        _LIVE_THREADS[:] = threads
    for t in threads:
        t.join(None if deadline is None
               else max(0.0, deadline - time.monotonic()))
    return not any(t.is_alive() for t in threads)


def prewarm_once(ptz, width: int, height: int, max_iter: int,
                 log=None) -> threading.Thread | None:
    """Idempotent background prewarm for a render geometry: the engine
    calls this right before computing a reference orbit on TPU
    (engine/renderers.calc_perturbed), so the orbit's device time hides
    the render compilation for interactive/CLI sessions exactly as the
    record runner does.  Returns the thread on first call per
    (width, height, max_iter) in this process, None after."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    key = (int(width), int(height), int(max_iter))
    with _PREWARM_LOCK:
        if key in _PREWARMED:
            return None
        _PREWARMED.add(key)
    return start_prewarm_thread(ptz, width, height, max_iter, log=log)


def start_prewarm_thread(ptz, width: int, height: int, max_iter: int,
                         log=None) -> threading.Thread:
    """Fire-and-forget prewarm on a daemon thread (call before starting
    the reference orbit; join before the render if you want a hard
    guarantee, otherwise in-flight compiles finish under jit's lock)."""
    def run():
        try:
            prewarm_two_phase(ptz, width, height, max_iter, log=log)
        except Exception as e:  # noqa: BLE001 — prewarm must never kill a render
            if log is not None:
                log(f"prewarm: FAILED {e!r}")

    t = threading.Thread(target=run, name="fs-prewarm", daemon=True)
    with _PREWARM_LOCK:
        _LIVE_THREADS.append(t)
    t.start()
    return t
