"""Mesh-sharded PRODUCTION streaming render.

`parallel/render.py` shards the XLA gather-based kernels (GSPMD can
partition plain array programs on its own).  The flagship deep-render
path, however, is the Pallas lockstep-sweep streaming kernel
(`ops/perturb_stream.py`) — a `pallas_call` is a per-device program
GSPMD cannot split, so the data-parallel axis must be explicit: this
module wraps ONE bounded launch in `shard_map`, splitting the pixel
grid by tile rows across the mesh while the orbit (HBM stream source),
`z0`, and sweep scalars stay replicated.  That is exactly the
reference's pixel-grid data parallelism (CUDA grid over 16×8 blocks,
``GPU_Render.h:116-120``) lifted to the mesh: every device runs the
real production kernel on its row slab.

The suspend/resume launch loop stays on the host (as in the
single-chip wrapper): per-launch, each device reports its slab's
all-done flag; the loop ends when every slab is done.  State arrays
stay sharded device-side between launches — only the tiny per-tile
flag blocks are read back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.ops import hdrfloat as hdr
from fractalshark_tpu.ops import perturb_stream as PS
from fractalshark_tpu.ops.perturb import _dc_grids_hdr, delta_params


@functools.partial(jax.jit, static_argnames=(
    "mesh", "axis", "tile_h", "height_l", "width", "budget",
    "interpret"))
def _launch_sharded(scal, z0, oxh, oyh, dcr, dci, dce, state, *,
                    mesh: Mesh, axis: str, tile_h: int, height_l: int,
                    width: int, budget: int, interpret: bool):
    """One bounded launch, row-slab-sharded over `mesh`: per device the
    body is the production `perturb_stream._launch` on a
    `height_l`-row slab."""
    rep = P()
    rows = P(axis)

    def body(scal, z0, oxh, oyh, dcr, dci, dce, *st):
        return PS._launch(scal, z0, oxh, oyh, dcr, dci, dce, st,
                          tile_h, height_l, width, budget, interpret)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rows, rows, rows) + (rows,) * 9,
        out_specs=(rows,) * 9,
        check_vma=False)
    return f(scal, z0, oxh, oyh, dcr, dci, dce, *state)


def sharded_perturb_render_stream(results, ptz: PointZoomBBConverter,
                                  width: int, height: int,
                                  max_iter: int, mesh: Mesh,
                                  tile_h: int = 8,
                                  launch_windows: int | None = None,
                                  interpret: bool = False,
                                  abort_monitor=None):
    """`ops.perturb_stream.perturb_render_stream` with the pixel grid
    sharded by tile rows over `mesh` (bit-identical output)."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    count = results.count_orbit_entries() + 1
    max_ref = results.max_ref_iteration()
    n_win = -(-max_ref // PS.WIN)

    ox, oy = results.device_orbit(np.float32)
    npad = n_win * PS.WIN
    oxp = np.zeros(npad, np.float32)
    oyp = np.zeros(npad, np.float32)
    m = min(count - 1, npad)
    oxp[:m] = ox[1:m + 1]
    oyp[:m] = oy[1:m + 1]
    z0 = jnp.asarray([ox[0], oy[0]], jnp.float32)
    oxj = jnp.asarray(oxp)
    oyj = jnp.asarray(oyp)

    dx, dy, cxo, cyo = delta_params(ptz, results.center_x,
                                    results.center_y, width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, np.float32)
    scal = jnp.asarray([0, max_ref, n_win], jnp.int32)

    # pad the row axis to a multiple of ndev·tile_h so every device
    # gets an equal, tile-aligned slab; lanes pad to the 128 grid
    slab = ndev * tile_h
    ph = -(-height // slab) * slab
    gw = -(-width // PS.LANE)
    pw = gw * PS.LANE
    height_l = ph // ndev
    n_tiles = (ph // tile_h) * gw
    if launch_windows is None:
        launch_windows = max(4, (4 << 20) // (PS.WIN * max(1, n_tiles)))

    def pad(a, fill=0):
        return jnp.pad(a, ((0, ph - height), (0, pw - width)),
                       constant_values=fill)

    done0 = np.ones((ph, pw), np.int32)
    done0[:height, :width] = 0
    rhi0, rlo0 = PS._rem_split(max_iter)
    rows = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def dev_rows(a):
        return jax.device_put(a, rows)

    state = (
        dev_rows(jnp.zeros((ph, pw), jnp.float32)),
        dev_rows(jnp.zeros((ph, pw), jnp.float32)),
        dev_rows(jnp.full((ph, pw), int(hdr.MIN_BIG_EXPONENT),
                          jnp.int32)),
        dev_rows(jnp.full((ph, pw), rhi0, jnp.int32)),
        dev_rows(jnp.full((ph, pw), rlo0, jnp.int32)),
        dev_rows(jnp.asarray(done0)),
        dev_rows(jnp.zeros((ph, pw), jnp.int32)),
        dev_rows(jnp.zeros((n_tiles * 8, 128), jnp.int32)),
        dev_rows(jnp.zeros((n_tiles * 8, 128), jnp.float32)),
    )
    dcr = dev_rows(pad(dc.re))
    dci = dev_rows(pad(dc.im))
    dce = dev_rows(pad(dc.e, fill=int(hdr.MIN_BIG_EXPONENT)))
    scal = jax.device_put(scal, rep)
    z0 = jax.device_put(z0, rep)
    oxj = jax.device_put(oxj, rep)
    oyj = jax.device_put(oyj, rep)

    with jax.enable_x64(False):
        while True:
            state = _launch_sharded(
                scal, z0, oxj, oyj, dcr, dci, dce, state,
                mesh=mesh, axis=axis, tile_h=tile_h,
                height_l=height_l, width=pw,
                budget=int(launch_windows), interpret=interpret)
            flags = np.asarray(state[7])[::8, 1]
            if flags.min() >= 1:
                break
            if abort_monitor is not None and abort_monitor.aborted():
                break
    return PS._iters_from_rem(state[3], state[4], max_iter,
                              height, width)


@functools.partial(jax.jit, static_argnames=(
    "mesh", "axis", "tile_h", "height_l", "width", "budget",
    "interpret"))
def _rc_launch_sharded(scal, cvals, anc, dcr, dci, dce, state, *,
                       mesh: Mesh, axis: str, tile_h: int,
                       height_l: int, width: int, budget: int,
                       interpret: bool):
    rep = P()
    rows = P(axis)

    def body(scal, cvals, awh, awl, axh, axl, ayh, ayl,
             dcr, dci, dce, *st):
        return PS._rc_launch(scal, cvals, awh, awl, axh, axl, ayh, ayl,
                             dcr, dci, dce, st, tile_h, height_l,
                             width, budget, interpret)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep,) * 8 + (rows, rows, rows) + (rows,) * 12,
        out_specs=(rows,) * 12,
        check_vma=False)
    return f(scal, cvals, *anc, dcr, dci, dce, *state)


def sharded_perturb_render_stream_rc(compressed, center_x, center_y,
                                     ptz: PointZoomBBConverter,
                                     width: int, height: int,
                                     max_iter: int, mesh: Mesh,
                                     tile_h: int = 8,
                                     launch_windows: int | None = None,
                                     interpret: bool = False,
                                     abort_monitor=None):
    """`perturb_render_stream_rc` (on-device decompression from a
    CompressedOrbit — the View #27-class kernel) with the pixel grid
    row-slab-sharded over `mesh`; anchors/recurrence constants
    replicated.  Fresh renders only (no LA-phase handoff state)."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    M = len(compressed.anchors_x)
    if M == 0:
        return None
    awh, awl, xh, xl, yh, yl, mpad = PS._prep_anchors(compressed)

    max_ref = int(compressed.total_count) - 1
    n_win = -(-max_ref // PS.WIN)
    last_local = max_ref - (n_win - 1) * PS.WIN
    cx = np.float32(compressed.cx_low)
    cy = np.float32(compressed.cy_low)
    cvals = jnp.asarray([cx, np.float32(compressed.cx_low - float(cx)),
                         cy, np.float32(compressed.cy_low - float(cy))],
                        jnp.float32)
    dx, dy, cxo, cyo = delta_params(ptz, center_x, center_y,
                                    width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, np.float32)
    scal = jnp.asarray([last_local, n_win, mpad // PS.ANC_BLK, 0],
                       jnp.int32)

    slab = ndev * tile_h
    ph = -(-height // slab) * slab
    gw = -(-width // PS.LANE)
    pw = gw * PS.LANE
    height_l = ph // ndev
    n_tiles = (ph // tile_h) * gw
    if launch_windows is None:
        launch_windows = max(4, (4 << 20) // (PS.WIN * max(1, n_tiles)))

    def pad(a, fill=0):
        return jnp.pad(a, ((0, ph - height), (0, pw - width)),
                       constant_values=fill)

    done0 = np.ones((ph, pw), np.int32)
    done0[:height, :width] = 0
    rhi0, rlo0 = PS._rem_split(max_iter)
    rows = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def dev_rows(a):
        return jax.device_put(a, rows)

    state = tuple(dev_rows(a) for a in (
        jnp.zeros((ph, pw), jnp.float32),
        jnp.zeros((ph, pw), jnp.float32),
        jnp.full((ph, pw), int(hdr.MIN_BIG_EXPONENT), jnp.int32),
        jnp.full((ph, pw), rhi0, jnp.int32),
        jnp.full((ph, pw), rlo0, jnp.int32),
        jnp.asarray(done0),
        jnp.zeros((ph, pw), jnp.int32),
        jnp.zeros((ph, pw), jnp.int32),
        jnp.zeros((ph, pw), jnp.int32),
        jnp.zeros((ph, pw), jnp.int32),
        jnp.zeros((n_tiles * 8, 128), jnp.int32),
        jnp.zeros((n_tiles * 8, 128), jnp.float32),
    ))
    anc = tuple(jax.device_put(jnp.asarray(a), rep)
                for a in (awh, awl, xh, xl, yh, yl))
    dcr = dev_rows(pad(dc.re))
    dci = dev_rows(pad(dc.im))
    dce = dev_rows(pad(dc.e, fill=int(hdr.MIN_BIG_EXPONENT)))
    scal = jax.device_put(scal, rep)
    cvals = jax.device_put(cvals, rep)

    with jax.enable_x64(False):
        while True:
            state = _rc_launch_sharded(
                scal, cvals, anc, dcr, dci, dce, state,
                mesh=mesh, axis=axis, tile_h=tile_h,
                height_l=height_l, width=pw,
                budget=int(launch_windows), interpret=interpret)
            flags = np.asarray(state[10])[::8, 3]
            if flags.min() >= 1:
                break
            if abort_monitor is not None and abort_monitor.aborted():
                break
    return PS._iters_from_rem(state[3], state[4], max_iter,
                              height, width)
