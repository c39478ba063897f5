"""Pallas TPU perturbation kernel (HDR-f32 deltas, VMEM-resident orbit).

The XLA-level perturbation renderer (ops/perturb.py) pays an HBM gather
per step; this kernel keeps the whole reference orbit in VMEM as
[R, 128] tiles and performs the per-pixel orbit lookup as R masked
row-selects + an in-row ``take_along_axis`` — Mosaic-legal and cheap for
the orbit lengths deep-zoom LA leaves behind (R ≤ 64 ⇒ ≤ 8192 entries).
Longer orbits fall back to the XLA path.

Semantics identical to ``_perturb_hdr_impl`` (SURVEY.md A.1): dz ←
dz(2Z+dz)+dc, escape at |z|² > 256, Zhuoran rebase, counter-derived
liveness. One pallas program per (tile_h, 128) pixel tile; each tile
exits its while loop as soon as all of its pixels resolve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fractalshark_tpu.ops import hdrfloat as hdr
from fractalshark_tpu.ops.hdrfloat import HDR, HDRComplex
from fractalshark_tpu.ops.perturb import _dc_grids_hdr, delta_params

LANE = 128
MAX_ORBIT_ROWS = 64  # VMEM orbit cap: 64×128 = 8192 entries
_INNER = 4


def _select_gather(rows, col, tiles, R, tile_shape):
    """tiles: list of [R, LANE] VMEM arrays; returns per-array gathered
    values at flat indices row*LANE+col (row < R)."""
    outs = [jnp.zeros(tile_shape, t.dtype) for t in tiles]
    for r in range(R):
        hit = rows == r
        for i, t in enumerate(tiles):
            vals = jnp.take_along_axis(
                jnp.broadcast_to(t[r][None, :], tile_shape), col, axis=1)
            outs[i] = jnp.where(hit, vals, outs[i])
    return outs


def _kernel(scal_ref, ox_ref, oy_ref, dcr_ref, dci_ref, dce_ref, out_ref,
            *, tile_h, R):
    shape = (tile_h, LANE)
    max_iter = scal_ref[0]
    max_ref = scal_ref[1]

    dc = HDRComplex(dcr_ref[:], dci_ref[:], dce_ref[:])
    two56 = HDR(jnp.full(shape, 1.0, jnp.float32),
                jnp.full(shape, 8, jnp.int32))
    ox = ox_ref[:]
    oy = oy_ref[:]

    def step(_, s):
        k, dzr, dzi, dze, j, it = s
        live = (it == k) & (k < max_iter)
        dz = HDRComplex(dzr, dzi, dze)
        jr = j >> 7
        jc = j & 127
        j1 = j + 1
        j1r = j1 >> 7
        j1c = j1 & 127
        zx, zy = _select_gather(jr, jc, [ox, oy], R, shape)
        zx1, zy1 = _select_gather(j1r, j1c, [ox, oy], R, shape)
        zj = HDRComplex(zx, zy, jnp.zeros(shape, jnp.int32))
        t = hdr.complex_add(hdr.complex_mul_pow2(zj, 1), dz)
        ndz = hdr.reduce_complex(
            hdr.complex_add(hdr.complex_mul(t, dz), dc))
        zf = hdr.reduce_complex(hdr.complex_add(
            HDRComplex(zx1, zy1, jnp.zeros(shape, jnp.int32)), ndz))
        nsq = hdr.reduce(hdr.norm_squared(zf))
        dsq = hdr.reduce(hdr.norm_squared(ndz))
        esc = hdr.gt_reduced(nsq, two56)
        reb = hdr.lt_reduced(nsq, dsq) | (j1 >= max_ref)
        upd = live & ~esc
        dzr = jnp.where(upd, jnp.where(reb, zf.re, ndz.re), dzr)
        dzi = jnp.where(upd, jnp.where(reb, zf.im, ndz.im), dzi)
        dze = jnp.where(upd, jnp.where(reb, zf.e, ndz.e), dze)
        j = jnp.where(upd, jnp.where(reb, 0, j1), j)
        it = it + upd.astype(jnp.int32)
        return k + 1, dzr, dzi, dze, j, it

    def cond(s):
        k, it = s[0], s[5]
        return jnp.logical_and(
            k < max_iter, jnp.max((it == k).astype(jnp.int32)) > 0)

    def chunk(s):
        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(_INNER), step, s)

    minbig = jnp.full(shape, hdr.MIN_BIG_EXPONENT, jnp.int32)
    init = (jnp.int32(0),
            jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
            minbig,
            jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.int32))
    _, _, _, _, _, iters = jax.lax.while_loop(cond, chunk, init)
    out_ref[:] = iters.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("tile_h", "R", "height",
                                             "width", "interpret"))
def _render_impl(scal, ox, oy, dcr, dci, dce, tile_h, R, height, width,
                 interpret):
    grid = (pl.cdiv(height, tile_h), pl.cdiv(width, LANE))
    kernel = functools.partial(_kernel, tile_h=tile_h, R=R)
    ph = grid[0] * tile_h
    pw = grid[1] * LANE

    def pad(a, fill=0):
        return jnp.pad(a, ((0, ph - height), (0, pw - width)),
                       constant_values=fill)

    tile_spec = pl.BlockSpec((tile_h, LANE),
                             lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda i, j: tuple(jnp.int32(0) for _ in shp),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3,), lambda i, j: (jnp.int32(0),),
                         memory_space=pltpu.SMEM),
            full((R, LANE)), full((R, LANE)),
            tile_spec, tile_spec, tile_spec,
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.uint32),
        interpret=interpret,
    )(scal, ox, oy, pad(dcr), pad(dci),
      pad(dce, fill=int(hdr.MIN_BIG_EXPONENT)))
    return out[:height, :width]


def perturb_render_pallas(results, ptz: PointZoomBBConverter,
                          width: int, height: int, max_iter: int,
                          tile_h: int = 64, interpret: bool = False):
    """HDR-f32 perturbation render as a Pallas kernel. Returns None when
    the orbit exceeds the VMEM budget (caller falls back to XLA)."""
    count = results.count_orbit_entries() + 1  # + wraparound entry
    R = -(-count // LANE)
    # big budgets go to the resumable streaming kernel instead: this
    # kernel runs one unbounded dispatch (device-watchdog risk)
    if R > MAX_ORBIT_ROWS or max_iter > 200_000:
        return None
    ox, oy = results.device_orbit(np.float32)
    oxp = np.zeros((R, LANE), np.float32)
    oyp = np.zeros((R, LANE), np.float32)
    oxp.ravel()[:count] = ox
    oyp.ravel()[:count] = oy
    dx, dy, cxo, cyo = delta_params(ptz, results.center_x,
                                    results.center_y, width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, np.float32)
    scal = jnp.asarray([max_iter, results.max_ref_iteration(), 0],
                       jnp.int32)
    # trace without x64: under jax_enable_x64, jnp.take_along_axis
    # builds int64 iota indices, which Mosaic cannot lower
    with jax.enable_x64(False):
        return _render_impl(scal, jnp.asarray(oxp), jnp.asarray(oyp),
                            dc.re, dc.im, dc.e, tile_h, R, height, width,
                            interpret)
