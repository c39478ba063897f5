"""Streaming Pallas perturbation kernel — arbitrary-length orbits.

The VMEM-resident kernel (ops/perturb_pallas.py) caps the reference
orbit at 8192 entries; realistic deep views carry 100k-1M+ entries
(reference kernels stream them from device memory,
``FractalSharkGpuLib/LAKernel.cuh:7-180``, ``Perturb.cuh:8-120``).

TPU-native redesign — *lockstep sweeps* instead of per-pixel gather:

Every live pixel advances its orbit index ``j`` by exactly 1 per
iteration; a rebase resets ``j`` to 0 (SURVEY.md A.1).  So if a rebased
pixel simply *stalls* until the next sweep over the orbit, all active
pixels share a single scalar ``j`` — the sweep step counter.  The
per-pixel orbit gather disappears: each step reads ``Z[j]``/``Z[j+1]``
as scalars from an SMEM window DMA'd from HBM, broadcast to the whole
pixel tile.  Sweeps repeat until every pixel has escaped or exhausted
its budget; stalled pixels re-activate at ``j=0`` on the next sweep.
Total step count is unchanged vs the per-pixel-j formulation — a pixel
executes exactly the iterations it would have — the only cost is lane
masking while other pixels in the tile still step (the same divergence
a CUDA warp pays).

Orbit values stream HBM → SMEM one window at a time; window DMA (a few
KB) is tiny next to the W vector steps it feeds.  Semantics match
``ops.perturb._perturb_hdr_impl`` bit for bit (same HDR ops, same
escape/rebase rules).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.ops import hdrfloat as hdr
from fractalshark_tpu.ops.hdrfloat import HDR, HDRComplex
from fractalshark_tpu.ops.perturb import _dc_grids_hdr, delta_params

LANE = 128
# orbit entries per streamed window; 1D HBM DMA slices must be
# 1024-element-aligned (Mosaic tiling for 1D f32)
WIN = 1024


def _kernel(scal_ref, z0_ref, oxh_ref, oyh_ref, dcr_ref, dci_ref, dce_ref,
            out_ref, winx, winy, semx, semy, *, tile_h):
    shape = (tile_h, LANE)
    max_iter = scal_ref[0]
    max_ref = scal_ref[1]
    n_win = scal_ref[2]

    dc = HDRComplex(dcr_ref[:], dci_ref[:], dce_ref[:])
    two56 = HDR(jnp.full(shape, 1.0, jnp.float32),
                jnp.full(shape, 8, jnp.int32))
    minbig = jnp.full(shape, hdr.MIN_BIG_EXPONENT, jnp.int32)

    def win_body(w, carry):
        dzr, dzi, dze, it, done, active, zcx, zcy = carry
        base = w * WIN
        cx = pltpu.make_async_copy(
            oxh_ref.at[pl.ds(base, WIN)], winx, semx)
        cy = pltpu.make_async_copy(
            oyh_ref.at[pl.ds(base, WIN)], winy, semy)
        cx.start()
        cy.start()
        cx.wait()
        cy.wait()

        def step(s_local, c):
            dzr, dzi, dze, it, done, active, zcx, zcy = c
            s = base + s_local
            live = (active > 0) & (it < max_iter) & (s < max_ref)
            zx = zcx          # Z[s], carried from the previous step
            zy = zcy
            zx1 = winx[s_local]   # Z[s+1]: window holds the 1-shifted orbit
            zy1 = winy[s_local]
            dz = HDRComplex(dzr, dzi, dze)
            zj = HDRComplex(jnp.full(shape, zx, jnp.float32),
                            jnp.full(shape, zy, jnp.float32),
                            jnp.zeros(shape, jnp.int32))
            t = hdr.complex_add(hdr.complex_mul_pow2(zj, 1), dz)
            ndz = hdr.reduce_complex(
                hdr.complex_add(hdr.complex_mul(t, dz), dc))
            zf = hdr.reduce_complex(hdr.complex_add(
                HDRComplex(jnp.full(shape, zx1, jnp.float32),
                           jnp.full(shape, zy1, jnp.float32),
                           jnp.zeros(shape, jnp.int32)), ndz))
            nsq = hdr.reduce(hdr.norm_squared(zf))
            dsq = hdr.reduce(hdr.norm_squared(ndz))
            esc = hdr.gt_reduced(nsq, two56)
            reb = hdr.lt_reduced(nsq, dsq) | (s + 1 >= max_ref)
            esc_px = live & esc
            upd = live & ~esc
            reb_px = upd & reb
            dzr = jnp.where(upd, jnp.where(reb, zf.re, ndz.re), dzr)
            dzi = jnp.where(upd, jnp.where(reb, zf.im, ndz.im), dzi)
            dze = jnp.where(upd, jnp.where(reb, zf.e, ndz.e), dze)
            it = it + upd.astype(jnp.int32)
            done = jnp.maximum(
                done, (esc_px | (it >= max_iter)).astype(jnp.int32))
            active = jnp.where(esc_px | reb_px | (it >= max_iter),
                               0, active)
            return dzr, dzi, dze, it, done, active, zx1, zy1

        c = (dzr, dzi, dze, it, done, active, zcx, zcy)
        c = jax.lax.fori_loop(jnp.int32(0), jnp.int32(WIN), step, c)
        return c

    def sweep_cond(carry):
        return jnp.min(carry[4]) < 1

    def sweep(carry):
        dzr, dzi, dze, it, done = carry[:5]
        active = 1 - done

        def wcond(c2):
            w = c2[0]
            return jnp.logical_and(w < n_win, jnp.max(c2[1][5]) > 0)

        def wbody(c2):
            w, c = c2
            return w + 1, win_body(w, c)

        _, c = jax.lax.while_loop(
            wcond, wbody,
            (jnp.int32(0), (dzr, dzi, dze, it, done, active,
                            z0_ref[0], z0_ref[1])))
        return c

    init = (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
            minbig, jnp.zeros(shape, jnp.int32),
            jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.int32),
            z0_ref[0], z0_ref[1])
    out = jax.lax.while_loop(sweep_cond, sweep, init)
    out_ref[:] = out[3].astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("tile_h", "height", "width",
                                             "interpret"))
def _render_impl(scal, z0, oxh, oyh, dcr, dci, dce, tile_h, height, width,
                 interpret):
    grid = (pl.cdiv(height, tile_h), pl.cdiv(width, LANE))
    kernel = functools.partial(_kernel, tile_h=tile_h)
    ph = grid[0] * tile_h
    pw = grid[1] * LANE

    def pad(a, fill=0):
        return jnp.pad(a, ((0, ph - height), (0, pw - width)),
                       constant_values=fill)

    tile_spec = pl.BlockSpec((tile_h, LANE), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            tile_spec, tile_spec, tile_spec,
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.uint32),
        scratch_shapes=[
            pltpu.SMEM((WIN,), jnp.float32),
            pltpu.SMEM((WIN,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(scal, z0, oxh, oyh, pad(dcr), pad(dci),
      pad(dce, fill=int(hdr.MIN_BIG_EXPONENT)))
    return out[:height, :width]


def perturb_render_stream(results, ptz: PointZoomBBConverter,
                          width: int, height: int, max_iter: int,
                          tile_h: int = 64, interpret: bool = False):
    """HDR-f32 perturbation render streaming the orbit from HBM.

    No orbit-length cap: the orbit lives in HBM and is DMA'd into SMEM
    one WIN-entry window at a time as all live pixels sweep it in
    lockstep."""
    if max_iter >= (1 << 31):
        return None
    count = results.count_orbit_entries() + 1  # + wraparound entry
    ox, oy = results.device_orbit(np.float32)
    # the kernel carries Z[s] as a scalar and reads only Z[s+1] from the
    # window, so the streamed arrays are the 1-shifted orbit (aligned
    # WIN-sized DMA slices, no window overlap)
    max_ref = results.max_ref_iteration()
    n_win = -(-max_ref // WIN)
    npad = n_win * WIN
    oxp = np.zeros(npad, np.float32)
    oyp = np.zeros(npad, np.float32)
    m = min(count - 1, npad)
    oxp[:m] = ox[1:m + 1]
    oyp[:m] = oy[1:m + 1]
    z0 = jnp.asarray([ox[0], oy[0]], jnp.float32)
    dx, dy, cxo, cyo = delta_params(ptz, results.center_x,
                                    results.center_y, width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, np.float32)
    scal = jnp.asarray([max_iter, max_ref, n_win], jnp.int32)
    with jax.enable_x64(False):
        return _render_impl(scal, z0, jnp.asarray(oxp), jnp.asarray(oyp),
                            dc.re, dc.im, dc.e, tile_h, height, width,
                            interpret)
