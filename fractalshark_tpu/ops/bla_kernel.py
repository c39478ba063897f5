"""BLA perturbation render kernel.

Device counterpart of ``FractalSharkGpuLib/BLAKernels.cuh:30-160`` (CPU
mirror ``Fractal.cpp:2288``): per pixel, repeatedly try the deepest
valid BLA macro-step (dz ← A·dz + B·dc, skipping l iterations), fall
back to a single perturbation step, with the usual escape (|z|² > 256)
and Zhuoran rebase.  The level walk of ``LookupBackwards``
(BLAS.cpp:258-308) unrolls statically over the stored levels, deepest
first.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.bla import FIRST_LEVEL, BLATable
from fractalshark_tpu.ops import hdrfloat as hdr
from fractalshark_tpu.ops.hdrfloat import HDR, HDRComplex
from fractalshark_tpu.ops.perturb import _dc_grids_hdr, delta_params


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "num_levels", "lm2"))
def _bla_impl(orbit_x, orbit_y, dc_re, dc_im, dc_e,
              a_re, a_im, a_e, b_re, b_im, b_e, r2_m, r2_e, l_arr,
              level_offset, level_count,
              max_ref, max_iter, num_levels, lm2):
    shape = dc_re.shape
    dtype = dc_re.dtype
    n = jnp.int32(max_iter)
    dc = HDRComplex(dc_re, dc_im, dc_e)
    two56 = HDR(jnp.full(shape, 1.0, dtype), jnp.full(shape, 8, jnp.int32))

    def cond(st):
        return jnp.max((~st[-1]).astype(jnp.int32)) > 0

    def body(st):
        (j, dzr, dzi, dze, it, done) = st
        dz = HDRComplex(dzr, dzi, dze)
        live = ~done

        # -------- LookupBackwards (vectorized level walk) --------------
        dz2 = hdr.reduce(hdr.norm_squared(dz))
        k = j - 1
        k_ok = (j > 0) & ((k & 1) == 0)
        ksafe = jnp.maximum(k, 0)
        vlow = ksafe & (-ksafe)
        zeros = jnp.where(ksafe == 0, 32,
                          jax.lax.population_count(
                              jnp.maximum(vlow - 1, 0)))
        start_level = jnp.minimum(zeros, lm2)
        found = jnp.zeros(shape, bool)
        g_best = jnp.zeros(shape, jnp.int32)
        for li in range(num_levels - 1, -1, -1):
            level = li + FIRST_LEVEL
            ix = ksafe >> level
            in_range = (level <= start_level) & (ix < level_count[li])
            g = jnp.clip(level_offset[li] + ix, 0, r2_m.shape[0] - 1)
            r2 = HDR(r2_m[g].astype(dtype), r2_e[g])
            hit = k_ok & in_range & hdr.lt_reduced(dz2, r2) & ~found
            g_best = jnp.where(hit, g, g_best)
            found = found | hit

        l = l_arr[g_best]
        fits = found & ((j + l) < (max_ref + 1)) & ((it + l) < n)
        do_bla = live & fits

        # -------- BLA macro step: dz ← A·dz + B·dc ----------------------
        A = HDRComplex(a_re[g_best].astype(dtype),
                       a_im[g_best].astype(dtype), a_e[g_best])
        B = HDRComplex(b_re[g_best].astype(dtype),
                       b_im[g_best].astype(dtype), b_e[g_best])
        dz_bla = hdr.reduce_complex(hdr.complex_add(
            hdr.complex_mul(A, dz), hdr.complex_mul(B, dc)))
        j_bla = j + l
        it_bla = it + l

        # -------- single perturbation step ------------------------------
        oj = jnp.clip(j, 0, max_ref)
        zj = HDRComplex(orbit_x[oj], orbit_y[oj],
                        jnp.zeros(shape, jnp.int32))
        t2 = hdr.complex_add(hdr.complex_mul_pow2(zj, 1), dz)
        dz_one = hdr.reduce_complex(
            hdr.complex_add(hdr.complex_mul(t2, dz), dc))
        j_one = j + 1
        it_one = it + 1

        sel = do_bla
        ndz = HDRComplex(jnp.where(sel, dz_bla.re, dz_one.re),
                         jnp.where(sel, dz_bla.im, dz_one.im),
                         jnp.where(sel, dz_bla.e, dz_one.e))
        nj = jnp.where(sel, j_bla, j_one)
        nit = jnp.where(sel, it_bla, it_one)

        # -------- escape / rebase on the landed z -----------------------
        ojn = jnp.clip(nj, 0, max_ref)
        zf = hdr.reduce_complex(hdr.complex_add(
            HDRComplex(orbit_x[ojn], orbit_y[ojn],
                       jnp.zeros(shape, jnp.int32)), ndz))
        nsq = hdr.reduce(hdr.norm_squared(zf))
        dsq = hdr.reduce(hdr.norm_squared(ndz))
        esc = hdr.gt_reduced(nsq, two56)
        reb = hdr.lt_reduced(nsq, dsq) | (nj >= max_ref)
        upd = live & ~esc
        dzr = jnp.where(upd, jnp.where(reb, zf.re, ndz.re), dzr)
        dzi = jnp.where(upd, jnp.where(reb, zf.im, ndz.im), dzi)
        dze = jnp.where(upd, jnp.where(reb, zf.e, ndz.e), dze)
        j = jnp.where(upd, jnp.where(reb, 0, nj), j)
        it = jnp.where(upd, nit, it)
        done = done | (live & esc) | (it >= n)
        return j, dzr, dzi, dze, it, done

    zero = hdr.complex_zero(shape, dtype)
    init = (jnp.zeros(shape, jnp.int32), zero.re, zero.im, zero.e,
            jnp.zeros(shape, jnp.int32), jnp.zeros(shape, bool))
    _, _, _, _, iters, _ = jax.lax.while_loop(cond, body, init)
    return iters.astype(jnp.uint32)


def bla_perturb_render(results, bla: BLATable, ptz: PointZoomBBConverter,
                       width: int, height: int, max_iter: int,
                       sub_dtype=np.float64):
    ox, oy = results.device_orbit(sub_dtype)
    dx, dy, cxo, cyo = delta_params(ptz, results.center_x,
                                    results.center_y, width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, sub_dtype)
    lm2 = max(bla.num_levels + FIRST_LEVEL - 2, FIRST_LEVEL)
    return _bla_impl(
        jnp.asarray(ox), jnp.asarray(oy), dc.re, dc.im, dc.e,
        jnp.asarray(bla.a_m.real.astype(sub_dtype)),
        jnp.asarray(bla.a_m.imag.astype(sub_dtype)),
        jnp.asarray(bla.a_e),
        jnp.asarray(bla.b_m.real.astype(sub_dtype)),
        jnp.asarray(bla.b_m.imag.astype(sub_dtype)),
        jnp.asarray(bla.b_e),
        jnp.asarray(bla.r2_m.astype(sub_dtype)), jnp.asarray(bla.r2_e),
        jnp.asarray(bla.l),
        jnp.asarray(bla.level_offset), jnp.asarray(bla.level_count),
        jnp.int32(results.max_ref_iteration()),
        int(max_iter), int(bla.num_levels), int(lm2))
