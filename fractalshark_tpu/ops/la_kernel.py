"""LAv2 per-pixel kernel: AT head-skip → LA stage stepping → perturbation
tail with rebasing.

Vectorized re-design of the flagship deep-zoom kernel
(``FractalSharkGpuLib/LAKernel.cuh:7-180``; CPU mirror
``Fractal.cpp:2530-2680``). The per-pixel control flow (walk stages
coarse→fine, step LA nodes while usable, drop a stage on unusable,
rebase when |z| < |dz|, finish with plain perturbation) becomes a single
masked while-loop over a per-pixel state machine:

    stage s ∈ [stage_count-1 .. 0]: LA stepping; s = -1: tail
    j = node offset within the stage (sentinel -1 = "just entered
    stage, take j from ref_iter"); ref_iter = node/orbit index handed
    to the next stage on exit.

LA node data is gathered per pixel from flat (mantissa, exp) arrays —
the device analogue of GPU_LAReference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.ops import hdrfloat as hdr
from fractalshark_tpu.ops.hdrfloat import HDR, HDRComplex
from fractalshark_tpu.ops.perturb import _dc_grids_hdr, delta_params


def _gather_complex(m, e, idx) -> HDRComplex:
    return HDRComplex(m[idx, 0], m[idx, 1], e[idx])


def _gather_hdr(m, e, idx) -> HDR:
    return HDR(m[idx], e[idx])


@functools.partial(jax.jit, static_argnames=("max_iter", "la_only",
                                             "stage_count", "at_step"))
def _lav2_impl(orbit_x, orbit_y, dc_re, dc_im, dc_e,
               ref_m, ref_e, zc_m, zc_e, cc_m, cc_e,
               thr_m, thr_e, thrc_m, thrc_e,
               step_length, next_stage_idx,
               stage_la_index, stage_macro,
               at_args, max_ref, max_iter, la_only, stage_count,
               at_step=0):
    shape = dc_re.shape
    dtype = dc_re.dtype
    # iteration counters: i32 when the budget allows (i64 is emulated
    # and slow on TPU; budgets >= 2^31 use the 64-bit path)
    it_t = jnp.int64 if max_iter >= (1 << 31) else jnp.int32
    n = it_t(max_iter)
    dc = HDRComplex(dc_re, dc_im, dc_e)
    dc_cheb = hdr.reduce(hdr.chebychev_norm(dc))
    two56 = HDR(jnp.full(shape, 1.0, dtype), jnp.full(shape, 8, jnp.int32))

    # ---------------- stage validity, precomputed per pixel ------------
    # invalid iff |dc| >= LAThresholdC of the stage's first node
    # (GPU_LAReference.h:243-255)
    stage_valid = []
    for s in range(stage_count):
        idx0 = stage_la_index[s]
        thrc0 = HDR(jnp.broadcast_to(thrc_m[idx0], shape),
                    jnp.broadcast_to(thrc_e[idx0], shape))
        stage_valid.append(hdr.lt_reduced(dc_cheb, thrc0))
    if stage_count:
        stage_valid_arr = jnp.stack(stage_valid)  # [S, H, W]
    else:
        stage_valid_arr = jnp.zeros((1,) + shape, bool)

    # ---------------- AT head skip (ATInfo.h:157-188) ------------------
    it0 = jnp.zeros(shape, it_t)
    dz0 = hdr.complex_zero(shape, dtype)
    if at_args is not None and at_step > 0:
        (at_thrc, at_sqr_esc, at_refc, at_cc, at_invzc) = at_args

        def bc_c(v):
            return HDRComplex(jnp.full(shape, v[0], dtype),
                              jnp.full(shape, v[1], dtype),
                              jnp.full(shape, v[2], jnp.int32))

        def bc_s(v):
            return HDR(jnp.full(shape, v[0], dtype),
                       jnp.full(shape, v[1], jnp.int32))

        at_ok = hdr.lte_reduced(dc_cheb, bc_s(at_thrc))
        c_at = hdr.reduce_complex(hdr.complex_add(
            hdr.complex_mul(dc, bc_c(at_cc)), bc_c(at_refc)))
        at_max_it = max_iter // at_step
        sqr_esc = bc_s(at_sqr_esc)

        def at_cond(s):
            i, _, _, _, active = s
            return jnp.logical_and(i < at_max_it,
                                   jnp.max(active.astype(jnp.int32)) > 0)

        def at_body(s):
            i, zr, zi, ze, active = s
            z = HDRComplex(zr, zi, ze)
            nsq = hdr.reduce(hdr.norm_squared(z))
            esc = hdr.gt_reduced(nsq, sqr_esc)
            cont = active & ~esc
            nz = hdr.reduce_complex(hdr.complex_add(hdr.complex_sqr(z), c_at))
            zr = jnp.where(cont, nz.re, zr)
            zi = jnp.where(cont, nz.im, zi)
            ze = jnp.where(cont, nz.e, ze)
            return i + 1, zr, zi, ze, cont

        z0 = hdr.complex_zero(shape, dtype)
        steps_taken = jnp.zeros(shape, jnp.int32)

        # count steps per pixel: a pixel's step count = number of body
        # iterations while it stayed active
        def at_body_counting(s):
            i, zr, zi, ze, active, cnt = s
            i2, zr2, zi2, ze2, cont = at_body((i, zr, zi, ze, active))
            return i2, zr2, zi2, ze2, cont, cnt + cont.astype(jnp.int32)

        def at_cond_counting(s):
            return at_cond((s[0], s[1], s[2], s[3], s[4]))

        _, zr, zi, ze, _, cnt = jax.lax.while_loop(
            at_cond_counting, at_body_counting,
            (jnp.int32(0), z0.re, z0.im, z0.e, at_ok, steps_taken))
        zend = HDRComplex(zr, zi, ze)
        dz_at = hdr.reduce_complex(hdr.complex_mul(zend, bc_c(at_invzc)))
        it0 = jnp.where(at_ok, cnt.astype(it_t) * at_step, it0)
        dz0 = HDRComplex(jnp.where(at_ok, dz_at.re, dz0.re),
                         jnp.where(at_ok, dz_at.im, dz0.im),
                         jnp.where(at_ok, dz_at.e, dz0.e))

    # ---------------- main state machine --------------------------------
    s0 = jnp.full(shape, stage_count - 1, jnp.int32)
    j0 = jnp.full(shape, 0, jnp.int32)   # top stage entered with j=0
    ref0 = jnp.zeros(shape, jnp.int32)
    done0 = it0 >= n

    def cond(st):
        done = st[-1]
        return jnp.max((~done).astype(jnp.int32)) > 0

    def body(st):
        (s, j, ref_iter, dzr, dzi, dze, it, done) = st
        dz = HDRComplex(dzr, dzi, dze)
        live = ~done
        in_la = live & (s >= 0)
        in_tail = live & (s < 0)

        # ---------------- LA branch -----------------------------------
        s_idx = jnp.clip(s, 0, max(stage_count - 1, 0))
        la_index = stage_la_index[s_idx]
        macro = stage_macro[s_idx]
        valid = jnp.take_along_axis(
            stage_valid_arr, s_idx[None, ...], axis=0)[0] if stage_count \
            else jnp.zeros(shape, bool)
        entering = j < 0
        j_eff = jnp.where(entering, ref_iter, j)
        node = jnp.clip(la_index + j_eff, 0, step_length.shape[0] - 1)

        l = step_length[node].astype(it_t)
        ref = _gather_complex(ref_m, ref_e, node)
        thr = _gather_hdr(thr_m, thr_e, node)
        # newdz = dz*(2*Ref + dz)   (LAInfoDeep::Prepare)
        t = hdr.complex_add(hdr.complex_mul_pow2(ref, 1), dz)
        newdz = hdr.reduce_complex(hdr.complex_mul(t, dz))
        within_budget = (it + l) <= n
        prepared_ok = hdr.lt_reduced(
            hdr.reduce(hdr.chebychev_norm(newdz)), thr)
        usable = within_budget & prepared_ok

        # stage drop: invalid stage, or unusable node
        drop_invalid = in_la & ~valid
        drop_unusable = in_la & valid & ~usable
        do_step = in_la & valid & usable

        # on unusable: ref_iter = node's NextStageLAIndex
        nsi = next_stage_idx[node]
        ref_iter = jnp.where(drop_unusable, nsi, ref_iter)
        s = jnp.where(drop_invalid | drop_unusable, s - 1, s)
        j = jnp.where(drop_invalid | drop_unusable, -1, j)

        # LA step: dz' = newdz*ZCoeff + dc*CCoeff ; z = Ref[node+1] + dz'
        zc = _gather_complex(zc_m, zc_e, node)
        cc = _gather_complex(cc_m, cc_e, node)
        dz_ev = hdr.reduce_complex(hdr.complex_add(
            hdr.complex_mul(newdz, zc), hdr.complex_mul(dc, cc)))
        refp1 = _gather_complex(ref_m, ref_e,
                                jnp.clip(node + 1, 0,
                                         ref_e.shape[0] - 1))
        z_full = hdr.reduce_complex(hdr.complex_add(refp1, dz_ev))
        j_next = j_eff + 1
        reb = hdr.lt_reduced(hdr.reduce(hdr.chebychev_norm(z_full)),
                             hdr.reduce(hdr.chebychev_norm(dz_ev))) | \
            (j_next >= macro)
        dz_la = HDRComplex(jnp.where(reb, z_full.re, dz_ev.re),
                           jnp.where(reb, z_full.im, dz_ev.im),
                           jnp.where(reb, z_full.e, dz_ev.e))
        j_la = jnp.where(reb, 0, j_next)
        it_la = it + l

        # ---------------- tail branch ----------------------------------
        oj = jnp.clip(ref_iter, 0, max_ref)
        zx = orbit_x[oj]
        zy = orbit_y[oj]
        zj = HDRComplex(zx, zy, jnp.zeros(shape, jnp.int32))
        t2 = hdr.complex_add(hdr.complex_mul_pow2(zj, 1), dz)
        ndz = hdr.reduce_complex(
            hdr.complex_add(hdr.complex_mul(t2, dz), dc))
        oj1 = jnp.clip(ref_iter + 1, 0, max_ref)
        zf = hdr.reduce_complex(hdr.complex_add(
            HDRComplex(orbit_x[oj1], orbit_y[oj1],
                       jnp.zeros(shape, jnp.int32)), ndz))
        nsq = hdr.reduce(hdr.norm_squared(zf))
        dsq = hdr.reduce(hdr.norm_squared(ndz))
        esc = hdr.gt_reduced(nsq, two56)
        treb = hdr.lt_reduced(nsq, dsq) | ((ref_iter + 1) >= max_ref)
        tail_upd = in_tail & ~esc
        dz_tail = HDRComplex(jnp.where(treb, zf.re, ndz.re),
                             jnp.where(treb, zf.im, ndz.im),
                             jnp.where(treb, zf.e, ndz.e))
        ref_tail = jnp.where(treb, 0, ref_iter + 1)

        # ---------------- merge ----------------------------------------
        dzr = jnp.where(do_step, dz_la.re,
                        jnp.where(tail_upd, dz_tail.re, dzr))
        dzi = jnp.where(do_step, dz_la.im,
                        jnp.where(tail_upd, dz_tail.im, dzi))
        dze = jnp.where(do_step, dz_la.e,
                        jnp.where(tail_upd, dz_tail.e, dze))
        j = jnp.where(do_step, j_la, j)
        ref_iter = jnp.where(tail_upd, ref_tail, ref_iter)
        it = jnp.where(do_step, it_la,
                       jnp.where(tail_upd, it + 1, it))

        done = done | (in_tail & esc) | (it >= n)
        if la_only:
            # LAO mode: no perturbation tail — a pixel finishing LA is done
            done = done | (live & (s < 0))
        return s, j, ref_iter, dzr, dzi, dze, it, done

    init = (s0, j0, ref0, dz0.re, dz0.im, dz0.e, it0, done0)
    _, _, _, _, _, _, iters, _ = jax.lax.while_loop(cond, body, init)
    return iters.astype(jnp.uint64 if max_iter >= (1 << 31) else jnp.uint32)


def la_perturb_render(results, la, ptz: PointZoomBBConverter,
                      width: int, height: int, max_iter: int,
                      sub_dtype=np.float32, la_only: bool = False):
    """Full LAv2 render: AT skip → LA stages → perturbation tail."""
    arrs = la.device_arrays(sub_dtype)
    ox, oy = results.device_orbit(sub_dtype)
    dx, dy, cxo, cyo = delta_params(ptz, results.center_x,
                                    results.center_y, width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, sub_dtype)

    at_args = None
    if la.use_at and la.at is not None:
        at = la.at

        def c3(z):
            return (np.asarray(z.m.real, sub_dtype),
                    np.asarray(z.m.imag, sub_dtype),
                    np.int32(z.e))

        def s2(v):
            return (np.asarray(v.m, sub_dtype), np.int32(v.e))

        at_args = (s2(at.threshold_c), s2(at.sqr_escape_radius),
                   c3(at.ref_c), c3(at.ccoeff), c3(at.inv_zcoeff))
        at_step = int(at.step_length)
    else:
        at_step = 0

    return _lav2_impl(
        jnp.asarray(ox), jnp.asarray(oy),
        dc.re, dc.im, dc.e,
        jnp.asarray(arrs["ref_m"]), jnp.asarray(arrs["ref_e"]),
        jnp.asarray(arrs["zc_m"]), jnp.asarray(arrs["zc_e"]),
        jnp.asarray(arrs["cc_m"]), jnp.asarray(arrs["cc_e"]),
        jnp.asarray(arrs["thr_m"]), jnp.asarray(arrs["thr_e"]),
        jnp.asarray(arrs["thrc_m"]), jnp.asarray(arrs["thrc_e"]),
        jnp.asarray(arrs["step_length"].astype(
            np.int64 if max_iter >= (1 << 31) else np.int32)),
        jnp.asarray(arrs["next_stage_la_index"]),
        jnp.asarray(arrs["stage_la_index"]),
        jnp.asarray(arrs["stage_macro_it_count"]),
        at_args,
        jnp.int32(results.max_ref_iteration()),
        int(max_iter), bool(la_only), int(arrs["stage_count"]),
        at_step=at_step)
