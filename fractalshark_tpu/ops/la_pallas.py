"""Pallas LAv2 kernel: LA stage stepping + perturbation tail in one
VMEM-resident TPU kernel.

The XLA LAv2 kernel (ops/la_kernel.py) pays ~14 HBM gathers per step;
here the LA node tables AND the reference orbit live in VMEM as
[R, 128] tiles with the same masked select-gather as
ops/perturb_pallas.py. The per-pixel state machine is identical
(stage s ≥ 0: LA stepping; s = −1: perturbation tail; SURVEY.md A.1/A.2,
``FractalSharkGpuLib/LAKernel.cuh``). The AT head-skip runs at XLA level
(one-off) and hands (it0, dz0) into the kernel.

Budgets: orbit ≤ 8192 entries and ≤ 2048 LA nodes in VMEM; larger
tables fall back to the XLA kernel.
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
from fractalshark_tpu.ops.perturb_pallas import _select_gather

LANE = 128
MAX_ORBIT_ROWS = 64
MAX_NODE_ROWS = 16
_INNER = 2


def _pack_rows(arr, R, dtype):
    out = np.zeros((R, LANE), dtype)
    out.ravel()[:len(arr)] = arr
    return jnp.asarray(out)


def _kernel(scal_ref, stage_idx_ref, stage_macro_ref,
            stage_thrcm_ref, stage_thrce_ref,
            ox_ref, oy_ref,
            nref_re, nref_im, nref_e, nzc_re, nzc_im, nzc_e,
            ncc_re, ncc_im, ncc_e, nthr_m, nthr_e, nthrc_m, nthrc_e,
            nstep, nnext,
            dcr_ref, dci_ref, dce_ref, it0_ref,
            dz0r_ref, dz0i_ref, dz0e_ref,
            out_ref, *, tile_h, Ro, Rn, stage_count):
    shape = (tile_h, LANE)
    max_iter = scal_ref[0]
    max_ref = scal_ref[1]

    dc = HDRComplex(dcr_ref[:], dci_ref[:], dce_ref[:])
    dc_cheb = hdr.reduce(hdr.chebychev_norm(dc))
    two56 = HDR(jnp.full(shape, 1.0, jnp.float32),
                jnp.full(shape, 8, jnp.int32))
    ox = ox_ref[:]
    oy = oy_ref[:]

    node_f32 = [nref_re[:], nref_im[:], nzc_re[:], nzc_im[:],
                ncc_re[:], ncc_im[:], nthr_m[:]]
    node_i32 = [nref_e[:], nzc_e[:], ncc_e[:], nthr_e[:],
                nstep[:], nnext[:]]

    # stage validity per pixel (invalid iff |dc| >= node0.LAThresholdC);
    # the per-stage head thresholds arrive precomputed in SMEM
    stage_valid = []
    for s in range(stage_count):
        thrc0 = HDR(jnp.full(shape, stage_thrcm_ref[s], jnp.float32),
                    jnp.full(shape, stage_thrce_ref[s], jnp.int32))
        stage_valid.append(hdr.lt_reduced(dc_cheb, thrc0))

    def step(_, st):
        k, s, j, ref_iter, dzr, dzi, dze, it, done = st
        dz = HDRComplex(dzr, dzi, dze)
        live = ~(done != 0)
        in_la = live & (s >= 0)
        in_tail = live & (s < 0)

        s_idx = jnp.clip(s, 0, max(stage_count - 1, 0))
        la_index = stage_idx_ref[0] * 0  # init; filled by switch below
        macro = la_index
        valid = jnp.zeros(shape, bool)
        for ss in range(stage_count):
            hit = s_idx == ss
            la_index = jnp.where(hit, stage_idx_ref[ss], la_index)
            macro = jnp.where(hit, stage_macro_ref[ss], macro)
            valid = valid | (hit & stage_valid[ss])

        entering = j < 0
        j_eff = jnp.where(entering, ref_iter, j)
        node = jnp.clip(la_index + j_eff, 0, Rn * LANE - 1)
        nr = node >> 7
        nc = node & 127
        f32v = _select_gather(nr, nc, node_f32, Rn, shape)
        i32v = _select_gather(nr, nc, node_i32, Rn, shape)
        ref = HDRComplex(f32v[0], f32v[1], i32v[0])
        zc = HDRComplex(f32v[2], f32v[3], i32v[1])
        cc = HDRComplex(f32v[4], f32v[5], i32v[2])
        thr = HDR(f32v[6], i32v[3])
        l = i32v[4]
        nsi = i32v[5]

        t = hdr.complex_add(hdr.complex_mul_pow2(ref, 1), dz)
        newdz = hdr.reduce_complex(hdr.complex_mul(t, dz))
        usable = ((it + l) <= max_iter) & hdr.lt_reduced(
            hdr.reduce(hdr.chebychev_norm(newdz)), thr)

        drop_invalid = in_la & ~valid
        drop_unusable = in_la & valid & ~usable
        do_step = in_la & valid & usable
        ref_iter = jnp.where(drop_unusable, nsi, ref_iter)
        s = jnp.where(drop_invalid | drop_unusable, s - 1, s)
        j = jnp.where(drop_invalid | drop_unusable, -1, j)

        dz_ev = hdr.reduce_complex(hdr.complex_add(
            hdr.complex_mul(newdz, zc), hdr.complex_mul(dc, cc)))
        node1 = jnp.clip(node + 1, 0, Rn * LANE - 1)
        rf = _select_gather(node1 >> 7, node1 & 127,
                            [node_f32[0], node_f32[1]], Rn, shape)
        re_ = _select_gather(node1 >> 7, node1 & 127,
                             [node_i32[0]], Rn, shape)
        refp1 = HDRComplex(rf[0], rf[1], re_[0])
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

        # tail
        oj = jnp.clip(ref_iter, 0, max_ref)
        ov = _select_gather(oj >> 7, oj & 127, [ox, oy], Ro, shape)
        zj = HDRComplex(ov[0], ov[1], jnp.zeros(shape, jnp.int32))
        t2 = hdr.complex_add(hdr.complex_mul_pow2(zj, 1), dz)
        ndz = hdr.reduce_complex(
            hdr.complex_add(hdr.complex_mul(t2, dz), dc))
        oj1 = jnp.clip(ref_iter + 1, 0, max_ref)
        ov1 = _select_gather(oj1 >> 7, oj1 & 127, [ox, oy], Ro, shape)
        zf = hdr.reduce_complex(hdr.complex_add(
            HDRComplex(ov1[0], ov1[1], jnp.zeros(shape, jnp.int32)), ndz))
        nsq = hdr.reduce(hdr.norm_squared(zf))
        dsq = hdr.reduce(hdr.norm_squared(ndz))
        esc = hdr.gt_reduced(nsq, two56)
        treb = hdr.lt_reduced(nsq, dsq) | ((ref_iter + 1) >= max_ref)
        tail_upd = in_tail & ~esc
        dz_tail = HDRComplex(jnp.where(treb, zf.re, ndz.re),
                             jnp.where(treb, zf.im, ndz.im),
                             jnp.where(treb, zf.e, ndz.e))
        ref_tail = jnp.where(treb, 0, ref_iter + 1)

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
        done = jnp.where((in_tail & esc) | (it >= max_iter),
                         jnp.int32(1), done)
        return k + 1, s, j, ref_iter, dzr, dzi, dze, it, done

    def cond(st):
        done = st[-1]
        return jnp.max(1 - done) > 0

    def chunk(st):
        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(_INNER), step, st)

    it0 = it0_ref[:]
    init = (jnp.int32(0),
            jnp.full(shape, stage_count - 1, jnp.int32),
            jnp.zeros(shape, jnp.int32),
            jnp.zeros(shape, jnp.int32),
            dz0r_ref[:], dz0i_ref[:], dz0e_ref[:],
            it0,
            (it0 >= max_iter).astype(jnp.int32))
    _, _, _, _, _, _, _, iters, _ = jax.lax.while_loop(cond, chunk, init)
    out_ref[:] = iters.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=(
    "tile_h", "Ro", "Rn", "stage_count", "height", "width", "interpret"))
def _render_impl(scal, stage_idx, stage_macro, stage_thrcm, stage_thrce,
                 ox, oy, node_arrs,
                 dcr, dci, dce, it0, dz0r, dz0i, dz0e,
                 tile_h, Ro, Rn, stage_count, height, width, interpret):
    grid = (pl.cdiv(height, tile_h), pl.cdiv(width, LANE))
    kernel = functools.partial(_kernel, tile_h=tile_h, Ro=Ro, Rn=Rn,
                               stage_count=stage_count)
    ph = grid[0] * tile_h
    pw = grid[1] * LANE

    def pad(a, fill=0):
        return jnp.pad(a, ((0, ph - height), (0, pw - width)),
                       constant_values=fill)

    tile = pl.BlockSpec((tile_h, LANE), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp,
                            lambda i, j: tuple(jnp.int32(0) for _ in shp),
                            memory_space=pltpu.VMEM)

    smem = lambda n: pl.BlockSpec((n,), lambda i, j: (jnp.int32(0),),  # noqa
                                  memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(3), smem(stage_count), smem(stage_count),
                  smem(stage_count), smem(stage_count),
                  full((Ro, LANE)), full((Ro, LANE))] +
                 [full((Rn, LANE))] * 15 +
                 [tile, tile, tile, tile, tile, tile, tile],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.uint32),
        interpret=interpret,
    )(scal, stage_idx, stage_macro, stage_thrcm, stage_thrce,
      ox, oy, *node_arrs,
      pad(dcr), pad(dci), pad(dce, fill=int(hdr.MIN_BIG_EXPONENT)),
      pad(it0), pad(dz0r), pad(dz0i),
      pad(dz0e, fill=int(hdr.MIN_BIG_EXPONENT)))
    return out[:height, :width]


def la_render_pallas(results, la, ptz: PointZoomBBConverter,
                     width: int, height: int, max_iter: int,
                     tile_h: int = 64, interpret: bool = False):
    """Full LAv2 render as a Pallas kernel (AT at XLA level). Returns
    None if the orbit/table exceeds the VMEM budget or counters need
    64 bits."""
    count = results.count_orbit_entries() + 1
    Ro = -(-count // LANE)
    arrs = la.device_arrays(np.float32)
    n_nodes = arrs["ref_m"].shape[0]
    Rn = -(-n_nodes // LANE)
    stage_count = int(arrs["stage_count"])
    if (Ro > MAX_ORBIT_ROWS or Rn > MAX_NODE_ROWS or
            max_iter >= (1 << 31) or stage_count == 0 or
            int(arrs["step_length"].max()) >= (1 << 31)):
        return None

    ox, oy = results.device_orbit(np.float32)
    dx, dy, cxo, cyo = delta_params(ptz, results.center_x,
                                    results.center_y, width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, np.float32)

    # AT head skip at XLA level (ops/la_kernel.py semantics)
    it0 = jnp.zeros((height, width), jnp.int32)
    z0 = hdr.complex_zero((height, width), jnp.float32)
    dz0r, dz0i, dz0e = z0.re, z0.im, z0.e
    if la.use_at and la.at is not None:
        at = la.at
        shape = (height, width)
        dc_cheb = hdr.reduce(hdr.chebychev_norm(dc))
        thrc = HDR(jnp.full(shape, np.float32(at.threshold_c.m)),
                   jnp.full(shape, np.int32(at.threshold_c.e), jnp.int32))
        at_ok = hdr.lte_reduced(dc_cheb, thrc)
        refc = HDRComplex(jnp.full(shape, np.float32(at.ref_c.m.real)),
                          jnp.full(shape, np.float32(at.ref_c.m.imag)),
                          jnp.full(shape, np.int32(at.ref_c.e), jnp.int32))
        ccf = HDRComplex(jnp.full(shape, np.float32(at.ccoeff.m.real)),
                         jnp.full(shape, np.float32(at.ccoeff.m.imag)),
                         jnp.full(shape, np.int32(at.ccoeff.e), jnp.int32))
        inv = HDRComplex(
            jnp.full(shape, np.float32(at.inv_zcoeff.m.real)),
            jnp.full(shape, np.float32(at.inv_zcoeff.m.imag)),
            jnp.full(shape, np.int32(at.inv_zcoeff.e), jnp.int32))
        sqr = HDR(jnp.full(shape, np.float32(at.sqr_escape_radius.m)),
                  jnp.full(shape, np.int32(at.sqr_escape_radius.e),
                           jnp.int32))
        c_at = hdr.reduce_complex(hdr.complex_add(
            hdr.complex_mul(dc, ccf), refc))
        at_max = max_iter // max(1, int(at.step_length))

        def at_body(i, s):
            zr, zi, ze, cnt, active = s
            z = HDRComplex(zr, zi, ze)
            esc = hdr.gt_reduced(hdr.reduce(hdr.norm_squared(z)), sqr)
            cont = active & ~esc
            nz = hdr.reduce_complex(
                hdr.complex_add(hdr.complex_sqr(z), c_at))
            return (jnp.where(cont, nz.re, zr),
                    jnp.where(cont, nz.im, zi),
                    jnp.where(cont, nz.e, ze),
                    cnt + cont.astype(jnp.int32), cont)

        zz = hdr.complex_zero(shape, jnp.float32)
        zr, zi, ze, cnt, _ = jax.lax.fori_loop(
            0, at_max, at_body,
            (zz.re, zz.im, zz.e, jnp.zeros(shape, jnp.int32), at_ok))
        dz_at = hdr.reduce_complex(hdr.complex_mul(
            HDRComplex(zr, zi, ze), inv))
        it0 = jnp.where(at_ok, cnt * int(at.step_length), it0)
        dz0r = jnp.where(at_ok, dz_at.re, dz0r)
        dz0i = jnp.where(at_ok, dz_at.im, dz0i)
        dz0e = jnp.where(at_ok, dz_at.e, dz0e)

    node_arrs = [
        _pack_rows(arrs["ref_m"][:, 0], Rn, np.float32),
        _pack_rows(arrs["ref_m"][:, 1], Rn, np.float32),
        _pack_rows(arrs["ref_e"], Rn, np.int32),
        _pack_rows(arrs["zc_m"][:, 0], Rn, np.float32),
        _pack_rows(arrs["zc_m"][:, 1], Rn, np.float32),
        _pack_rows(arrs["zc_e"], Rn, np.int32),
        _pack_rows(arrs["cc_m"][:, 0], Rn, np.float32),
        _pack_rows(arrs["cc_m"][:, 1], Rn, np.float32),
        _pack_rows(arrs["cc_e"], Rn, np.int32),
        _pack_rows(arrs["thr_m"], Rn, np.float32),
        _pack_rows(arrs["thr_e"], Rn, np.int32),
        _pack_rows(arrs["thrc_m"], Rn, np.float32),
        _pack_rows(arrs["thrc_e"], Rn, np.int32),
    ]
    # kernel expects f32 fields then i32 fields grouped; reorder:
    ordered = [node_arrs[0], node_arrs[1], node_arrs[2],   # ref re/im/e
               node_arrs[3], node_arrs[4], node_arrs[5],   # zc
               node_arrs[6], node_arrs[7], node_arrs[8],   # cc
               node_arrs[9], node_arrs[10],                # thr m/e
               node_arrs[11], node_arrs[12],               # thrc m/e
               _pack_rows(arrs["step_length"].astype(np.int32), Rn,
                          np.int32),
               _pack_rows(arrs["next_stage_la_index"], Rn, np.int32)]

    oxp = np.zeros((Ro, LANE), np.float32)
    oyp = np.zeros((Ro, LANE), np.float32)
    oxp.ravel()[:count] = ox
    oyp.ravel()[:count] = oy
    scal = jnp.asarray([max_iter, results.max_ref_iteration(), 0],
                       jnp.int32)
    with jax.enable_x64(False):
        heads = arrs["stage_la_index"]
        return _render_impl(
            scal, jnp.asarray(arrs["stage_la_index"]),
            jnp.asarray(arrs["stage_macro_it_count"]),
            jnp.asarray(arrs["thrc_m"][heads].astype(np.float32)),
            jnp.asarray(arrs["thrc_e"][heads].astype(np.int32)),
            jnp.asarray(oxp), jnp.asarray(oyp), ordered,
            dc.re, dc.im, dc.e,
            it0, dz0r, dz0i, dz0e,
            tile_h, Ro, Rn, stage_count, height, width, interpret)