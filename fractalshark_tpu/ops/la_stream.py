"""Streaming LAv2 LA phase — node tables of ANY size.

The VMEM LA kernel (ops/la_pallas.py) caps the node table at 2048
entries and the XLA machine (ops/la_kernel.py) pays a latency-bound
HBM gather per body step; deep views carry 10k-1M+ LA nodes
(reference streams them from device memory,
``FractalSharkGpuLib/LAKernel.cuh:7-180``).

TPU-native redesign — per-stage *lockstep sweeps*, the same
stall-and-rejoin trick as the streaming perturbation tail
(ops/perturb_stream.py): within one LA stage every stepping pixel
advances its node offset ``j`` by exactly 1 per macro-step; a rebase
resets ``j`` to 0; a pixel ENTERS the stage at ``j = ref_iter`` (the
``next_stage_la_index`` handed down on drop).  So all stepping pixels
share a single scalar sweep position, node data is read as SCALARS
from an SMEM window DMA'd from HBM (no per-pixel gather), and pixels
whose ``j`` is elsewhere stall until the sweep reaches it.

Stages run coarse→fine as separate phases at the host level: a pixel
that drops out of stage ``s`` (node unusable / budget) parks with
``ref_iter = next_stage_la_index`` and joins stage ``s-1``'s sweep at
that offset; after stage 0 the per-pixel (dz, ref_iter, it) hands off
to the streaming perturbation tail exactly like the existing
two-phase path (``engine/renderers.la_rc_render``).

Semantics match ``ops/la_kernel._lav2_impl``'s LA branch bit for bit
(same HDR ops, same usable/rebase rules, same
``LAInfoDeep::Prepare``/``Evaluate`` order, LAKernel.cuh:60-130).

64-bit budgets: iteration budgets and node step lengths ride as
(hi, lo) i32 pairs (IterTypeEnum::Bits64, RenderAlgorithm.h:81-159).
Node OFFSETS within a stage stay i32 — a table with ≥ 2^31 nodes per
stage cannot exist host-side (device_arrays materializes the table).
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
from fractalshark_tpu.ops.perturb_stream import REM_LOG, _rem_split

LANE = 128
# nodes per streamed window: 2D (rows, N) layout needs only 128-lane
# alignment per DMA slice (the 1D kernels need 1024); 512 keeps the
# two SMEM windows at 48 KB
WIN = 512

# f32 window rows
_F_REF_RE, _F_REF_IM, _F_ZC_RE, _F_ZC_IM, _F_CC_RE, _F_CC_IM, \
    _F_THR_M, _F_RP1_RE, _F_RP1_IM = range(9)
_NF32 = 16          # padded to a full sublane tile pair
# i32 window rows
_I_REF_E, _I_ZC_E, _I_CC_E, _I_THR_E, _I_NSI, _I_RP1_E, \
    _I_LHI, _I_LLO = range(8)
_NI32 = 8


def _kernel(scal_ref, nf32_ref, ni32_ref, dcr_ref, dci_ref, dce_ref,
            dzr_i, dzi_i, dze_i, rhi_i, rlo_i, done_i, active_i,
            wait_i, jw_i, rio_i, tst_i,
            dzr_o, dzi_o, dze_o, rhi_o, rlo_o, done_o, active_o,
            wait_o, jw_o, rio_o, tst_o,
            smf, smi, semf, semi, *, tile_h, budget, win):
    """Budget-bounded resumable lockstep-sweep kernel for ONE LA stage.

    Per-pixel state: (dz, remaining-pair, done, active/wait/jw,
    rio).  ``rio`` (ref_iter out) is −1 until the pixel DROPS, then
    the node's next_stage_la_index — the join offset for the next
    stage (or the orbit index for the tail after stage 0)."""
    shape = (tile_h, LANE)
    macro = scal_ref[0]          # sweep positions = macro-iteration count
    n_win = scal_ref[1]

    dc = HDRComplex(dcr_ref[:], dci_ref[:], dce_ref[:])

    def win_body(w, carry):
        (dzr, dzi, dze, rhi, rlo, done, active, wait, jw, rio) = carry
        base = w * win
        cf = pltpu.make_async_copy(
            nf32_ref.at[:, pl.ds(base, win)], smf, semf)
        ci = pltpu.make_async_copy(
            ni32_ref.at[:, pl.ds(base, win)], smi, semi)
        cf.start()
        ci.start()
        cf.wait()
        ci.wait()

        def step(s_local, c):
            (dzr, dzi, dze, rhi, rlo, done, active, wait, jw, rio) = c
            p = base + s_local
            # waiting pixels join the lockstep at their offset
            act_now = (wait > 0) & (jw == p)
            active = jnp.maximum(active, act_now.astype(jnp.int32))
            wait = jnp.where(act_now, 0, wait)
            live = (active > 0) & (p < macro)

            # ---- node p, broadcast from SMEM scalars ----
            ref = HDRComplex(
                jnp.full(shape, smf[_F_REF_RE, s_local], jnp.float32),
                jnp.full(shape, smf[_F_REF_IM, s_local], jnp.float32),
                jnp.full(shape, smi[_I_REF_E, s_local], jnp.int32))
            thr = HDR(
                jnp.full(shape, smf[_F_THR_M, s_local], jnp.float32),
                jnp.full(shape, smi[_I_THR_E, s_local], jnp.int32))
            lhi_s = smi[_I_LHI, s_local]
            llo_s = smi[_I_LLO, s_local]

            dz = HDRComplex(dzr, dzi, dze)
            # newdz = dz·(2·Ref + dz)   (LAInfoDeep::Prepare)
            t = hdr.complex_add(hdr.complex_mul_pow2(ref, 1), dz)
            newdz = hdr.reduce_complex(hdr.complex_mul(t, dz))
            # within budget ⇔ step_length ≤ remaining (pair compare)
            l_le_rem = (lhi_s < rhi) | ((lhi_s == rhi) & (llo_s <= rlo))
            # unreduced compare: boolean-identical to reducing first
            # (hdrfloat.lt_unreduced proof), one frexp pass cheaper
            usable = l_le_rem & hdr.lt_unreduced(
                hdr.chebychev_norm(newdz), thr)

            drop = live & ~usable
            stepx = live & usable
            # drop: park with ref_iter = NextStageLAIndex
            rio = jnp.where(drop,
                            jnp.full(shape, smi[_I_NSI, s_local],
                                     jnp.int32), rio)
            active = jnp.where(drop, 0, active)

            # ---- LA step: dz' = newdz·ZCoeff + dc·CCoeff ----
            zc = HDRComplex(
                jnp.full(shape, smf[_F_ZC_RE, s_local], jnp.float32),
                jnp.full(shape, smf[_F_ZC_IM, s_local], jnp.float32),
                jnp.full(shape, smi[_I_ZC_E, s_local], jnp.int32))
            cc = HDRComplex(
                jnp.full(shape, smf[_F_CC_RE, s_local], jnp.float32),
                jnp.full(shape, smf[_F_CC_IM, s_local], jnp.float32),
                jnp.full(shape, smi[_I_CC_E, s_local], jnp.int32))
            dz_ev = hdr.reduce_complex(hdr.complex_add(
                hdr.complex_mul(newdz, zc), hdr.complex_mul(dc, cc)))
            rp1 = HDRComplex(
                jnp.full(shape, smf[_F_RP1_RE, s_local], jnp.float32),
                jnp.full(shape, smf[_F_RP1_IM, s_local], jnp.float32),
                jnp.full(shape, smi[_I_RP1_E, s_local], jnp.int32))
            z_full = hdr.reduce_complex(hdr.complex_add(rp1, dz_ev))
            reb = hdr.lt_unreduced(
                hdr.chebychev_norm(z_full),
                hdr.chebychev_norm(dz_ev)) | \
                (p + 1 >= macro)
            dzr = jnp.where(stepx, jnp.where(reb, z_full.re, dz_ev.re),
                            dzr)
            dzi = jnp.where(stepx, jnp.where(reb, z_full.im, dz_ev.im),
                            dzi)
            dze = jnp.where(stepx, jnp.where(reb, z_full.e, dz_ev.e),
                            dze)
            # remaining -= step_length (pair subtract, borrow on lo)
            borrow = stepx & (llo_s > rlo)
            rlo = jnp.where(stepx,
                            rlo - llo_s +
                            jnp.where(borrow, jnp.int32(1 << REM_LOG),
                                      jnp.int32(0)), rlo)
            rhi = jnp.where(stepx,
                            rhi - lhi_s - borrow.astype(jnp.int32),
                            rhi)
            exhausted = stepx & (rhi == 0) & (rlo == 0)
            done = jnp.maximum(done, exhausted.astype(jnp.int32))
            reb_px = stepx & reb & ~exhausted
            # rebased pixels stall until the next sweep (j = 0)
            wait = jnp.where(reb_px, 1, wait)
            jw = jnp.where(reb_px, 0, jw)
            active = jnp.where(reb_px | exhausted, 0, active)
            return (dzr, dzi, dze, rhi, rlo, done, active, wait, jw,
                    rio)

        c = jax.lax.fori_loop(jnp.int32(0), jnp.int32(win), step, carry)
        return c

    def cond(c):
        b = c[0]
        return jnp.logical_and(b < budget, c[-1] < 1)

    def body(c):
        (b, wpos, dzr, dzi, dze, rhi, rlo, done, active, wait, jw,
         rio, _) = c
        out = win_body(wpos, (dzr, dzi, dze, rhi, rlo, done, active,
                              wait, jw, rio))
        (dzr, dzi, dze, rhi, rlo, done, active, wait, jw, rio) = out
        wpos = wpos + 1
        idle = jnp.maximum(jnp.max(active), jnp.max(wait)) < 1
        sweep_end = jnp.logical_or(wpos >= n_win, idle)
        wpos = jnp.where(sweep_end, 0, wpos)
        return (b + 1, wpos, dzr, dzi, dze, rhi, rlo, done, active,
                wait, jw, rio, idle.astype(jnp.int32))

    init = (jnp.int32(0), tst_i[0, 0],
            dzr_i[...], dzi_i[...], dze_i[...], rhi_i[...], rlo_i[...],
            done_i[...], active_i[...], wait_i[...], jw_i[...],
            rio_i[...], jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    (_, wpos, dzr, dzi, dze, rhi, rlo, done, active, wait, jw, rio,
     idle) = out
    dzr_o[...] = dzr
    dzi_o[...] = dzi
    dze_o[...] = dze
    rhi_o[...] = rhi
    rlo_o[...] = rlo
    done_o[...] = done
    active_o[...] = active
    wait_o[...] = wait
    jw_o[...] = jw
    rio_o[...] = rio
    tst_o[0, 0] = wpos
    tst_o[0, 1] = idle


@functools.partial(jax.jit, static_argnames=("tile_h", "height",
                                             "width", "budget",
                                             "win", "interpret"))
def _launch(scal, nf32, ni32, dcr, dci, dce, state, tile_h, height,
            width, budget, win, interpret):
    grid = (pl.cdiv(height, tile_h), pl.cdiv(width, LANE))
    gw = grid[1]
    kernel = functools.partial(_kernel, tile_h=tile_h, budget=budget,
                               win=win)
    tile_spec = pl.BlockSpec((tile_h, LANE), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    tscal = pl.BlockSpec((8, 128), lambda i, j: (i * gw + j, 0),
                         memory_space=pltpu.SMEM)
    n_state = 10
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        tile_spec, tile_spec, tile_spec,
    ] + [tile_spec] * n_state + [tscal]
    ph = grid[0] * tile_h
    pw = grid[1] * LANE
    n_tiles = grid[0] * grid[1]
    out_shape = (
        [jax.ShapeDtypeStruct((ph, pw), jnp.float32)] * 2 +
        [jax.ShapeDtypeStruct((ph, pw), jnp.int32)] * 8 +
        [jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.int32)])
    out_specs = [tile_spec] * n_state + [tscal]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={6 + k: k for k in range(n_state + 1)},
        scratch_shapes=[
            pltpu.SMEM((_NF32, win), jnp.float32),
            pltpu.SMEM((_NI32, win), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(scal, nf32, ni32, dcr, dci, dce, *state)
    return outs


def _stage_streams(la, arrs, s: int, win: int):
    """(nf32 [16, Npad] f32, ni32 [8, Npad] i32, macro, n_win) for
    stage s, cached on the LA table object (generation-keyed device
    cache: uploaded once, lives as long as the table)."""
    cache = getattr(la, "_stream_cache", None)
    if cache is None:
        cache = la._stream_cache = {}
    key = (s, win)
    if key in cache:
        return cache[key]
    head = int(arrs["stage_la_index"][s])
    macro = int(arrs["stage_macro_it_count"][s])
    n_win = max(1, -(-macro // win))
    npad = n_win * win
    f = np.zeros((_NF32, npad), np.float32)
    i = np.zeros((_NI32, npad), np.int32)
    m = macro
    sl = slice(head, head + m)
    f[_F_REF_RE, :m] = arrs["ref_m"][sl, 0]
    f[_F_REF_IM, :m] = arrs["ref_m"][sl, 1]
    f[_F_ZC_RE, :m] = arrs["zc_m"][sl, 0]
    f[_F_ZC_IM, :m] = arrs["zc_m"][sl, 1]
    f[_F_CC_RE, :m] = arrs["cc_m"][sl, 0]
    f[_F_CC_IM, :m] = arrs["cc_m"][sl, 1]
    f[_F_THR_M, :m] = arrs["thr_m"][sl]
    i[_I_REF_E, :m] = arrs["ref_e"][sl]
    i[_I_ZC_E, :m] = arrs["zc_e"][sl]
    i[_I_CC_E, :m] = arrs["cc_e"][sl]
    i[_I_THR_E, :m] = arrs["thr_e"][sl]
    i[_I_NSI, :m] = arrs["next_stage_la_index"][sl]
    # Ref[node+1]: each stage stores macro+1 nodes (the +1 is the
    # wrap/tail node whose ref = Z[max_ref]), so the 1-shifted slice
    # stays inside the stage (la_reference._create_la_from_orbit)
    sl1 = slice(head + 1, head + m + 1)
    f[_F_RP1_RE, :m] = arrs["ref_m"][sl1, 0]
    f[_F_RP1_IM, :m] = arrs["ref_m"][sl1, 1]
    i[_I_RP1_E, :m] = arrs["ref_e"][sl1]
    l64 = arrs["step_length"][sl].astype(np.int64)
    i[_I_LHI, :m] = (l64 >> REM_LOG).astype(np.int32)
    i[_I_LLO, :m] = (l64 & ((1 << REM_LOG) - 1)).astype(np.int32)
    # padding beyond macro: step length > any budget so a stray read
    # is never usable (p < macro already guards liveness)
    i[_I_LHI, m:] = np.int32(0x7FFFFFFF)
    out = (jnp.asarray(f), jnp.asarray(i), macro, n_win)
    cache[key] = out
    return out


def _at_skip(la, dc, shape, max_iter: int):
    """AT head skip at XLA level (ATInfo.h:157-188; identical to
    ops/la_kernel._lav2_impl's AT section).  Returns (it0 int64 np,
    dz0r, dz0i, dz0e np arrays)."""
    it0 = np.zeros(shape, np.int64)
    z0 = hdr.complex_zero(shape, jnp.float32)
    dz0r = np.asarray(z0.re)
    dz0i = np.asarray(z0.im)
    dz0e = np.asarray(z0.e)
    if not (la.use_at and la.at is not None):
        return it0, dz0r, dz0i, dz0e
    at = la.at
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

    def at_cond(s):
        i, _, _, _, active, _ = s
        return jnp.logical_and(i < at_max,
                               jnp.max(active.astype(jnp.int32)) > 0)

    def at_body(s):
        i, zr, zi, ze, active, cnt = s
        z = HDRComplex(zr, zi, ze)
        esc = hdr.gt_reduced(hdr.reduce(hdr.norm_squared(z)), sqr)
        cont = active & ~esc
        nz = hdr.reduce_complex(
            hdr.complex_add(hdr.complex_sqr(z), c_at))
        return (i + 1,
                jnp.where(cont, nz.re, zr),
                jnp.where(cont, nz.im, zi),
                jnp.where(cont, nz.e, ze),
                cont, cnt + cont.astype(jnp.int32))

    zz = hdr.complex_zero(shape, jnp.float32)
    _, zr, zi, ze, _, cnt = jax.lax.while_loop(
        at_cond, at_body,
        (jnp.int64(0) if at_max >= (1 << 31) else jnp.int32(0),
         zz.re, zz.im, zz.e, at_ok, jnp.zeros(shape, jnp.int32)))
    dz_at = hdr.reduce_complex(hdr.complex_mul(
        HDRComplex(zr, zi, ze), inv))
    ok = np.asarray(at_ok)
    it0 = np.where(ok,
                   np.asarray(cnt).astype(np.int64) *
                   np.int64(at.step_length), it0)
    dz0r = np.where(ok, np.asarray(dz_at.re), dz0r)
    dz0i = np.where(ok, np.asarray(dz_at.im), dz0i)
    dz0e = np.where(ok, np.asarray(dz_at.e), dz0e)
    return it0, dz0r, dz0i, dz0e


def la_phase_stream(results, la, ptz: PointZoomBBConverter,
                    width: int, height: int, max_iter: int,
                    tile_h: int = 64, interpret: bool = False,
                    launch_windows: int | None = None,
                    abort_monitor=None, win: int | None = None):
    """AT skip + all LA stages via streaming lockstep sweeps.

    Returns the tail-handoff dict {dzr, dzi, dze, it, jwait, done}
    consumed by perturb_stream.perturb_render_stream_rc(init_state=…)
    (engine/renderers.la_rc_render's phase-2 contract), or None when
    the table has no stages / node offsets exceed i32."""
    if win is None:
        win = WIN
    arrs = la.device_arrays(np.float32)
    S = int(arrs["stage_count"])
    if S == 0:
        return None
    if len(arrs["next_stage_la_index"]) and \
            int(arrs["next_stage_la_index"].max()) >= (1 << 31) - 1:
        return None

    dx, dy, cxo, cyo = delta_params(ptz, results.center_x,
                                    results.center_y, width, height)
    dc = _dc_grids_hdr(dx, dy, cxo, cyo, width, height, np.float32)
    shape = (height, width)
    with jax.enable_x64(False):
        it0, dz0r, dz0i, dz0e = _at_skip(la, dc, shape, max_iter)
        dc_cheb = hdr.reduce(hdr.chebychev_norm(dc))
        heads = arrs["stage_la_index"][:S]
        valid = np.zeros((S,) + shape, bool)
        for s in range(S):
            thrc0 = HDR(
                jnp.full(shape, np.float32(arrs["thrc_m"][heads[s]])),
                jnp.full(shape, np.int32(arrs["thrc_e"][heads[s]]),
                         jnp.int32))
            valid[s] = np.asarray(hdr.lt_reduced(dc_cheb, thrc0))

    grid = (-(-height // tile_h), -(-width // LANE))
    ph = grid[0] * tile_h
    pw = grid[1] * LANE
    n_tiles = grid[0] * grid[1]

    def padf(a, fill=0.0):
        out = np.full((ph, pw), fill, np.float32)
        out[:height, :width] = a
        return out

    def padi(a, fill=0):
        out = np.full((ph, pw), fill, np.int32)
        out[:height, :width] = a
        return out

    # host-side pixel state (padded)
    dzr = padf(dz0r)
    dzi = padf(dz0i)
    dze = padi(dz0e, int(hdr.MIN_BIG_EXPONENT))
    rem = np.maximum(np.int64(max_iter) - it0, 0)
    rhi = padi(rem >> REM_LOG)
    rlo = padi(rem & ((1 << REM_LOG) - 1))
    done = padi(it0 >= max_iter, 1)
    ref_iter = np.zeros((ph, pw), np.int64)

    dcr = padf(np.asarray(dc.re))
    dci = padf(np.asarray(dc.im))
    dcef = padi(np.asarray(dc.e), int(hdr.MIN_BIG_EXPONENT))

    if launch_windows is None:
        launch_windows = max(4, (4 << 20) // (win * max(1, n_tiles)))

    with jax.enable_x64(False):
        for s in reversed(range(S)):
            nf32, ni32, macro, n_win = _stage_streams(la, arrs, s,
                                                      win)
            part = (done == 0) & padi(valid[s], 0).astype(bool)
            if not part.any() or macro == 0:
                continue
            jw0 = np.clip(ref_iter, 0, macro - 1).astype(np.int32)
            scal = jnp.asarray([macro, n_win, 0, 0], jnp.int32)
            state = (jnp.asarray(dzr), jnp.asarray(dzi),
                     jnp.asarray(dze), jnp.asarray(rhi),
                     jnp.asarray(rlo), jnp.asarray(done),
                     jnp.zeros((ph, pw), jnp.int32),
                     jnp.asarray(part.astype(np.int32)),
                     jnp.asarray(np.where(part, jw0, 0)),
                     jnp.full((ph, pw), -1, jnp.int32),
                     jnp.zeros((n_tiles * 8, 128), jnp.int32))
            while True:
                state = _launch(scal, nf32, ni32,
                                jnp.asarray(dcr), jnp.asarray(dci),
                                jnp.asarray(dcef),
                                state, tile_h, height, width,
                                int(launch_windows), win, interpret)
                flags = np.asarray(state[10])[::8, 1]
                if flags.min() >= 1:
                    break
                if abort_monitor is not None and \
                        abort_monitor.aborted():
                    break
            dzr = np.asarray(state[0])
            dzi = np.asarray(state[1])
            dze = np.asarray(state[2])
            rhi = np.asarray(state[3])
            rlo = np.asarray(state[4])
            done = np.asarray(state[5])
            rio = np.asarray(state[9])
            ref_iter = np.where(rio >= 0, rio.astype(np.int64),
                                ref_iter)

    rem = (rhi.astype(np.int64) << REM_LOG) + rlo.astype(np.int64)
    it = np.int64(max_iter) - rem
    v = (slice(0, height), slice(0, width))
    return {"dzr": dzr[v], "dzi": dzi[v], "dze": dze[v],
            "it": it[v], "jwait": ref_iter[v],
            "done": done[v].astype(np.int32)}
