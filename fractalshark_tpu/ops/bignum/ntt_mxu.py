"""NTT phase transforms on the MXU: short DFTs mod p as int8 matmuls.

The four-step factorization reduces a length-n NTT to two batches of
SHORT (m = 256/512-point) transforms (ntt.fourstep_forward).  Those
short transforms are plain matrix multiplies by an [m, m] constant
matrix mod p — and the MXU runs int8 matmuls with exact int32
accumulation at near-peak rate (measured 155-180 TMAC/s on v5e at
exactly these shapes, vs the VPU's emulated-u32 butterfly passes).
This module evaluates the phase transform as chunked integer matmuls:

* every mod-p value v < 2^31 decomposes into 4 BALANCED base-256
  digits d_k in [-128, 127] (v = sum d_k 256^k) — balanced digits fit
  int8 exactly, need no offset corrections, and keep every int32
  accumulation bounded: |sum_i W_d[j,i] X_c[i]| <= m * 128 * 128,
  exact for any m <= 2^14;
* one einsum contracts all 16 (matrix-chunk x data-chunk) products on
  the MXU; the 7 diagonal planes T_k = sum_{d+c=k} S_dc are combined
  with 6 Shoup multiplies by 2^(8k) mod p per element (elementwise
  VPU work, no shuffles);
* the matrices are built host-side by running a numpy mirror of the
  exact ntt._axis0_dif / _axis0_dit butterfly chains on the identity,
  so outputs are BIT-IDENTICAL to the VPU paths (same scrambled
  ordering, same unscaled inverse) — the matrix IS the butterfly
  semantics, not a re-derivation.

Reference counterpart: the stage-fused shared-memory NTT butterflies
of ``HpSharkFloatLib/MultiplyNTT.cu:1490-1963``; the TPU-first move is
feeding the systolic array instead of hand-scheduling vector shuffles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fractalshark_tpu.ops.bignum import ntt as N

# Routing flag: checked by ntt._phase_dif/_phase_dit.  DEFAULT ON for
# TPU (the gate also requires backend == "tpu"): measured on the View
# #30 operand (16384 limbs, nfft 65536, device time via jax.profiler)
# the full orbit iteration drops 241.9 -> 151.0 us/iter (1.60x), with
# each phase kernel at ~11.5 us vs 26-58 us for the VPU sublane
# butterflies — and outputs bit-identical.  The CPU/test default stays
# the XLA stage passes; the einsum form remains directly callable.
NTT_MXU: bool = True

# Whole-iteration frequency kernel (mxu_iter_products): forward +
# pointwise + inverse as ONE Pallas kernel.  Subsumes the per-phase
# routing for iterate_z/multiply_iter when enabled.  A/B at the View
# #30 operand (16384 limbs, 2048-step chunks, identical checksums):
# 0.231 wall / 0.154 device ms/iter (4 phase kernels + XLA glue) →
# 0.181 wall / 0.104 device.  Default ON (gate requires TPU backend).
MXU_ITER: bool = True

# Fully fused iterate kernel (mxu_iterate_full): frequency products +
# CRT/carry tail + shadow emission in ONE kernel per iteration.
MXU_ITER_FULL: bool = False

_CHUNKS = 4          # balanced base-256 digits per mod-p value
_DIAGS = 2 * _CHUNKS - 1


def use_iter_kernel(n: int) -> bool:
    if not (MXU_ITER and NTT_MXU):
        return False
    if NTT_MXU != "force" and jax.default_backend() != "tpu":
        return False
    return iter_kernel_supported(n)


@functools.lru_cache(maxsize=32)
def _phase_matrix(m: int, prime_idx: int, inverse: bool) -> np.ndarray:
    """[m, m] uint32 matrix M with out = M @ x (mod p) bit-identical to
    ntt._axis0_dif (forward: natural -> bit-reversed) / _axis0_dit
    (inverse: bit-reversed -> natural, unscaled).  Built by running the
    butterfly chain itself on the identity matrix in exact u64 numpy."""
    p = (N.P1, N.P2)[prime_idx]
    g = (N.G1, N.G2)[prime_idx]
    wm = pow(g, (p - 1) // m, p)
    if inverse:
        wm = pow(wm, p - 2, p)
    roots = np.empty(m // 2, np.uint64)
    wk = 1
    for k in range(m // 2):
        roots[k] = wk
        wk = wk * wm % p
    stages = m.bit_length() - 1
    pu = np.uint64(p)
    y = np.eye(m, dtype=np.uint64)      # columns = basis vectors
    for s in range(stages):
        if inverse:
            hm = 1 << s
            idx = np.arange(hm) << (stages - 1 - s)
            w = roots[idx][None, :, None]
            y4 = y.reshape(m >> (s + 1), 2, hm, m)
            a, b = y4[:, 0], y4[:, 1]
            u = (b * w) % pu
            y = np.stack([(a + u) % pu, (a + pu - u) % pu],
                         axis=1).reshape(m, m)
        else:
            hm = m >> (s + 1)
            idx = np.arange(hm) << s
            w = roots[idx][None, :, None]
            y4 = y.reshape(1 << s, 2, hm, m)
            a, b = y4[:, 0], y4[:, 1]
            y = np.stack([(a + b) % pu, ((a + pu - b) % pu * w) % pu],
                         axis=1).reshape(m, m)
    return y.astype(np.uint32)


def _balanced_int8_np(a: np.ndarray) -> np.ndarray:
    """Balanced base-256 digits of uint32 values < 2^31:
    [4, ...] int8 with value = sum d_k 256^k, |d_k| <= 128."""
    v = a.astype(np.int64)
    out = []
    for _ in range(_CHUNKS):
        c = v & 255
        d = np.where(c >= 128, c - 256, c)
        out.append(d.astype(np.int8))
        v = (v - d) >> 8
    assert (v == 0).all(), "value exceeded 4 balanced base-256 digits"
    return np.stack(out)


@functools.lru_cache(maxsize=32)
def _matrix_chunks(m: int, prime_idx: int, inverse: bool) -> np.ndarray:
    """int8 [4, m, m] balanced digits of the phase matrix."""
    return _balanced_int8_np(_phase_matrix(m, prime_idx, inverse))


@functools.lru_cache(maxsize=8)
def _recombine_consts(rows: int):
    """Shoup pairs (value, precomp) of R_k = 2^(8k) mod p for
    k = 1..6, shaped [rows, DIAGS-1, 1, 1] to broadcast over
    [rows, m, L] planes (row r uses prime r%2)."""
    w = np.empty((rows, _DIAGS - 1), np.uint32)
    wp = np.empty((rows, _DIAGS - 1), np.uint32)
    for r in range(rows):
        p = (N.P1, N.P2)[r % 2]
        for k in range(1, _DIAGS):
            v = pow(256, k, p)
            w[r, k - 1] = v
            wp[r, k - 1] = (v << 32) // p
    return w[:, :, None, None], wp[:, :, None, None]


def _balanced_chunks(y):
    """Device balanced base-256 decomposition: uint32 [..., ] < p ->
    int8 [4, ...].  Top digit stays <= 127 because values are
    canonical residues (p <= P1 < 2^31 - 2^24)."""
    v = y.astype(jnp.int32)
    chunks = []
    for _ in range(_CHUNKS):
        c = v & 255
        adj = (c >= 128).astype(jnp.int32)
        d = c - (adj << 8)
        chunks.append(d.astype(jnp.int8))
        v = (v >> 8) + adj
    return jnp.stack(chunks)


def supported(m: int, rows: int) -> bool:
    return (m & (m - 1)) == 0 and 8 <= m <= 4096 and rows % 2 == 0


def mxu_transform(y, *, m: int, inverse: bool):
    """Phase transform of [R, m, L] uint32 (row r in prime r%2) along
    axis 1 — bit-identical to ntt._axis0_dif / _axis0_dit.  Routes to
    the fused Pallas kernel on TPU (dots + diagonal recombination in
    one VMEM-resident kernel); elsewhere the XLA einsum form."""
    if (jax.default_backend() == "tpu" and m % 8 == 0
            and (y.shape[0] // 2) * y.shape[2] % 128 == 0):
        return mxu_transform_pallas(y, m=m, inverse=inverse)
    return mxu_transform_xla(y, m=m, inverse=inverse)


def mxu_transform_xla(y, *, m: int, inverse: bool):
    """XLA einsum form: correct everywhere, but materializes all 16
    int32 chunk-product planes in HBM — the Pallas form exists to keep
    them in VMEM."""
    rows, m_, L = y.shape
    assert m_ == m and supported(m, rows)
    # [2, 4, m, m] int8: matrices for both primes
    M8 = jnp.asarray(np.stack(
        [_matrix_chunks(m, g, inverse) for g in range(2)]))
    # group rows by prime: [Rg, 2, m, L] -> [2, Rg, m, L]
    rg = rows // 2
    yg = y.reshape(rg, 2, m, L).transpose(1, 0, 2, 3)
    y8 = _balanced_chunks(yg)                    # [4, 2, Rg, m, L]
    # S[g, d, c, r, j, l] = sum_i M8[g, d, j, i] * y8[c, g, r, i, l]
    s = jnp.einsum("gdji,cgril->gdcrjl", M8, y8,
                   preferred_element_type=jnp.int32)
    # diagonal planes T_k = sum_{d+c=k} S_dc ; |T_k| <= 4*m*2^14 < p
    diags = []
    for k in range(_DIAGS):
        t = None
        for d in range(_CHUNKS):
            c = k - d
            if 0 <= c < _CHUNKS:
                t = s[:, d, c] if t is None else t + s[:, d, c]
        diags.append(t)
    t = jnp.stack(diags, axis=2)                 # [2, Rg, 7, m, L]
    # back to row-interleaved [R, 7, m, L]
    t = t.transpose(1, 0, 2, 3, 4).reshape(rows, _DIAGS, m, L)
    p_col, _ = N._row_consts(rows)
    pc = p_col[:, :, None, None]                 # [R, 1, 1, 1]
    u = jnp.where(t < 0, t + pc.astype(jnp.int32), t).astype(jnp.uint32)
    w, wp = _recombine_consts(rows)
    acc = u[:, 0]
    pc3 = p_col[:, :, None]
    for k in range(1, _DIAGS):
        term = N._shoup_mul(u[:, k], jnp.asarray(w[:, k - 1]),
                            jnp.asarray(wp[:, k - 1]), pc3)
        acc = N._mod_add_rows(acc, term, pc3)
    return acc


# ---------------------------------------------------------------------------
# Fused Pallas form: all 16 MXU dots + diagonal recombination in ONE
# kernel, so the int32 product planes live only in VMEM (the XLA form
# round-trips ~67 MB of them through HBM per phase at the View #30
# operand — more than the entire compute saving).  Grid = the 2 primes.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _misc_np():
    """[2, 16, 1] uint32: row 0 = p; rows 1..6 = w_k = 2^(8k) mod p;
    rows 7..12 = Shoup precomps of w_k (k = 1..6)."""
    t = np.zeros((2, 16, 1), np.uint32)
    for g, p in enumerate((N.P1, N.P2)):
        t[g, 0, 0] = p
        for k in range(1, _DIAGS):
            v = pow(256, k, p)
            t[g, k, 0] = v
            t[g, 6 + k, 0] = (v << 32) // p
    return t


def _mxu_phase_kernel(y8_ref, m8_ref, misc_ref, o_ref):
    from fractalshark_tpu.ops.bignum.ntt_pallas import _madd, _smul
    p = misc_ref[0, 0:1, :]                       # [1, NL] u32
    pi = p.astype(jnp.int32)
    acc = None
    for k in range(_DIAGS):
        t = None
        for d in range(_CHUNKS):
            c = k - d
            if 0 <= c < _CHUNKS:
                s = jax.lax.dot_general(
                    m8_ref[0, d], y8_ref[0, c],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                t = s if t is None else t + s
        u = jnp.where(t < 0, t + pi, t).astype(jnp.uint32)
        if k == 0:
            acc = u
        else:
            w = misc_ref[0, k:k + 1, :]           # [1, NL]
            wp = misc_ref[0, 6 + k:7 + k, :]
            acc = _madd(acc, _smul(u, w, wp, p), p)
    o_ref[0] = acc


_Z0 = np.int32(0)


@functools.partial(jax.jit, static_argnames=("m", "inverse",
                                             "interpret"))
def mxu_transform_pallas(y, *, m: int, inverse: bool,
                         interpret: bool = False):
    """Bit-identical to mxu_transform_xla; TPU production form."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, m_, L = y.shape
    assert m_ == m and supported(m, rows)
    rg = rows // 2
    nl = rg * L
    M8 = jnp.asarray(np.stack(
        [_matrix_chunks(m, g, inverse) for g in range(2)]))
    yg = y.reshape(rg, 2, m, L).transpose(1, 0, 2, 3)
    y8 = _balanced_chunks(yg)                     # [4, 2, Rg, m, L]
    # N dim = (r, l): [2, 4, m, Rg*L]
    y8 = y8.transpose(1, 0, 3, 2, 4).reshape(2, _CHUNKS, m, nl)
    misc = jnp.broadcast_to(jnp.asarray(_misc_np()), (2, 16, nl))
    cp = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
    out = pl.pallas_call(
        _mxu_phase_kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, _CHUNKS, m, nl),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, m, m),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, 16, nl), lambda g: (g, _Z0, _Z0)),
        ],
        out_specs=pl.BlockSpec((1, m, nl), lambda g: (g, _Z0, _Z0)),
        out_shape=jax.ShapeDtypeStruct((2, m, nl), jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(y8, M8, misc)
    # [2, m, Rg, L] -> row-interleaved [R, m, L]
    out = out.reshape(2, m, rg, L).transpose(2, 0, 1, 3)
    return out.reshape(rows, m, L)


# ---------------------------------------------------------------------------
# Whole-iteration frequency kernel: the ENTIRE frequency-domain part of
# one orbit multiply (forward four-step of x and y, T1 twiddles,
# Montgomery pointwise x²−y² / x·y, inverse four-step, n⁻¹·R scale) as
# ONE Pallas kernel, grid over the 2 CRT primes.  The four-step's
# physical transposes disappear: the second/third phases contract along
# LANES against pre-transposed matrices (U·Mᵀ is still one MXU matmul),
# so data stays in the [n1 sublanes, n2 lanes] layout end to end.
# Replaces per multiply: 4 phase-kernel launches + 4 XLA balanced-chunk
# decompositions + 2 transposes + 2 T1 passes + 3 Montgomery pointwise
# passes + the scale pass (each a [4, nfft] HBM round trip) — measured
# 0.231 ms/iter wall vs 0.154 device at 16384 limbs, i.e. ~1/3 of the
# iteration was XLA glue + inter-op bubbles.
# Reference counterpart: MultiplyNTT.cu runs its whole pipeline inside
# one cooperative kernel (`HpSharkFloatLib/MultiplyNTT.cu:47-153`).
# ---------------------------------------------------------------------------

# Input digits are base-2^16 (< 2^16), so 3 balanced base-256 chunks
# suffice for the first forward phase (top chunk ∈ {0, 1}).
_IN_CHUNKS = 3


@functools.lru_cache(maxsize=8)
def _matrix_chunks_t(m: int, prime_idx: int, inverse: bool) -> np.ndarray:
    """int8 [4, m, m] balanced digits of the TRANSPOSED phase matrix
    (for lane-contracting applications out = U · Mᵀ)."""
    return _balanced_int8_np(
        np.ascontiguousarray(_phase_matrix(m, prime_idx, inverse).T))


@functools.lru_cache(maxsize=8)
def _iter_tables(n: int):
    """Numpy constant operands for the whole-iteration kernel."""
    n1, n2 = N._split_n(n)
    mf1 = np.stack([_matrix_chunks(n1, g, False) for g in range(2)])
    mf2t = np.stack([_matrix_chunks_t(n2, g, False) for g in range(2)])
    mi2t = np.stack([_matrix_chunks_t(n2, g, True) for g in range(2)])
    mi1 = np.stack([_matrix_chunks(n1, g, True) for g in range(2)])
    c = N._fourstep_consts(n, 2)
    t1, t1p = c["t1"]
    t1i, t1ip = c["t1i"]
    t1s = np.stack([t1, t1p, t1i, t1ip], axis=1).astype(np.uint32)
    misc = np.zeros((2, 16, 1), np.uint32)
    for g, p in enumerate((N.P1, N.P2)):
        misc[g, 0, 0] = p
        for k in range(1, _DIAGS):
            v = pow(256, k, p)
            misc[g, k, 0] = v
            misc[g, 6 + k, 0] = (v << 32) // p
        misc[g, 13, 0] = N._MONT[p][0]              # -p^-1 mod 2^32
        sc = pow(n, p - 2, p) * (1 << 32) % p        # n^-1 · R
        misc[g, 14, 0] = sc
        misc[g, 15, 0] = (sc << 32) // p
    return mf1, mf2t, mi2t, mi1, t1s, misc


def _chunk8_ker(u, chunks: int = _CHUNKS):
    """In-kernel balanced base-256 chunks of u32 canonical residues
    (chunks=3 suffices for base-2^16 digit inputs)."""
    v = u.astype(jnp.int32)
    out = []
    for _ in range(chunks):
        c = v & 255
        adj = jnp.where(c >= 128, jnp.int32(1), jnp.int32(0))
        out.append((c - (adj << 8)).astype(jnp.int8))
        v = (v >> 8) + adj
    return out


# Smallest supported prime: static pairing bounds compare against this
# (a unit whose worst-case |value| stays below it needs no extra
# canonicalization fixups).
_MIN_P = min(N.P1, N.P2)


def _apply_ker(get_m, x8, p, pi, get_w, lane_contract: bool):
    """One phase transform inside the kernel: chunked MXU dots +
    diagonal Shoup recombination.  get_m(d): [m, m] int8 matrix chunk
    (pre-transposed when lane_contract); x8: list of [n1, n2] int8
    chunk planes; get_w(k): the (w, wp) Shoup pair of 2^(8k) mod p;
    returns [n1out, n2out] u32 canonical residues.

    DIAGONAL PAIRING: the Shoup recombination is the kernel's VPU hot
    spot (measured 22.5 of 52.9 µs/iter at the View #30 operand), so
    adjacent diagonals merge into t_k + 256·t_{k+1} — ONE mulmod per
    pair — wherever the worst-case bound B_k + 256·B_{k+1} provably
    fits int32 (B_k = terms·K·128², exact for balanced int8 chunks).
    The merge is exact integer arithmetic, so the canonical result is
    bit-identical."""
    return _apply_ker_multi(((get_m, x8),), p, pi, get_w,
                            lane_contract)


def _apply_ker_multi(streams, p, pi, get_w, lane_contract: bool):
    """_apply_ker over several (get_m, x8) pairs summing into SHARED
    diagonals before one recombination — the paired-digit phases
    contract even/odd coefficient halves against column-split
    matrices but pay the Shoup recombination once.  Diagonal bounds
    stay exact: each stream adds K_s·128² per contributing term."""
    from fractalshark_tpu.ops.bignum.ntt_pallas import _madd, _smul
    nd = _CHUNKS + max(len(x8) for _, x8 in streams) - 1
    diags = []
    bounds = []
    for k in range(nd):
        t = None
        bound = 0
        for get_m, x8 in streams:
            nx = len(x8)
            K = x8[0].shape[1] if lane_contract else x8[0].shape[0]
            for d in range(_CHUNKS):
                c = k - d
                if 0 <= c < nx:
                    bound += K * 128 * 128
                    if lane_contract:
                        s = jax.lax.dot_general(
                            x8[c], get_m(d), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                    else:
                        s = jax.lax.dot_general(
                            get_m(d), x8[c], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                    t = s if t is None else t + s
        diags.append(t)
        bounds.append(bound)
    # greedy exact-bound pairing (static: bounds are trace-time ints)
    units = []                         # (base_k, t_plane, bound)
    k = 0
    while k < nd:
        if k + 1 < nd and bounds[k] + 256 * bounds[k + 1] <= 2**31 - 1:
            units.append((k, diags[k] + diags[k + 1] * jnp.int32(256),
                          bounds[k] + 256 * bounds[k + 1]))
            k += 2
        else:
            units.append((k, diags[k], bounds[k]))
            k += 1
    acc = None
    for base, t, bound in units:
        u = jnp.where(t < 0, t + pi, t)
        if bound >= _MIN_P:
            # paired values can exceed p: finish canonicalizing
            # (bound < 2^31 < 2p, so one more add + one sub suffice)
            u = jnp.where(u < 0, u + pi, u)
            u = jnp.where(u >= pi, u - pi, u)
        u = u.astype(jnp.uint32)
        if base == 0 and acc is None:
            acc = u
        else:
            w, wp = get_w(base)
            acc = _madd(acc, _smul(u, w, wp, p), p)
    return acc


def _freq_products(g, xg_ref, mf1_ref, mf2t_ref, mi2t_ref, mi1_ref,
                   t1_ref, misc_ref):
    """In-kernel frequency-domain products for prime g: returns
    (d, xy) [n1, n2] u32 planes.  Refs are indexed [g, ...] so the
    same body serves the gridded (leading block dim 1) and whole-array
    (leading dim 2) forms.

    xg_ref: [2, n1h, n2] u32 UNPADDED digit planes (n1h = D/n2 rows).
    The zero padding never materializes: the phase-1 matrices arrive
    host-sliced to [n1, n1h] (the padded rows contribute exactly 0 to
    every dot), and the balanced chunking runs in-kernel (3 chunks —
    inputs are base-2^16 digits)."""
    from fractalshark_tpu.ops.bignum.ntt_pallas import _mont, _msub, _smul
    p = misc_ref[g, 0:1, :]
    pi = p.astype(jnp.int32)
    pp = misc_ref[g, 13:14, :]
    sc = misc_ref[g, 14:15, :]
    scp = misc_ref[g, 15:16, :]

    def get_w(k):
        return misc_ref[g, k:k + 1, :], misc_ref[g, 6 + k:7 + k, :]

    def mats(ref):
        return lambda d: ref[g, d]

    f = []
    for v in range(2):                               # x then y
        x8 = _chunk8_ker(xg_ref[v], _IN_CHUNKS)
        b = _apply_ker(mats(mf1_ref), x8, p, pi, get_w, False)
        b = _smul(b, t1_ref[g, 0], t1_ref[g, 1], p)
        f.append(_apply_ker(mats(mf2t_ref), _chunk8_ker(b), p, pi,
                            get_w, True))
    fx, fy = f
    xx = _mont(fx, fx, p, pp)
    yy = _mont(fy, fy, p, pp)
    outs = []
    for prod in (_msub(xx, yy, p), _mont(fx, fy, p, pp)):
        u = _apply_ker(mats(mi2t_ref), _chunk8_ker(prod), p, pi,
                       get_w, True)
        u = _smul(u, t1_ref[g, 2], t1_ref[g, 3], p)
        a = _apply_ker(mats(mi1_ref), _chunk8_ker(u), p, pi, get_w,
                       False)
        outs.append(_smul(a, sc, scp, p))
    return outs                                      # d, xy


def _freq_products_nr(g, xg_ref, sgn_ref, mf1_ref, mf2t_ref, mi2t_ref,
                      mi1_ref, t1_ref, misc_ref):
    """NR variant: xg_ref [4, n1h, n2] u32 magnitudes (x, y, dx, dy),
    sgn_ref i32[4] SMEM signs applied in the SPECTRUM domain
    (iterate_z_nr's fneg semantics).  Returns (d, xy, u, v) planes:
    d = x²−y², xy = x·y, u = x·dx − y·dy, v = x·dy + y·dx."""
    from fractalshark_tpu.ops.bignum.ntt_pallas import (_madd, _mont,
                                                        _msub, _smul)
    p = misc_ref[g, 0:1, :]
    pi = p.astype(jnp.int32)
    pp = misc_ref[g, 13:14, :]
    sc = misc_ref[g, 14:15, :]
    scp = misc_ref[g, 15:16, :]

    def get_w(k):
        return misc_ref[g, k:k + 1, :], misc_ref[g, 6 + k:7 + k, :]

    def mats(ref):
        return lambda d: ref[g, d]

    f = []
    for v in range(4):                       # x, y, dx, dy
        x8 = _chunk8_ker(xg_ref[v], _IN_CHUNKS)
        b = _apply_ker(mats(mf1_ref), x8, p, pi, get_w, False)
        b = _smul(b, t1_ref[g, 0], t1_ref[g, 1], p)
        fv = _apply_ker(mats(mf2t_ref), _chunk8_ker(b), p, pi,
                        get_w, True)
        neg = jnp.where(fv == jnp.uint32(0), fv, p - fv)
        f.append(jnp.where(sgn_ref[v] < 0, neg, fv))
    fx, fy, fdx, fdy = f

    def mm(a, b):
        return _mont(a, b, p, pp)

    prods = (_msub(mm(fx, fx), mm(fy, fy), p), mm(fx, fy),
             _msub(mm(fx, fdx), mm(fy, fdy), p),
             _madd(mm(fx, fdy), mm(fy, fdx), p))
    outs = []
    for prod in prods:
        u = _apply_ker(mats(mi2t_ref), _chunk8_ker(prod), p, pi,
                       get_w, True)
        u = _smul(u, t1_ref[g, 2], t1_ref[g, 3], p)
        a = _apply_ker(mats(mi1_ref), _chunk8_ker(u), p, pi, get_w,
                       False)
        outs.append(_smul(a, sc, scp, p))
    return outs                              # d, xy, u, v


def _nr_kernel(xg_ref, sgn_ref, mf1_ref, mf2t_ref, mi2t_ref, mi1_ref,
               t1_ref, misc_ref, o_ref):
    outs = _freq_products_nr(0, xg_ref, sgn_ref, mf1_ref, mf2t_ref,
                             mi2t_ref, mi1_ref, t1_ref, misc_ref)
    for i, a in enumerate(outs):
        o_ref[i, 0] = a


@functools.partial(jax.jit, static_argnames=("n", "interpret",
                                             "in_digits"))
def mxu_nr_products(x, y, dx, dy, signs, *, n: int,
                    interpret: bool = False,
                    in_digits: int | None = None):
    """[8, n] u32 rows (d, xy, u, v per prime, row-interleaved):
    bit-identical to iterate_z_nr's XLA four-step chain (forward 8
    rows, spectrum-domain sign negation, Montgomery cross products,
    scaled inverse).  signs: i32[4] (sx, sy, sdx, sdy)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert iter_kernel_supported(n)
    n1, n2 = N._split_n(n)
    if in_digits is None:
        n1h = n1
    else:
        n1h = in_digits // n2
        assert n1h * n2 == in_digits and 0 < n1h <= n1
    mf1, mf2t, mi2t, mi1, t1s, misc = _iter_tables(n)
    mf1 = mf1[:, :, :, :n1h]
    xg = jnp.stack([x, y, dx, dy]).reshape(4, n1h, n2)
    miscb = jnp.broadcast_to(jnp.asarray(misc), (2, 16, n2))
    cp = pltpu.CompilerParams(vmem_limit_bytes=110 << 20)
    out = pl.pallas_call(
        _nr_kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((4, n1h, n2), lambda g: (_Z0, _Z0, _Z0)),
            pl.BlockSpec((4,), lambda g: (_Z0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _CHUNKS, n1, n1h),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, n2, n2),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, n2, n2),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, n1, n1),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, 4, n1, n2), lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, 16, n2), lambda g: (g, _Z0, _Z0)),
        ],
        out_specs=pl.BlockSpec((4, 1, n1, n2),
                               lambda g: (_Z0, g, _Z0, _Z0)),
        out_shape=jax.ShapeDtypeStruct((4, 2, n1, n2), jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(xg, jnp.asarray(signs, jnp.int32), jnp.asarray(mf1),
      jnp.asarray(mf2t), jnp.asarray(mi2t), jnp.asarray(mi1),
      jnp.asarray(t1s), miscb)
    return out.reshape(8, n)


def _iter_kernel(xg_ref, mf1_ref, mf2t_ref, mi2t_ref, mi1_ref,
                 t1_ref, misc_ref, o_ref):
    d, xy = _freq_products(0, xg_ref, mf1_ref, mf2t_ref, mi2t_ref,
                           mi1_ref, t1_ref, misc_ref)
    o_ref[0, 0] = d
    o_ref[1, 0] = xy


def iter_kernel_supported(n: int) -> bool:
    if n & (n - 1) or n < 8192:
        return False
    n1, n2 = N._split_n(n)
    return n1 % 8 == 0 and n2 % 128 == 0 and 8 <= n1 <= 4096 \
        and n2 <= 4096


@functools.partial(jax.jit, static_argnames=("n", "interpret",
                                             "in_digits"))
def mxu_iter_products(vx, vy, *, n: int, interpret: bool = False,
                      in_digits: int | None = None):
    """[4, n] u32 rows (d_p1, d_p2, xy_p1, xy_p2): bit-identical to
    fourstep_forward → Montgomery pointwise → fourstep_inverse_scaled
    (extra_scale_r=True) on stacked [vx, vx, vy, vy].

    in_digits: when given, vx/vy are UNPADDED [in_digits] digit
    vectors — the zero padding never materializes (half-depth phase-1
    dots against host-sliced matrices)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert iter_kernel_supported(n)
    n1, n2 = N._split_n(n)
    if in_digits is None:
        n1h = n1
    else:
        n1h = in_digits // n2
        assert n1h * n2 == in_digits and 0 < n1h <= n1
    mf1, mf2t, mi2t, mi1, t1s, misc = _iter_tables(n)
    mf1 = mf1[:, :, :, :n1h]
    xg = jnp.stack([vx, vy]).reshape(2, n1h, n2)
    miscb = jnp.broadcast_to(jnp.asarray(misc), (2, 16, n2))
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
    out = pl.pallas_call(
        _iter_kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((2, n1h, n2),
                         lambda g: (_Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, n1, n1h),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, n2, n2),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, n2, n2),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, _CHUNKS, n1, n1),
                         lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, 4, n1, n2), lambda g: (g, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, 16, n2), lambda g: (g, _Z0, _Z0)),
        ],
        out_specs=pl.BlockSpec((2, 1, n1, n2),
                               lambda g: (_Z0, g, _Z0, _Z0)),
        out_shape=jax.ShapeDtypeStruct((2, 2, n1, n2), jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(xg, jnp.asarray(mf1), jnp.asarray(mf2t), jnp.asarray(mi2t),
      jnp.asarray(mi1), jnp.asarray(t1s), miscb)
    return out.reshape(4, n)


# ---------------------------------------------------------------------------
# Paired-digit product kernels: the even/odd coefficient deinterleave
# the base-2^32 tail needs, absorbed into the phase MATRICES (host-side
# column/row splits — free), so inputs are PACKED u32 digit pairs and
# outputs are (even-half ‖ odd-half) coefficient rows.  The MXU work is
# unchanged (two half-width dots replace each full dot); only the
# in-kernel unpack (2 VPU ops) is new.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _iter_tables_paired(n: int):
    """_iter_tables plus the even/odd splits: forward phase-2 rows
    (input-coefficient parity), inverse phase-2 columns and both T1
    twiddle lane sets (output-coefficient parity)."""
    mf1, mf2t, mi2t, mi1, t1s, misc = _iter_tables(n)

    def c(a):
        return np.ascontiguousarray(a)

    return (mf1, c(mf2t[:, :, 0::2, :]), c(mf2t[:, :, 1::2, :]),
            c(mi2t[:, :, :, 0::2]), c(mi2t[:, :, :, 1::2]), mi1,
            c(t1s[:, :, :, 0::2]), c(t1s[:, :, :, 1::2]), misc)


def paired_kernel_supported(n: int, in_digits: int) -> bool:
    """The paired kernels need the four-step lane width n2 to split
    into two register-aligned halves (n2 % 256) and whole pair rows in
    the tail planes (n % 256) — true for nfft ≥ 32768, i.e. the
    deep-zoom operand sizes where the tail dominates."""
    if not iter_kernel_supported(n):
        return False
    n1, n2 = N._split_n(n)
    return (n2 % 256 == 0 and n % 256 == 0 and in_digits % 2 == 0
            and in_digits % n2 == 0)


def _freq_products_paired(g, xg_ref, mf1_ref, mf2te_ref, mf2to_ref,
                          mi2te_ref, mi2to_ref, mi1_ref, t1e_ref,
                          t1o_ref, misc_ref, nvals: int,
                          sgn_ref=None):
    """_freq_products/_freq_products_nr on PACKED pair planes: xg_ref
    [nvals, n1h, n2/2] u32 packed digit pairs; returns the product
    coefficient planes as (even, odd) pairs of [n1, n2/2].  Identical
    spectrum values (the even/odd split is exact in the matrices), so
    the products are bit-identical to the unpaired kernels up to the
    free output deinterleave."""
    from fractalshark_tpu.ops.bignum.ntt_pallas import (_madd, _mont,
                                                        _msub, _smul)
    p = misc_ref[g, 0:1, :]
    pi = p.astype(jnp.int32)
    pp = misc_ref[g, 13:14, :]
    n2h = xg_ref.shape[-1]
    ph = p[:, :n2h]
    pih = pi[:, :n2h]
    sch = misc_ref[g, 14:15, :n2h]
    scph = misc_ref[g, 15:16, :n2h]

    def get_w(k):
        return misc_ref[g, k:k + 1, :], misc_ref[g, 6 + k:7 + k, :]

    def get_wh(k):
        return (misc_ref[g, k:k + 1, :n2h],
                misc_ref[g, 6 + k:7 + k, :n2h])

    def mats(ref):
        return lambda d: ref[g, d]

    f = []
    for v in range(nvals):
        pk = xg_ref[v]
        for half, tcol in ((pk & jnp.uint32(0xFFFF), 0), (pk >> 16, 1)):
            x8 = _chunk8_ker(half, _IN_CHUNKS)
            b = _apply_ker(mats(mf1_ref), x8, ph, pih, get_wh, False)
            tref = (t1e_ref, t1o_ref)[tcol]
            if tcol == 0:
                be = _smul(b, tref[g, 0], tref[g, 1], ph)
            else:
                bo = _smul(b, tref[g, 0], tref[g, 1], ph)
        fv = _apply_ker_multi(
            ((mats(mf2te_ref), _chunk8_ker(be)),
             (mats(mf2to_ref), _chunk8_ker(bo))), p, pi, get_w, True)
        if sgn_ref is not None:
            neg = jnp.where(fv == jnp.uint32(0), fv, p - fv)
            fv = jnp.where(sgn_ref[v] < 0, neg, fv)
        f.append(fv)

    def mm(a, b):
        return _mont(a, b, p, pp)

    if nvals == 2:
        fx, fy = f
        prods = (_msub(mm(fx, fx), mm(fy, fy), p), mm(fx, fy))
    else:
        fx, fy, fdx, fdy = f
        prods = (_msub(mm(fx, fx), mm(fy, fy), p), mm(fx, fy),
                 _msub(mm(fx, fdx), mm(fy, fdy), p),
                 _madd(mm(fx, fdy), mm(fy, fdx), p))
    outs = []
    for prod in prods:
        c8 = _chunk8_ker(prod)
        eo = []
        for mref, tc in ((mi2te_ref, 0), (mi2to_ref, 1)):
            u = _apply_ker(mats(mref), c8, ph, pih, get_wh, True)
            tref = (t1e_ref, t1o_ref)[tc]
            u = _smul(u, tref[g, 2], tref[g, 3], ph)
            a = _apply_ker(mats(mi1_ref), _chunk8_ker(u), ph, pih,
                           get_wh, False)
            eo.append(_smul(a, sch, scph, ph))
        outs.append(tuple(eo))
    return outs


def _iter_paired_kernel(xg_ref, mf1_ref, mf2te_ref, mf2to_ref,
                        mi2te_ref, mi2to_ref, mi1_ref, t1e_ref,
                        t1o_ref, misc_ref, o_ref):
    outs = _freq_products_paired(0, xg_ref, mf1_ref, mf2te_ref,
                                 mf2to_ref, mi2te_ref, mi2to_ref,
                                 mi1_ref, t1e_ref, t1o_ref, misc_ref,
                                 2)
    for i, (ae, ao) in enumerate(outs):
        o_ref[i, 0, 0] = ae
        o_ref[i, 0, 1] = ao


def _nr_paired_kernel(xg_ref, sgn_ref, mf1_ref, mf2te_ref, mf2to_ref,
                      mi2te_ref, mi2to_ref, mi1_ref, t1e_ref,
                      t1o_ref, misc_ref, o_ref):
    outs = _freq_products_paired(0, xg_ref, mf1_ref, mf2te_ref,
                                 mf2to_ref, mi2te_ref, mi2to_ref,
                                 mi1_ref, t1e_ref, t1o_ref, misc_ref,
                                 4, sgn_ref=sgn_ref)
    for i, (ae, ao) in enumerate(outs):
        o_ref[i, 0, 0] = ae
        o_ref[i, 0, 1] = ao


def _paired_call(kernel, xg, nvals, n, n1h, interpret, signs=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = N._split_n(n)
    n2h = n2 // 2
    (mf1, mf2te, mf2to, mi2te, mi2to, mi1, t1e, t1o,
     misc) = _iter_tables_paired(n)
    mf1 = mf1[:, :, :, :n1h]
    miscb = jnp.broadcast_to(jnp.asarray(misc), (2, 16, n2))
    K = 2 if nvals == 2 else 4  # product rows per prime
    specs = [pl.BlockSpec((nvals, n1h, n2h),
                          lambda g: (_Z0, _Z0, _Z0))]
    args = [xg]
    if signs is not None:
        specs.append(pl.BlockSpec((4,), lambda g: (_Z0,),
                                  memory_space=pltpu.SMEM))
        args.append(jnp.asarray(signs, jnp.int32))
    specs += [
        pl.BlockSpec((1, _CHUNKS, n1, n1h),
                     lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, _CHUNKS, n2h, n2),
                     lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, _CHUNKS, n2h, n2),
                     lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, _CHUNKS, n2, n2h),
                     lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, _CHUNKS, n2, n2h),
                     lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, _CHUNKS, n1, n1),
                     lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, 4, n1, n2h), lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, 4, n1, n2h), lambda g: (g, _Z0, _Z0, _Z0)),
        pl.BlockSpec((1, 16, n2), lambda g: (g, _Z0, _Z0)),
    ]
    args += [jnp.asarray(mf1), jnp.asarray(mf2te), jnp.asarray(mf2to),
             jnp.asarray(mi2te), jnp.asarray(mi2to), jnp.asarray(mi1),
             jnp.asarray(t1e), jnp.asarray(t1o), miscb]
    cp = pltpu.CompilerParams(vmem_limit_bytes=110 << 20)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=specs,
        out_specs=pl.BlockSpec((K, 1, 2, n1, n2h),
                               lambda g: (_Z0, g, _Z0, _Z0, _Z0)),
        out_shape=jax.ShapeDtypeStruct((K, 2, 2, n1, n2h),
                                       jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(*args)
    return out.reshape(2 * K, n)


@functools.partial(jax.jit, static_argnames=("n", "interpret",
                                             "in_digits"))
def mxu_iter_products_paired(xp, yp, *, n: int,
                             interpret: bool = False,
                             in_digits: int | None = None):
    """[4, n] u32 rows (d_p1, d_p2, xy_p1, xy_p2) with each row laid
    out as even-coefficient half ‖ odd-coefficient half — the same
    values as mxu_iter_products up to that (matrix-absorbed)
    deinterleave.  xp/yp are PACKED base-2^32 digit-pair vectors
    [in_digits/2] (fixedpoint.pack_pairs layout)."""
    assert in_digits is not None and \
        paired_kernel_supported(n, in_digits)
    n1, n2 = N._split_n(n)
    n1h = in_digits // n2
    xg = jnp.stack([xp, yp]).reshape(2, n1h, n2 // 2)
    return _paired_call(_iter_paired_kernel, xg, 2, n, n1h, interpret)


@functools.partial(jax.jit, static_argnames=("n", "interpret",
                                             "in_digits"))
def mxu_nr_products_paired(xp, yp, dxp, dyp, signs, *, n: int,
                           interpret: bool = False,
                           in_digits: int | None = None):
    """Paired-digit mxu_nr_products: [8, n] u32 rows (d, xy, u, v per
    prime) in even-half ‖ odd-half layout; inputs packed pairs."""
    assert in_digits is not None and \
        paired_kernel_supported(n, in_digits)
    n1, n2 = N._split_n(n)
    n1h = in_digits // n2
    xg = jnp.stack([xp, yp, dxp, dyp]).reshape(4, n1h, n2 // 2)
    return _paired_call(_nr_paired_kernel, xg, 4, n, n1h, interpret,
                        signs=signs)


# ---------------------------------------------------------------------------
# Fully fused iterate kernel: frequency products (both primes) + the
# CRT/carry tail (ntt_pallas semantics) + shadow emission in ONE
# kernel.  The per-iteration dispatch collapses to a single Pallas
# call: measured per-step launch/bubble overhead was ~50 µs/iter on
# top of the two kernels' device time (0.181 wall vs 0.104+ device).
# ---------------------------------------------------------------------------


def _iterfull_kernel(n: int, shadow_fd):
    from fractalshark_tpu.ops.bignum import ntt_pallas as NP
    n1, n2 = N._split_n(n)
    H = n2 // NP.LANES
    n1t = n // NP.LANES          # tail digit-plane rows

    def to_tail(a):
        """[n1, n2] → [n1·H, 128] row-major flat relayout (128-aligned
        lane slices + a leading-dim reshape — no Mosaic lane reshape)."""
        parts = [a[:, h * NP.LANES:(h + 1) * NP.LANES]
                 for h in range(H)]
        return jnp.stack(parts, axis=1).reshape(n1t, NP.LANES)

    def kernel(xg_ref, mf1_ref, mf2t_ref, mi2t_ref, mi1_ref,
               t1_ref, misc_ref, cadd_ref, rnd_ref, cfg_ref,
               dig_o, sgn_o, *shw_o):
        per_g = []
        for g in range(2):
            per_g.append(_freq_products(
                g, xg_ref, mf1_ref, mf2t_ref, mi2t_ref, mi1_ref,
                t1_ref, misc_ref))
        rnd = rnd_ref[...]
        for k in range(2):                           # d then xy
            r1 = to_tail(per_g[0][k])
            r2 = to_tail(per_g[1][k])
            dbl = cfg_ref[4 * k]
            gswap = cfg_ref[4 * k + 1]
            csign = cfg_ref[4 * k + 2]
            acc_p, acc_n = NP._tail_stream_cfg(r1, r2, n1t, dbl, gswap)
            c = cadd_ref[k]
            z = jnp.zeros_like(c)
            acc_p = acc_p + jnp.where(csign > 0, c, z) + rnd
            acc_n = acc_n + jnp.where(csign > 0, z, c)
            sign, mag = NP._signed_finish(acc_p, acc_n, n1t)
            dig_o[k] = mag
            sgn_o[k] = sign[0:8, :]
            if shadow_fd is not None:
                F_, D_ = shadow_fd
                shw_o[0][k] = NP._shadow_rows(mag, n1t, F_, D_)

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "shadow_fd",
                                             "interpret", "in_digits"))
def mxu_iterate_full(vx, vy, cadd, rnd, cfg, *, n: int,
                     shadow_fd=None, interpret: bool = False,
                     in_digits: int | None = None):
    """One whole z ← z² + c digit update in one kernel.

    vx, vy: [n] u32 digit magnitudes (padded); cadd: [2, n] addend
    digit planes (|cx|, |cy| at the value offset); rnd: [n] round
    plane; cfg i32[8] = per-component (double, gswap, csign, 0) as in
    ntt_pallas.fused_tail's plain layout.  Returns (digits [2, n] u32,
    signs i32 [2][, shadows i32 [2, 5]]) — bit-identical to
    mxu_iter_products → ntt_pallas.fused_tail."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fractalshark_tpu.ops.bignum import ntt_pallas as NP

    assert iter_kernel_supported(n)
    n1, n2 = N._split_n(n)
    n1t = n // NP.LANES
    if in_digits is None:
        n1h = n1
    else:
        n1h = in_digits // n2
        assert n1h * n2 == in_digits and 0 < n1h <= n1
    mf1, mf2t, mi2t, mi1, t1s, misc = _iter_tables(n)
    mf1 = mf1[:, :, :, :n1h]
    xg = jnp.stack([vx, vy]).reshape(2, n1h, n2)
    miscb = jnp.broadcast_to(jnp.asarray(misc), (2, 16, n2))
    cp = pltpu.CompilerParams(vmem_limit_bytes=110 << 20)
    out_specs = [
        pl.BlockSpec((2, n1t, NP.LANES), lambda: (_Z0, _Z0, _Z0)),
        pl.BlockSpec((2, 8, NP.LANES), lambda: (_Z0, _Z0, _Z0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((2, n1t, NP.LANES), jnp.uint32),
        jax.ShapeDtypeStruct((2, 8, NP.LANES), jnp.int32),
    ]
    if shadow_fd is not None:
        out_specs.append(pl.BlockSpec((2, 8, NP.LANES),
                                      lambda: (_Z0, _Z0, _Z0)))
        out_shape.append(jax.ShapeDtypeStruct((2, 8, NP.LANES),
                                              jnp.int32))
    outs = pl.pallas_call(
        _iterfull_kernel(n, shadow_fd),
        in_specs=[
            pl.BlockSpec((2, n1h, n2),
                         lambda: (_Z0, _Z0, _Z0)),
            pl.BlockSpec((2, _CHUNKS, n1, n1h),
                         lambda: (_Z0, _Z0, _Z0, _Z0)),
            pl.BlockSpec((2, _CHUNKS, n2, n2),
                         lambda: (_Z0, _Z0, _Z0, _Z0)),
            pl.BlockSpec((2, _CHUNKS, n2, n2),
                         lambda: (_Z0, _Z0, _Z0, _Z0)),
            pl.BlockSpec((2, _CHUNKS, n1, n1),
                         lambda: (_Z0, _Z0, _Z0, _Z0)),
            pl.BlockSpec((2, 4, n1, n2), lambda: (_Z0, _Z0, _Z0, _Z0)),
            pl.BlockSpec((2, 16, n2), lambda: (_Z0, _Z0, _Z0)),
            pl.BlockSpec((2, n1t, NP.LANES), lambda: (_Z0, _Z0, _Z0)),
            pl.BlockSpec((n1t, NP.LANES), lambda: (_Z0, _Z0)),
            pl.BlockSpec((8,), lambda: (_Z0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=cp,
        interpret=interpret,
    )(xg, jnp.asarray(mf1), jnp.asarray(mf2t), jnp.asarray(mi2t),
      jnp.asarray(mi1), jnp.asarray(t1s), miscb,
      cadd.reshape(2, n1t, NP.LANES), rnd.reshape(n1t, NP.LANES),
      cfg)
    if shadow_fd is not None:
        dig, sgn, shw = outs
        return dig.reshape(2, n), sgn[:, 0, 0], shw[:, 0:5, 0]
    dig, sgn = outs
    return dig.reshape(2, n), sgn[:, 0, 0]
