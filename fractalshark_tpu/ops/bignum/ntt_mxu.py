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

_CHUNKS = 4          # balanced base-256 digits per mod-p value
_DIAGS = 2 * _CHUNKS - 1


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
