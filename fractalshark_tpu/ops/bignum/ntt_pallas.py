"""Whole-multiply NTT as ONE Pallas kernel (VMEM-resident).

TPU counterpart of the reference's fused NTT multiply kernel
(``HpSharkFloatLib/MultiplyNTT.cu:2943 RunNTT_3Way_Multiply``, which
keeps the whole transform in shared memory across grid syncs). The XLA
formulation (ntt.py) launches ~26 stage passes per multiply, each a
round-trip through HBM; here the entire 3-way multiply — two forward
transforms, six pointwise products, six inverses — runs inside a single
kernel with every intermediate in VMEM.

Transform layout ("rollstep", a transpose-free four-step): n = n1·128
with the 128-lane minor dim holding i2 and n1 sublanes holding i1.

* columns (length n1): radix-2 DIF/DIT over SUBLANES — free
  leading-dim reshapes, identical math to ntt._axis0_dif/_axis0_dit;
* the rev-aware twiddle matrix T1[br(k1), i2] = w_n^(br(k1)·i2)
  (same construction as ntt._fourstep_consts);
* rows (length 128): radix-2 DIF/DIT over LANES via cyclic lane
  rotations (``pltpu.roll``) + lane-mask selects — this replaces the
  four-step's physical transpose, which Mosaic has no cheap lowering
  for.

Output order is scrambled (bit-reversed k1 in sublanes × bit-reversed
k2 in lanes); the pointwise product is order-agnostic and the inverse
mirrors the exact chain, so no permutation pass exists anywhere.

Scaling follows ntt.multiply_3way: plain-domain Shoup butterflies
(6 u32 mults), ONE Montgomery REDC at the pointwise product, its R^-1
cancelled by folding R into the inverse's n^-1.

Pallas kernels may not capture array constants, so every table ships
in ONE packed operand of shape [13, 2, n1, 128] ("planes"):
  0/1   sub-stage fwd (w, w_shoup), stages packed along sublanes at
        offset n1 − (n1 >> s), each replicated across lanes
  2/3   sub-stage inv likewise (offset 2^s − 1)
  4..7  T1, T1shoup, T1inv, T1inv_shoup
  8..11 lane-stage fwd/inv (w, w_shoup), stage s on sublane s
  12    misc: sublane 0 = p, 1 = p', 2 = scale, 3 = scale_shoup
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fractalshark_tpu.ops.bignum import ntt as N
from fractalshark_tpu.ops.bignum.u32 import mul_full, mul_lo

LANES = 128
MIN_NFFT = 2048          # below this the flat XLA path is faster
# measured on v5e: the kernel's scoped-VMEM footprint is ~36.5 MB at
# nfft = 65536 against a 16 MB limit (compile-time OOM); 16384 fits
# (~9 MB). Larger sizes need a grid over coefficient blocks.
MAX_NFFT = 16384

_PLANES = 13


def _bitrev(k: int, bits: int) -> int:
    return int(format(k, f"0{bits}b")[::-1], 2)


@functools.lru_cache(maxsize=16)
def _tables(n: int) -> np.ndarray:
    """The packed [13, 2, n1, 128] uint32 table operand (see module
    docstring for the plane map)."""
    assert n % LANES == 0 and n & (n - 1) == 0
    n1 = n // LANES
    s1 = n1.bit_length() - 1
    s2 = LANES.bit_length() - 1
    assert n1 >= max(8, s2), "transform too small for the packed layout"
    ps = (N.P1, N.P2)
    gs = (N.G1, N.G2)
    T = np.zeros((_PLANES, 2, n1, LANES), np.uint32)

    def shoup(v, p):
        return (int(v) << 32) // p

    # sublane stage twiddles (root of order n1)
    for pi, (p, g) in enumerate(zip(ps, gs)):
        for inv in (False, True):
            w = pow(g, (p - 1) // n1, p)
            if inv:
                w = pow(w, p - 2, p)
            roots = [1] * (n1 // 2)
            wk = 1
            for k in range(n1 // 2):
                roots[k] = wk
                wk = wk * w % p
            for s in range(s1):
                if inv:
                    hm = 1 << s
                    off = hm - 1
                    idx = [k << (s1 - 1 - s) for k in range(hm)]
                else:
                    hm = n1 >> (s + 1)
                    off = n1 - (n1 >> s)
                    idx = [k << s for k in range(hm)]
                base = 2 if inv else 0
                for j, k in enumerate(idx):
                    T[base, pi, off + j, :] = roots[k]
                    T[base + 1, pi, off + j, :] = shoup(roots[k], p)

    # T1 matrices (root of order n, rev-aware rows)
    for pi, (p, g) in enumerate(zip(ps, gs)):
        wn = pow(g, (p - 1) // n, p)
        wni = pow(wn, p - 2, p)
        for row in range(n1):
            k1 = _bitrev(row, s1)
            b = pow(wn, k1, p)
            bi = pow(wni, k1, p)
            v = vi = 1
            for i2 in range(LANES):
                T[4, pi, row, i2] = v
                T[5, pi, row, i2] = shoup(v, p)
                T[6, pi, row, i2] = vi
                T[7, pi, row, i2] = shoup(vi, p)
                v = v * b % p
                vi = vi * bi % p

    # lane stage twiddles (root of order 128); stage s on sublane s.
    # Lane l in the second half of its block carries the butterfly
    # twiddle; first-half lanes hold 1 (masked out in-kernel).
    for pi, (p, g) in enumerate(zip(ps, gs)):
        for inv in (False, True):
            w = pow(g, (p - 1) // LANES, p)
            if inv:
                w = pow(w, p - 2, p)
            roots = [1] * (LANES // 2)
            wk = 1
            for k in range(LANES // 2):
                roots[k] = wk
                wk = wk * w % p
            base = 10 if inv else 8
            for s in range(s2):
                if inv:
                    hm = 1 << s
                    m = 2 << s
                else:
                    m = LANES >> s
                    hm = m >> 1
                for l in range(LANES):
                    v = 1
                    if (l % m) >= hm:
                        k = (l % m) - hm
                        kk = k << (s2 - 1 - s) if inv else k << s
                        v = roots[kk]
                    T[base, pi, s, l] = v
                    T[base + 1, pi, s, l] = shoup(v, p)

    # misc: p, p', scale = n^-1·R, scale'
    for pi, p in enumerate(ps):
        sc = (pow(n, p - 2, p) << 32) % p
        T[12, pi, 0, :] = p
        T[12, pi, 1, :] = N._MONT[p][0]
        T[12, pi, 2, :] = sc
        T[12, pi, 3, :] = shoup(sc, p)
    return T


# ------------------------------------------------------- in-kernel math
# Work arrays are [..., 2, n1, 128] with the prime on axis -3; per-prime
# vectors broadcast as [.., 2, 1, 128] slices of the table operand.


def _madd(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def _msub(a, b, p):
    return jnp.where(a >= b, a - b, a + p - b)


def _smul(t, w, wp, p):
    """Shoup modular multiply t·w, t ∈ [0,p), w < p (6 u32 mults)."""
    q = mul_full(wp, t)[0]
    r = mul_lo(w, t) - mul_lo(q, p)
    return jnp.where(r >= p, r - p, r)


def _mont(a, b, p, pp):
    """Montgomery product a·b·R^-1 mod p."""
    hi, lo = mul_full(a, b)
    m = mul_lo(lo, pp)
    mp_hi, _ = mul_full(m, p)
    t = hi + mp_hi + (lo != 0).astype(jnp.uint32)
    return jnp.where(t >= p, t - p, t)


def _roll(y, k):
    """Cyclic lane rotation: out[l] = y[(l - k) mod 128].

    The shift ships as an explicit i32 scalar: under jax_enable_x64 a
    Python int would trace as i64 and tpu.dynamic_rotate rejects it."""
    return pltpu.roll(y, jnp.int32(k % LANES), y.ndim - 1)


def _lane_iota(ndim):
    shape = (1,) * (ndim - 1) + (LANES,)
    return jax.lax.broadcasted_iota(jnp.int32, shape, ndim - 1)


def _sub_dif(y, tab, p):
    """DIF over the sublane axis; tab = (w_plane, wp_plane)."""
    V = y.shape[0]
    n1 = y.shape[-2]
    s1 = n1.bit_length() - 1
    pc = p.reshape(1, 2, 1, 1, LANES)
    for s in range(s1):
        hm = n1 >> (s + 1)
        off = n1 - (n1 >> s)
        w = tab[0][:, off:off + hm].reshape(1, 2, 1, hm, LANES)
        wp = tab[1][:, off:off + hm].reshape(1, 2, 1, hm, LANES)
        y5 = y.reshape(V, 2, 1 << s, 2, hm, LANES)
        a = y5[:, :, :, 0]
        b = y5[:, :, :, 1]
        t = _madd(a, b, pc)
        u = _smul(_msub(a, b, pc), w, wp, pc)
        y = jnp.stack([t, u], axis=3).reshape(V, 2, n1, LANES)
    return y


def _sub_dit(y, tab, p):
    """DIT over the sublane axis."""
    V = y.shape[0]
    n1 = y.shape[-2]
    s1 = n1.bit_length() - 1
    pc = p.reshape(1, 2, 1, 1, LANES)
    for s in range(s1):
        hm = 1 << s
        off = hm - 1
        w = tab[0][:, off:off + hm].reshape(1, 2, 1, hm, LANES)
        wp = tab[1][:, off:off + hm].reshape(1, 2, 1, hm, LANES)
        y5 = y.reshape(V, 2, n1 >> (s + 1), 2, hm, LANES)
        a = y5[:, :, :, 0]
        b = y5[:, :, :, 1]
        u = _smul(b, w, wp, pc)
        t0 = _madd(a, u, pc)
        t1 = _msub(a, u, pc)
        y = jnp.stack([t0, t1], axis=3).reshape(V, 2, n1, LANES)
    return y


def _lane_dif(y, tab, p):
    """DIF over the 128-lane axis via rolls + masked selects."""
    lane = _lane_iota(y.ndim)
    pc = p.reshape((1,) * (y.ndim - 3) + (2, 1, LANES))
    s2 = LANES.bit_length() - 1
    for s in range(s2):
        m = LANES >> s
        hm = m >> 1
        w = tab[0][:, s].reshape((1,) * (y.ndim - 3) + (2, 1, LANES))
        wp = tab[1][:, s].reshape((1,) * (y.ndim - 3) + (2, 1, LANES))
        first = (lane % m) < hm
        pf = _roll(y, -hm)           # y[l + hm]
        pb = _roll(y, hm)            # y[l - hm]
        a = jnp.where(first, y, pb)
        b = jnp.where(first, pf, y)
        t = _madd(a, b, pc)
        u = _smul(_msub(a, b, pc), w, wp, pc)
        y = jnp.where(first, t, u)
    return y


def _lane_dit(y, tab, p):
    """DIT over the 128-lane axis (bit-reversed lanes → natural)."""
    lane = _lane_iota(y.ndim)
    pc = p.reshape((1,) * (y.ndim - 3) + (2, 1, LANES))
    s2 = LANES.bit_length() - 1
    for s in range(s2):
        hm = 1 << s
        m = 2 << s
        w = tab[0][:, s].reshape((1,) * (y.ndim - 3) + (2, 1, LANES))
        wp = tab[1][:, s].reshape((1,) * (y.ndim - 3) + (2, 1, LANES))
        first = (lane % m) < hm
        u = _smul(y, w, wp, pc)      # second-half lanes: y[l]·w[l]
        t0 = _madd(y, _roll(u, -hm), pc)      # y[l] + u[l+hm]
        t1 = _msub(_roll(y, hm), u, pc)       # y[l-hm] - u[l]
        y = jnp.where(first, t0, t1)
    return y


# -------------------------------------------------------------- kernel


def _make_kernel(n: int, n_values: int, pair_plan, signed: bool):
    """Kernel computing, for `n_values` spread inputs, the inverse
    transforms of frequency-domain COMBINATIONS of pointwise products:
    each pair_plan entry is a tuple of (±1, ia, ib) terms summed mod p
    (the first term must be +1). With `signed`, a per-value sign row
    (operand, [V] lanes) conditionally negates each spectrum —
    NTT(−a) = p − NTT(a) — so products come out signed for the
    signed-CRT reconstruction."""
    n1 = n // LANES

    def kernel(*refs):
        if signed:
            x_ref, sg_ref, tab_ref, o_ref = refs
        else:
            x_ref, tab_ref, o_ref = refs
        p = tab_ref[12, :, 0]                 # [2, 128]
        pp = tab_ref[12, :, 1]
        sc = tab_ref[12, :, 2]
        scp = tab_ref[12, :, 3]
        xv = x_ref[...]                       # [V, n1, 128]
        # duplicate across the prime axis → [V, 2, n1, 128]
        y = jnp.broadcast_to(xv[:, None], (n_values, 2, n1, LANES))
        y = _sub_dif(y, (tab_ref[0], tab_ref[1]), p)
        y = _smul(y, tab_ref[4][None], tab_ref[5][None],
                  p.reshape(1, 2, 1, LANES))
        f = _lane_dif(y, (tab_ref[8], tab_ref[9]), p)
        pz = p.reshape(1, 2, 1, LANES)
        ppz = pp.reshape(1, 2, 1, LANES)
        if signed:
            sg = sg_ref[...]                  # [V, 1, 1, 128] int32
            fneg = jnp.where(f == jnp.uint32(0), f, pz - f)
            f = jnp.where(sg < 0, fneg, f)
        outs = []
        for terms in pair_plan:
            acc = None
            for (sgn, ia, ib) in terms:
                t = _mont(f[ia], f[ib], pz[0], ppz[0])
                if acc is None:
                    assert sgn > 0, "first combine term must be +"
                    acc = t
                elif sgn > 0:
                    acc = _madd(acc, t, pz[0])
                else:
                    acc = _msub(acc, t, pz[0])
            outs.append(acc)
        z = jnp.stack(outs)                   # [K, 2, n1, 128]
        z = _lane_dit(z, (tab_ref[10], tab_ref[11]), p)
        z = _smul(z, tab_ref[6][None], tab_ref[7][None], pz)
        z = _sub_dit(z, (tab_ref[2], tab_ref[3]), p)
        o_ref[...] = _smul(z, sc.reshape(1, 2, 1, LANES),
                           scp.reshape(1, 2, 1, LANES), pz)

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_values",
                                             "pair_plan", "interpret"))
def _ntt_products(x, signs=None, *, n: int, n_values: int, pair_plan,
                  interpret: bool = False):
    """x: [V, n] u32 plain (< p). Returns [K, 2, n] inverse-transformed
    combinations ·R (k-th row pair_plan[k], per prime on axis 1).
    signs: optional [V] int32 — folds each value's sign into its
    spectrum (see _make_kernel)."""
    n1 = n // LANES
    tab = jnp.asarray(_tables(n))
    signed = signs is not None
    kern = _make_kernel(n, n_values, pair_plan, signed)
    # x64 must be off while tracing the kernel: stray i64 scalars
    # (iota, roll shifts) fail Mosaic legalization.
    with jax.enable_x64(False):
        args = [x.reshape(n_values, n1, LANES)]
        if signed:
            args.append(jnp.broadcast_to(
                jnp.asarray(signs, jnp.int32).reshape(
                    n_values, 1, 1, 1), (n_values, 1, 1, LANES)))
        args.append(tab)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                (len(pair_plan), 2, n1, LANES), jnp.uint32),
            interpret=interpret,
        )(*args)
    return out.reshape(len(pair_plan), 2, n)


def supported(nfft: int) -> bool:
    return MIN_NFFT <= nfft <= MAX_NFFT


def _pairs(*idx):
    return tuple(((1, i, j),) for (i, j) in idx)


def ntt3way_products(vx, vy, nfft: int, interpret: bool = False):
    """(xx, yy, xy) product rows [6, nfft] (prime-interleaved like
    ntt's flat path: rows 2k, 2k+1 = product k mod p1, p2)."""
    x = jnp.stack([vx, vy])
    out = _ntt_products(x, n=nfft, n_values=2,
                        pair_plan=_pairs((0, 0), (1, 1), (0, 1)),
                        interpret=interpret)
    return out.reshape(6, nfft)


def nttnr_products(vx, vy, vdx, vdy, nfft: int, interpret: bool = False):
    """(xx, yy, xy, xdx, xdy, ydx, ydy) rows [14, nfft] — the NR-mode
    W0..W3 cross products sharing one forward pass."""
    x = jnp.stack([vx, vy, vdx, vdy])
    plan = _pairs((0, 0), (1, 1), (0, 1),
                  (0, 2), (0, 3), (1, 2), (1, 3))
    out = _ntt_products(x, n=nfft, n_values=4, pair_plan=plan,
                        interpret=interpret)
    return out.reshape(14, nfft)


# -------------------------------------------- iteration-fused variants
# Frequency-domain combines (NTT linearity): the z ← z² + c update
# needs only x² − y² and x·y, so the inverse pass shrinks to 4 rows;
# the NR update additionally needs x·dx − y·dy and x·dy + y·dx (8 rows
# instead of 14), with value signs folded into the spectra.


def ntt_iter_products(vx, vy, nfft: int, interpret: bool = False):
    """[4, nfft]: rows (x²−y²)@p1,@p2 (signed residues), xy@p1,@p2."""
    x = jnp.stack([vx, vy])
    plan = (((1, 0, 0), (-1, 1, 1)),      # x² − y²
            ((1, 0, 1),))                 # x·y
    out = _ntt_products(x, n=nfft, n_values=2, pair_plan=plan,
                        interpret=interpret)
    return out.reshape(4, nfft)


def ntt_nr_iter_products(vx, vy, vdx, vdy, signs, nfft: int,
                         interpret: bool = False):
    """[8, nfft]: signed-residue rows for d = x²−y², xy, u = x·dx−y·dy,
    v = x·dy+y·dx; signs = [sx, sy, sdx, sdy] int32."""
    x = jnp.stack([vx, vy, vdx, vdy])
    plan = (((1, 0, 0), (-1, 1, 1)),
            ((1, 0, 1),),
            ((1, 0, 2), (-1, 1, 3)),
            ((1, 0, 3), (1, 1, 2)))
    out = _ntt_products(x, signs, n=nfft, n_values=4, pair_plan=plan,
                        interpret=interpret)
    return out.reshape(8, nfft)


# ---------------------------------------------------------------------------
# Per-phase sublane transforms (for four-step sizes beyond MAX_NFFT)
# ---------------------------------------------------------------------------
#
# At nfft 65536 the whole-multiply kernel above exceeds VMEM, and the
# XLA four-step pays ~35 small stage passes per multiply (measured
# overhead/HBM-bound: per-iter time grows only 1.3x for 4x the data).
# Middle ground: ONE Pallas kernel per four-step *phase* — all
# log2(n1) butterfly stages over the sublane axis of [R, n1, n2] run
# VMEM-resident in a single pass, lanes untouched (no lane rolls, no
# transpose in-kernel; the inter-phase transpose and T1 twiddle stay
# in XLA).  Working set ~[R, n1, n2] u32 + twiddle planes: ~3 MB at
# n = 65536 — far under the 16 MB VMEM budget.


def _phase_offsets(m: int, inverse: bool):
    """Per-stage packing offsets into the twiddle planes, every slot
    8-SUBLANE-ALIGNED (unaligned sublane slices force Mosaic
    relayouts — measured 3.4x on the DIT kernels whose natural offsets
    are 2^s - 1)."""
    stages = m.bit_length() - 1
    offs = []
    off = 0
    for s in range(stages):
        hm = (1 << s) if inverse else (m >> (s + 1))
        offs.append(off)
        off += max(8, hm)
    return offs, off


@functools.lru_cache(maxsize=32)
def _phase_tables(m: int, rows: int, inverse: bool, lanes: int):
    """(w, wp) planes [rows, H, lanes] with stage-s twiddles at
    8-aligned packing offsets and values REPLICATED across lanes — the
    butterfly needs the twiddle on the sublane axis, and a
    lane->sublane reshape is a relayout Mosaic rejects.  Values are
    ntt._stage_tw_shoup's plain-domain Shoup pairs."""
    from fractalshark_tpu.ops.bignum.ntt import _stage_tw_shoup
    tws = _stage_tw_shoup(m, rows, inverse)
    offs, H = _phase_offsets(m, inverse)
    H = -(-H // 8) * 8
    w = np.zeros((rows, H, 1), np.uint32)
    wp = np.zeros((rows, H, 1), np.uint32)
    stages = m.bit_length() - 1
    for s in range(stages):
        hm = (1 << s) if inverse else (m >> (s + 1))
        off = offs[s]
        w[:, off:off + hm, 0] = tws[s][0]
        wp[:, off:off + hm, 0] = tws[s][1]
    return (np.broadcast_to(w, (rows, H, lanes)).copy(),
            np.broadcast_to(wp, (rows, H, lanes)).copy())


def _phase_kernel(inverse: bool, m: int):
    stages = m.bit_length() - 1
    offs, _ = _phase_offsets(m, inverse)

    def kernel(y_ref, w_ref, wp_ref, p_ref, o_ref):
        R = y_ref.shape[0]
        L = y_ref.shape[2]
        y = y_ref[...]
        p = p_ref[...]                       # [R, 1, 1]
        pc = p.reshape(R, 1, 1, 1)
        for s in range(stages):
            off = offs[s]
            if inverse:
                hm = 1 << s
                yv = y.reshape(R, m >> (s + 1), 2, hm, L)
            else:
                hm = m >> (s + 1)
                yv = y.reshape(R, 1 << s, 2, hm, L)
            w = w_ref[:, off:off + hm, :][:, None]    # [R, 1, hm, L]
            wp = wp_ref[:, off:off + hm, :][:, None]
            a = yv[:, :, 0]
            b = yv[:, :, 1]
            if inverse:
                u = _smul(b, w, wp, pc)
                t0 = _madd(a, u, pc)
                t1 = _msub(a, u, pc)
                y = jnp.stack([t0, t1], axis=2).reshape(R, m, L)
            else:
                t = _madd(a, b, pc)
                u = _smul(_msub(a, b, pc), w, wp, pc)
                y = jnp.stack([t, u], axis=2).reshape(R, m, L)
        o_ref[...] = y

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "inverse", "interpret"))
def sublane_transform(y, *, m: int, inverse: bool,
                      interpret: bool = False):
    """All radix-2 stages over axis 1 of [R, m, L] as one Pallas
    kernel; bit-identical to ntt._axis0_dif / _axis0_dit."""
    rows, m_, L = y.shape
    assert m_ == m
    w, wp = _phase_tables(m, rows, inverse, L)
    from fractalshark_tpu.ops.bignum.ntt import P1, P2
    p = np.asarray([(P1, P2)[r % 2] for r in range(rows)],
                   np.uint32).reshape(rows, 1, 1)
    kern = _phase_kernel(inverse, m)
    # NOTE: no enable_x64 toggle here — this is called mid-trace from
    # x64 outer jits (orbit_chunk's scan); the kernel body is pure u32
    # so nothing traces as i64.
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, m, L), jnp.uint32),
        interpret=interpret,
    )(y, jnp.asarray(w), jnp.asarray(wp), jnp.asarray(p))
