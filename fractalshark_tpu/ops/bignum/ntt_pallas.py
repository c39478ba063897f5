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
    """Montgomery product a·b·R^-1 mod p.

    The carry select avoids bool→u32 convert_element_type: under
    jax_enable_x64 (package default) Mosaic's _convert_helper recurses
    infinitely on that pair (surfaces as a bogus RecursionError), and
    this kernel must trace x64-clean — it runs mid-trace inside
    orbit_chunk's x64 scan."""
    hi, lo = mul_full(a, b)
    m = mul_lo(lo, pp)
    mp_hi, _ = mul_full(m, p)
    t = hi + mp_hi + jnp.where(lo != jnp.uint32(0), jnp.uint32(1),
                               jnp.uint32(0))
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
    """DIF over the sublane axis; tab = (w_plane, wp_plane).  The
    prime axis size is taken from p (2 in the whole kernel, 1 in the
    per-(value, prime) grid steps of the split pipeline)."""
    V = y.shape[0]
    P = p.shape[0]
    n1 = y.shape[-2]
    s1 = n1.bit_length() - 1
    pc = p.reshape(1, P, 1, 1, LANES)
    for s in range(s1):
        hm = n1 >> (s + 1)
        off = n1 - (n1 >> s)
        w = tab[0][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        wp = tab[1][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        y5 = y.reshape(V, P, 1 << s, 2, hm, LANES)
        a = y5[:, :, :, 0]
        b = y5[:, :, :, 1]
        t = _madd(a, b, pc)
        u = _smul(_msub(a, b, pc), w, wp, pc)
        y = jnp.stack([t, u], axis=3).reshape(V, P, n1, LANES)
    return y


def _sub_dit(y, tab, p):
    """DIT over the sublane axis (prime axis size from p)."""
    V = y.shape[0]
    P = p.shape[0]
    n1 = y.shape[-2]
    s1 = n1.bit_length() - 1
    pc = p.reshape(1, P, 1, 1, LANES)
    for s in range(s1):
        hm = 1 << s
        off = hm - 1
        w = tab[0][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        wp = tab[1][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        y5 = y.reshape(V, P, n1 >> (s + 1), 2, hm, LANES)
        a = y5[:, :, :, 0]
        b = y5[:, :, :, 1]
        u = _smul(b, w, wp, pc)
        t0 = _madd(a, u, pc)
        t1 = _msub(a, u, pc)
        y = jnp.stack([t0, t1], axis=3).reshape(V, P, n1, LANES)
    return y


def _lane_dif(y, tab, p):
    """DIF over the 128-lane axis via rolls + masked selects."""
    lane = _lane_iota(y.ndim)
    P = p.shape[0]
    pc = p.reshape((1,) * (y.ndim - 3) + (P, 1, LANES))
    s2 = LANES.bit_length() - 1
    for s in range(s2):
        m = LANES >> s
        hm = m >> 1
        w = tab[0][:, s].reshape((1,) * (y.ndim - 3) + (P, 1, LANES))
        wp = tab[1][:, s].reshape((1,) * (y.ndim - 3) + (P, 1, LANES))
        # m is a power of two: mask with & — under jax_enable_x64 the
        # Python-int remainder lowers through a Mosaic convert that
        # recurses infinitely (bogus RecursionError), and & is cheaper
        first = (lane & jnp.int32(m - 1)) < hm
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
    P = p.shape[0]
    pc = p.reshape((1,) * (y.ndim - 3) + (P, 1, LANES))
    s2 = LANES.bit_length() - 1
    for s in range(s2):
        hm = 1 << s
        m = 2 << s
        w = tab[0][:, s].reshape((1,) * (y.ndim - 3) + (P, 1, LANES))
        wp = tab[1][:, s].reshape((1,) * (y.ndim - 3) + (P, 1, LANES))
        first = (lane & jnp.int32(m - 1)) < hm      # m pow2 (see _lane_dif)
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


def _products(x, signs=None, *, n, n_values, pair_plan, interpret=False):
    """Route to the single-kernel, whole-aligned, or split-pipeline
    implementation by size/flag (identical outputs)."""
    if WHOLE_ALIGNED and supported_whole(n):
        return _ntt_products_whole(x, signs, n=n, n_values=n_values,
                                   pair_plan=pair_plan,
                                   interpret=interpret)
    if supported_split(n):
        return _ntt_products_split(x, signs, n=n, n_values=n_values,
                                   pair_plan=pair_plan,
                                   interpret=interpret)
    return _ntt_products(x, signs, n=n, n_values=n_values,
                         pair_plan=pair_plan, interpret=interpret)


def ntt3way_products(vx, vy, nfft: int, interpret: bool = False):
    """(xx, yy, xy) product rows [6, nfft] (prime-interleaved like
    ntt's flat path: rows 2k, 2k+1 = product k mod p1, p2)."""
    x = jnp.stack([vx, vy])
    out = _products(x, n=nfft, n_values=2,
                    pair_plan=_pairs((0, 0), (1, 1), (0, 1)),
                    interpret=interpret)
    return out.reshape(6, nfft)


def nttnr_products(vx, vy, vdx, vdy, nfft: int, interpret: bool = False):
    """(xx, yy, xy, xdx, xdy, ydx, ydy) rows [14, nfft] — the NR-mode
    W0..W3 cross products sharing one forward pass."""
    x = jnp.stack([vx, vy, vdx, vdy])
    plan = _pairs((0, 0), (1, 1), (0, 1),
                  (0, 2), (0, 3), (1, 2), (1, 3))
    out = _products(x, n=nfft, n_values=4, pair_plan=plan,
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
    out = _products(x, n=nfft, n_values=2, pair_plan=plan,
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
    out = _products(x, signs, n=nfft, n_values=4, pair_plan=plan,
                    interpret=interpret)
    return out.reshape(8, nfft)


# ---------------------------------------------------------------------------
# Split-phase pipeline: the whole-multiply chain as THREE kernels
# ---------------------------------------------------------------------------
#
# Beyond MAX_NFFT the single kernel exceeds VMEM, and the XLA four-step
# pays two minor-dim transposes per multiply whose relayouts dominate
# the inverse phases (measured ~90 us vs ~26 us per phase at nfft
# 65536).  The rollstep layout needs NO transpose anywhere: splitting
# the whole-kernel chain at its two natural seams gives three
# VMEM-sized kernels with every pass either sublane-local or
# lane-local:
#
#   K1  sub-DIF (all log2(n1) stages) + T1 twiddle        [V,2,n1,128]
#   K2  lane-DIF + (sign fold) + pointwise combines +
#       lane-DIT + T1inv twiddle                          [K,2,n1,128]
#   K3  sub-DIT (all stages) + n^-1·R scaling             [K,2,n1,128]
#
# Math, tables and op order are IDENTICAL to _make_kernel, so outputs
# are bit-identical to the single-kernel path (and to the XLA
# transforms — exact integer convolutions).


def _aligned_offsets(m: int):
    """8-aligned per-stage packing offsets (same scheme as
    _phase_offsets): unaligned sublane slices of VMEM tables force
    Mosaic relayouts — measured 3.4x on DIT kernels whose natural
    offsets are 2^s - 1."""
    stages = m.bit_length() - 1
    offs = []
    off = 0
    for s in range(stages):
        offs.append(off)
        hm = max(8, m >> (s + 1))
        off += hm
    return tuple(offs), -(-off // 8) * 8


@functools.lru_cache(maxsize=8)
def _split_tables(n: int):
    """Per-kernel tables for the split pipeline.  Sub-stage twiddles
    repack at 8-ALIGNED offsets (stage s of the forward uses
    hm = n1 >> (s+1) entries; the inverse uses hm = 2^s — both packed
    largest-first so every slot start is 8-aligned):
      sub_fwd/sub_inv [2(w/wp), 2(prime), H, 128]
      t1/t1i          [2(w/wp), 2(prime), n1, 128]
      lane            [4, 2, 8, 128]   misc [2, 8, 128]
    """
    T = _tables(n)
    n1 = n // LANES
    s1 = n1.bit_length() - 1
    offs, H = _aligned_offsets(n1)

    def repack(base):
        out = np.zeros((2, 2, H, LANES), np.uint32)
        for st in range(s1):
            if base == 0:     # forward: source offset n1 - (n1 >> st)
                hm = n1 >> (st + 1)
                src = n1 - (n1 >> st)
            else:             # inverse: source offset 2^st - 1
                hm = 1 << st
                src = hm - 1
            # pack largest-first so slot starts stay aligned: forward
            # stage st has hm = n1 >> (st+1) (decreasing); inverse
            # stage st has hm = 2^st (increasing) -> pack inverse
            # stages in REVERSE slot order
            slot = offs[st] if base == 0 else offs[s1 - 1 - st]
            for wp in range(2):
                out[wp, :, slot:slot + hm, :] = \
                    T[base + wp, :, src:src + hm, :]
        return out

    sub_fwd = repack(0)
    sub_inv = repack(2)
    t1 = np.ascontiguousarray(np.stack([T[4], T[5]]))
    t1i = np.ascontiguousarray(np.stack([T[6], T[7]]))
    lane = np.ascontiguousarray(T[8:12, :, :8, :])
    misc = np.ascontiguousarray(T[12, :, :8, :])
    return sub_fwd, t1, lane, t1i, sub_inv, misc


def _sub_dif_al(y, tab, p, n1: int):
    """DIF over the sublane axis with 8-aligned stage-table offsets;
    tab = (w_plane, wp_plane) of [P, H, 128]."""
    V = y.shape[0]
    P = p.shape[0]
    s1 = n1.bit_length() - 1
    offs, _ = _aligned_offsets(n1)
    pc = p.reshape(1, P, 1, 1, LANES)
    for s in range(s1):
        hm = n1 >> (s + 1)
        off = offs[s]
        w = tab[0][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        wp = tab[1][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        y5 = y.reshape(V, P, 1 << s, 2, hm, LANES)
        a = y5[:, :, :, 0]
        b = y5[:, :, :, 1]
        t = _madd(a, b, pc)
        u = _smul(_msub(a, b, pc), w, wp, pc)
        y = jnp.stack([t, u], axis=3).reshape(V, P, n1, LANES)
    return y


def _sub_dit_al(y, tab, p, n1: int):
    """DIT over the sublane axis with 8-aligned stage-table offsets
    (inverse stages pack in reverse slot order — see _split_tables)."""
    V = y.shape[0]
    P = p.shape[0]
    s1 = n1.bit_length() - 1
    offs, _ = _aligned_offsets(n1)
    pc = p.reshape(1, P, 1, 1, LANES)
    for s in range(s1):
        hm = 1 << s
        off = offs[s1 - 1 - s]
        w = tab[0][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        wp = tab[1][:, off:off + hm].reshape(1, P, 1, hm, LANES)
        y5 = y.reshape(V, P, n1 >> (s + 1), 2, hm, LANES)
        a = y5[:, :, :, 0]
        b = y5[:, :, :, 1]
        u = _smul(b, w, wp, pc)
        t0 = _madd(a, u, pc)
        t1 = _msub(a, u, pc)
        y = jnp.stack([t0, t1], axis=3).reshape(V, P, n1, LANES)
    return y


def _fwd_split_kernel(n1: int, n_values: int):
    """Whole-array sub-DIF + T1 twiddle (one kernel, no grid — grid
    steps re-DMA table blocks and serialize tiny launches; only the
    MID kernel ever exceeded scoped VMEM).  Working set ~[V,2,n1,128]
    + aligned tables — same budget as the production
    sublane_transform, which fits at nfft 65536."""

    def kernel(x_ref, sf_ref, t1_ref, misc_ref, o_ref):
        p = misc_ref[:, 0]                     # [2, 128]
        xv = x_ref[...]                        # [V, n1, 128]
        y = jnp.broadcast_to(xv[:, None],
                             (n_values, 2) + xv.shape[1:])
        y = _sub_dif_al(y, (sf_ref[0], sf_ref[1]), p, n1)
        o_ref[...] = _smul(y, t1_ref[0][None], t1_ref[1][None],
                           p.reshape(1, 2, 1, LANES))

    return kernel


def _mid_split_kernel(pair_plan, signed: bool):
    """One grid step = one sublane block (lane stages + pointwise are
    sublane-independent)."""

    def kernel(*refs):
        if signed:
            x_ref, sg_ref, lt_ref, t1i_ref, misc_ref, o_ref = refs
        else:
            x_ref, lt_ref, t1i_ref, misc_ref, o_ref = refs
        p = misc_ref[:, 0]
        pp = misc_ref[:, 1]
        f = _lane_dif(x_ref[...], (lt_ref[0], lt_ref[1]), p)
        pz = p.reshape(1, 2, 1, LANES)
        ppz = pp.reshape(1, 2, 1, LANES)
        if signed:
            sg = sg_ref[...]                   # [V, 1, 1, 128] int32
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
        z = jnp.stack(outs)                    # [K, 2, blk, 128]
        z = _lane_dit(z, (lt_ref[2], lt_ref[3]), p)
        o_ref[...] = _smul(z, t1i_ref[0][None], t1i_ref[1][None], pz)

    return kernel


def _inv_split_kernel(n1: int):
    """Whole-array sub-DIT + scale (one kernel, no grid)."""

    def kernel(z_ref, si_ref, misc_ref, o_ref):
        p = misc_ref[:, 0]
        sc = misc_ref[:, 2]
        scp = misc_ref[:, 3]
        z = _sub_dit_al(z_ref[...], (si_ref[0], si_ref[1]), p, n1)
        o_ref[...] = _smul(z, sc.reshape(1, 2, 1, LANES),
                           scp.reshape(1, 2, 1, LANES),
                           p.reshape(1, 2, 1, LANES))

    return kernel


_MID_SUBBLK = 64    # sublane block per mid-kernel grid step
_Z0 = np.int32(0)   # i32-clean index-map zero (see _ntt_products_split)


@functools.partial(jax.jit, static_argnames=("n", "n_values",
                                             "pair_plan", "interpret"))
def _ntt_products_split(x, signs=None, *, n: int, n_values: int,
                        pair_plan, interpret: bool = False):
    """Split-pipeline equivalent of _ntt_products (same signature and
    output) for sizes beyond the single-kernel VMEM window.  The sub
    phases run as whole-array kernels; the mid (lane) kernel grids
    over sublane blocks (the one that exceeded scoped VMEM ungridded).
    No x64 toggle: callable mid-trace from x64 outer jits
    (orbit_chunk's scan); bodies are pure u32."""
    n1 = n // LANES
    sub_fwd, t1_t, lane_t, t1i_t, sub_inv, misc_t = (
        jnp.asarray(a) for a in _split_tables(n))
    K = len(pair_plan)
    V = n_values
    # index maps must return i32: literal-0 entries trace as i64 under
    # jax_enable_x64 (these calls run mid-trace in x64 outer jits) and
    # Mosaic rejects the i64 func.return; numpy scalars stay i32
    z0 = np.int32(0)
    # the sub-phase kernels sit at ~16.1 MB scoped VMEM at nfft 65536
    # (80 KB past the 16 MB compiler default); the chip has far more —
    # raise the limit instead of gridding (grid steps re-DMA tables
    # and serialize tiny launches)
    cp = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
    f0 = pl.pallas_call(
        _fwd_split_kernel(n1, V),
        out_shape=jax.ShapeDtypeStruct((V, 2, n1, LANES), jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(x.reshape(V, n1, LANES), sub_fwd, t1_t, misc_t)
    signed = signs is not None
    blk = min(_MID_SUBBLK, n1)
    mid_in = [
        pl.BlockSpec((V, 2, blk, LANES), lambda i: (z0, z0, i, z0)),
    ]
    mid_args = [f0]
    if signed:
        mid_args.append(jnp.broadcast_to(
            jnp.asarray(signs, jnp.int32).reshape(V, 1, 1, 1),
            (V, 1, 1, LANES)))
        mid_in.append(pl.BlockSpec((V, 1, 1, LANES),
                                   lambda i: (z0, z0, z0, z0)))
    mid_in += [
        pl.BlockSpec((4, 2, 8, LANES), lambda i: (z0, z0, z0, z0)),
        pl.BlockSpec((2, 2, blk, LANES), lambda i: (z0, z0, i, z0)),
        pl.BlockSpec((2, 8, LANES), lambda i: (z0, z0, z0)),
    ]
    mid_args += [lane_t, t1i_t, misc_t]
    z = pl.pallas_call(
        _mid_split_kernel(pair_plan, signed),
        grid=(n1 // blk,),
        in_specs=mid_in,
        out_specs=pl.BlockSpec((K, 2, blk, LANES),
                               lambda i: (z0, z0, i, z0)),
        out_shape=jax.ShapeDtypeStruct((K, 2, n1, LANES), jnp.uint32),
        interpret=interpret,
    )(*mid_args)
    out = pl.pallas_call(
        _inv_split_kernel(n1),
        out_shape=jax.ShapeDtypeStruct((K, 2, n1, LANES), jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(z, sub_inv, misc_t)
    return out.reshape(K, 2, n)


# largest split-pipeline size: working sets scale ~n/65536 × 4 MB per
# kernel — 131072 (View #32's 32768-limb operands) still fits VMEM
SPLIT_MAX_NFFT = 131072


def supported_split(nfft: int) -> bool:
    return MAX_NFFT < nfft <= SPLIT_MAX_NFFT and nfft % LANES == 0


# ---------------------------------------------------------------------------
# Whole-multiply single kernel, ALIGNED-TABLE form (beyond MAX_NFFT)
# ---------------------------------------------------------------------------
#
# The original whole kernel (_ntt_products) was VMEM-capped at nfft
# 16384: its 36.5 MB scoped-VMEM estimate at 65536 predated the
# round-3 fixes (8-aligned stage tables, raised vmem_limit_bytes).
# This variant is the split pipeline's three kernels fused back into
# ONE — no inter-kernel HBM round-trips for the [V,2,n1,128] working
# set — using the identical aligned tables and op order, so outputs
# are bit-identical to both other forms.  Routed by WHOLE_ALIGNED
# (A/B flag; decided by measurement, see fixedpoint.PALLAS_NTT notes).

WHOLE_ALIGNED: bool = False


def supported_whole(nfft: int) -> bool:
    return MAX_NFFT < nfft <= SPLIT_MAX_NFFT and nfft % LANES == 0


def _whole_aligned_kernel(n1: int, n_values: int, pair_plan,
                          signed: bool):
    def kernel(*refs):
        if signed:
            (x_ref, sg_ref, sf_ref, t1_ref, lane_ref, t1i_ref, si_ref,
             misc_ref, o_ref) = refs
        else:
            (x_ref, sf_ref, t1_ref, lane_ref, t1i_ref, si_ref,
             misc_ref, o_ref) = refs
        p = misc_ref[:, 0]                     # [2, 128]
        pp = misc_ref[:, 1]
        sc = misc_ref[:, 2]
        scp = misc_ref[:, 3]
        xv = x_ref[...]                        # [V, n1, 128]
        y = jnp.broadcast_to(xv[:, None], (n_values, 2) + xv.shape[1:])
        y = _sub_dif_al(y, (sf_ref[0], sf_ref[1]), p, n1)
        y = _smul(y, t1_ref[0][None], t1_ref[1][None],
                  p.reshape(1, 2, 1, LANES))
        f = _lane_dif(y, (lane_ref[0], lane_ref[1]), p)
        pz = p.reshape(1, 2, 1, LANES)
        ppz = pp.reshape(1, 2, 1, LANES)
        if signed:
            sg = sg_ref[...]                   # [V, 1, 1, 128] int32
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
        z = jnp.stack(outs)                    # [K, 2, n1, 128]
        z = _lane_dit(z, (lane_ref[2], lane_ref[3]), p)
        z = _smul(z, t1i_ref[0][None], t1i_ref[1][None], pz)
        z = _sub_dit_al(z, (si_ref[0], si_ref[1]), p, n1)
        o_ref[...] = _smul(z, sc.reshape(1, 2, 1, LANES),
                           scp.reshape(1, 2, 1, LANES), pz)

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_values",
                                             "pair_plan", "interpret"))
def _ntt_products_whole(x, signs=None, *, n: int, n_values: int,
                        pair_plan, interpret: bool = False):
    """Whole-chain aligned-table kernel (same signature/output as
    _ntt_products / _ntt_products_split).  x64-clean like the split
    form (callable mid-trace from orbit_chunk's x64 scan)."""
    n1 = n // LANES
    sub_fwd, t1_t, lane_t, t1i_t, sub_inv, misc_t = (
        jnp.asarray(a) for a in _split_tables(n))
    K = len(pair_plan)
    V = n_values
    signed = signs is not None
    cp = pltpu.CompilerParams(vmem_limit_bytes=120 << 20)
    args = [x.reshape(V, n1, LANES)]
    if signed:
        args.append(jnp.broadcast_to(
            jnp.asarray(signs, jnp.int32).reshape(V, 1, 1, 1),
            (V, 1, 1, LANES)))
    args += [sub_fwd, t1_t, lane_t, t1i_t, sub_inv, misc_t]
    out = pl.pallas_call(
        _whole_aligned_kernel(n1, V, pair_plan, signed),
        out_shape=jax.ShapeDtypeStruct((K, 2, n1, LANES), jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(*args)
    return out.reshape(K, 2, n)


# ---------------------------------------------------------------------------
# Fused CRT + carry tail (kernel 4 of the split pipeline)
# ---------------------------------------------------------------------------
#
# The XLA tail (fixedpoint._signed_streams → carry_propagate →
# _finish_signed_rows) costs ~90 us of the 338 us View-#30 device
# iteration: every Kogge-Stone doubling step is a separate HBM pass.
# Here the whole tail runs VMEM-resident in one kernel — the TPU
# counterpart of the reference folding FinalizeNormalize into the
# multiply kernel (MultiplyNTT.cu:47-153).
#
# Digit layout: flat digit index i ↦ (sublane i // 128, lane i % 128)
# of an [n1, 128] array (sublane-major, lane-minor — matches the
# coefficient order of the split transforms since L == nfft for
# power-of-two digit counts).  Flat shifts and the carry prefix become
# lane ops + a sublane-aggregate pass:
#
#   * flat shift by k < 128: lane roll + take the previous sublane row
#     for the wrapped lanes;
#   * carry Kogge-Stone: 7 lane-level doubling steps within rows, one
#     sublane-level prefix over per-row aggregates (log2(n1) steps),
#     then one combine — data-independent, like the XLA version.
#
# The signed finish avoids the XLA path's top-differing-digit compare
# (a gather): mag = P − N via two's-complement add with carry-out
# (carry ⟺ P ≥ N, ties included) and a conditional recomplement —
# identical (sign, magnitude) results.


def _sub_roll(y, k):
    """Cyclic SUBLANE rotation by k (axis -2)."""
    return pltpu.roll(y, jnp.int32(k), y.ndim - 2)


def _sub_iota(ndim, n1):
    shape = (1,) * (ndim - 2) + (n1, 1)
    return jax.lax.broadcasted_iota(jnp.int32, shape, ndim - 2)


def _flat_shift(a, k: int, n1: int):
    """out[i] = a[i-k] (zero for i < k) along the flat digit order of
    [..., n1, 128]; 0 <= k < 128."""
    if k == 0:
        return a
    lane = _lane_iota(a.ndim)
    r = _roll(a, k)                      # lane l ← lane (l-k) mod 128
    up = _sub_roll(r, 1)                 # previous sublane row's value
    sub = _sub_iota(a.ndim, n1)
    up = jnp.where(sub > 0, up, jnp.zeros_like(up))
    return jnp.where(lane < k, up, r)


def _red2_full(v, op):
    """Full-plane reduction broadcast back to v's shape WITHOUT ever
    materializing a [..., 1, 1] tensor: reduce lanes → broadcast lanes
    → reduce sublanes → broadcast sublanes.  Every broadcast is
    single-axis — Mosaic's two-axis vector.broadcast is unimplemented
    on batched [K, n1, 128] planes, and MLIR canonicalization re-fuses
    naively staged broadcast pairs.  Exact for max/min; exact for sum
    too (the sublane reduction runs on lane-broadcast rows, every lane
    column holding the full set of row values)."""
    m = op(v, axis=-1, keepdims=True)
    m = jnp.broadcast_to(m, v.shape)
    m = op(m, axis=-2, keepdims=True)
    return jnp.broadcast_to(m, v.shape)


def _bc_full(m, shape):
    """Broadcast [K, 1, LANES] (lane-complete) → [K, n1, LANES]:
    single-axis, Mosaic-safe at any rank."""
    return jnp.broadcast_to(m, shape)


def _masked_corner(x, n1: int):
    """x[-1, -1] (i32, small non-negative) broadcast to x's shape via
    masked max-reduce — reduce+broadcast is the one replication
    pattern Mosaic reliably supports (roll/slice/broadcast chains keep
    offset layouts it refuses to re-broadcast)."""
    mask = (_sub_iota(x.ndim, n1) == n1 - 1) &         (_lane_iota(x.ndim) == LANES - 1)
    v = jnp.where(mask, x, jnp.int32(0))
    return _red2_full(v, jnp.max)


def _last_lane_bcast(x):
    """Each row's lane-127 value (i32, small non-negative) broadcast
    across its row (masked lane max-reduce)."""
    v = jnp.where(_lane_iota(x.ndim) == LANES - 1, x, jnp.int32(0))
    m = jnp.max(v, axis=-1, keepdims=True)
    return jnp.broadcast_to(m, x.shape)


def _flat_ks(g, p, n1: int):
    """Inclusive Kogge-Stone prefix of the carry monoid (g, p ∈ {0,1}
    I32) along the flat digit order of [n1, 128] (hierarchical: lanes,
    then sublane aggregates).  Static unrolled doubling passes — the
    fori_loop form (dynamic rotates) measured ~30% slower per orbit
    iteration from per-iteration loop overhead."""
    lane = _lane_iota(g.ndim)
    k = 1
    while k < LANES:
        gs = _roll(g, k)
        ps = _roll(p, k)
        m = lane >= k
        gs = jnp.where(m, gs, jnp.int32(0))
        ps = jnp.where(m, ps, jnp.int32(1))
        g = g | (p & gs)
        p = p & ps
        k <<= 1
    # per-row aggregates (value at lane 127) → sublane prefix
    Gr = _last_lane_bcast(g)
    Pr = _last_lane_bcast(p)
    sub = _sub_iota(g.ndim, n1)
    ss = 1
    while ss < n1:
        gs = _sub_roll(Gr, ss)
        ps = _sub_roll(Pr, ss)
        m = sub >= ss
        gs = jnp.where(m, gs, jnp.int32(0))
        ps = jnp.where(m, ps, jnp.int32(1))
        Gr = Gr | (Pr & gs)
        Pr = Pr & ps
        ss <<= 1
    # incoming row carry = inclusive aggregate of the PREVIOUS row
    Gin = _sub_roll(Gr, 1)
    Gin = jnp.where(sub > 0, Gin, jnp.int32(0))
    return g | (p & Gin)


def _flat_prefix_and(p, n1: int):
    """Inclusive prefix-AND of p ∈ {0,1} i32 along the flat digit order
    of [..., n1, 128] — the _flat_ks hierarchy with the g-stream
    dropped (3 ops per doubling pass instead of 7)."""
    lane = _lane_iota(p.ndim)
    k = 1
    while k < LANES:
        ps = _roll(p, k)
        ps = jnp.where(lane >= k, ps, jnp.int32(1))
        p = p & ps
        k <<= 1
    Pr = _last_lane_bcast(p)
    sub = _sub_iota(p.ndim, n1)
    ss = 1
    while ss < n1:
        ps = _sub_roll(Pr, ss)
        ps = jnp.where(sub >= ss, ps, jnp.int32(1))
        Pr = Pr & ps
        ss <<= 1
    Pin = _sub_roll(Pr, 1)
    Pin = jnp.where(sub > 0, Pin, jnp.int32(1))
    return p & Pin


_DMASK = 0xFFFF


def _twos_complement(u, n1: int):
    """(2^(16·N) − u) mod 2^(16·N) of a canonical 16-bit digit plane:
    per-digit complement plus increment.  The increment's carry into
    digit i is AND_{j<i}(u_j == 0), a p-only prefix — replacing the
    generic second _flat_carry pass of the signed finish (same value by
    construction: ~u + 1)."""
    pz = jnp.where(u == jnp.uint32(0), jnp.int32(1), jnp.int32(0))
    cin = _flat_shift(_flat_prefix_and(pz, n1), 1, n1)
    at0 = (_sub_iota(u.ndim, n1) == 0) & (_lane_iota(u.ndim) == 0)
    cin = jnp.where(at0, jnp.int32(1), cin)
    cu = jnp.where(cin > 0, jnp.uint32(1), jnp.uint32(0))
    return (jnp.uint32(_DMASK) - u + cu) & jnp.uint32(_DMASK)


def _flat_carry(acc, n1: int):
    """Canonicalize per-digit sums (< 2^32) to 16-bit digits along the
    flat order; returns (digits u32, carry_out i32 full-shape) — the
    TOTAL carry out of the global top digit (top dropped-high value
    plus the lookahead carry; the biased subtract reads multi-bit
    carry-outs)."""
    lo = acc & jnp.uint32(_DMASK)
    hi = acc >> 16
    a = lo + _flat_shift(hi, 1, n1)
    d = a & jnp.uint32(_DMASK)
    gi = jnp.where(a > jnp.uint32(_DMASK), jnp.int32(1), jnp.int32(0))
    pi = jnp.where(d == jnp.uint32(_DMASK), jnp.int32(1), jnp.int32(0))
    G = _flat_ks(gi, pi, n1)
    Gu = jnp.where(G > 0, jnp.uint32(1), jnp.uint32(0))
    out = (d + _flat_shift(Gu, 1, n1)) & jnp.uint32(_DMASK)
    # hi < 2^16 always → value-preserving vector bitcast to i32
    hi_i = jax.lax.bitcast_convert_type(hi, jnp.int32)
    cout = _masked_corner(hi_i + G, n1)
    return out, cout


_FIN_BIAS = np.uint32(1 << 20)


def _signed_finish(acc_p, acc_n, n1: int):
    """(sign ∈ {+1,-1} i32 full-shape, canonical digits) of the signed
    value pos − neg; ties and zero → +1 (fixedpoint.signed_add
    semantics).

    BIASED two's complement — one carry pass instead of three: with
    per-digit accumulators < 2^19, D_i = p_i − n_i + 2^20 − 16·[i>0]
    is non-negative and values pos − neg + 16·M exactly (the bias
    telescopes: +2^20 per digit minus 16 per higher digit leaves only
    16·2^(16L) ≡ 0 mod M).  One canonicalization yields
    u = (pos − neg) mod M with total carry-out 16 ⟺ pos ≥ neg
    (15 otherwise); the negative branch recomplements (second pass)."""
    lane = _lane_iota(acc_p.ndim)
    sub = _sub_iota(acc_p.ndim, n1)
    not0 = (sub > 0) | (lane > 0)
    D = acc_p + _FIN_BIAS - acc_n - \
        jnp.where(not0, jnp.uint32(16), jnp.uint32(0))
    u, cout = _flat_carry(D, n1)
    # recomplement for the negative branch: M - u = ~u + 1 (p-only
    # prefix; the generic _flat_carry form it replaces measured
    # ~6 µs/iter slower at the View #30 operand)
    v = _twos_complement(u, n1)
    pos = cout >= 16
    mag = jnp.where(pos, u, v)
    nzi = jnp.where(mag != jnp.uint32(0), jnp.int32(1), jnp.int32(0))
    nonzero = _red2_full(nzi, jnp.max) > 0
    sign = jnp.where(pos | ~nonzero, jnp.int32(1), jnp.int32(-1))
    return sign, mag


# in-kernel CRT constants (host Python ints → u32 scalars)
_INV_P1_MOD_P2_MONT = np.uint32(((pow(N.P1, -1, N.P2)) << 32) % N.P2)
_P1P2 = N.P1 * N.P2
_C_P1P2_HI = np.uint32(_P1P2 >> 32)
_C_P1P2_LO = np.uint32(_P1P2 & 0xFFFFFFFF)
_C_HALF_HI = np.uint32((_P1P2 >> 1) >> 32)
_C_HALF_LO = np.uint32((_P1P2 >> 1) & 0xFFFFFFFF)


def _k_crt_rec(r1, r2):
    """In-kernel CRT reconstruction (fixedpoint._crt_rec semantics):
    (hi, lo) of rec ∈ [0, p1·p2)."""
    p2 = jnp.uint32(N.P2)
    pp2 = jnp.uint32(N._MONT[N.P2][0])
    r1m = jnp.where(r1 >= p2, r1 - p2, r1)
    diff = jnp.where(r2 >= r1m, r2 - r1m, r2 + p2 - r1m)
    t = _mont(diff, jnp.full_like(diff, _INV_P1_MOD_P2_MONT), p2, pp2)
    hi, lo = mul_full(t, jnp.uint32(N.P1))
    lo2 = lo + r1
    c = jnp.where(lo2 < lo, jnp.uint32(1), jnp.uint32(0))
    return hi + c, lo2


def _k_parts_acc(hi, lo, n1: int):
    """Scatter the four 16-bit parts of each 64-bit coefficient into
    flat digit positions k..k+3 and sum."""
    d0 = lo & jnp.uint32(_DMASK)
    d1 = lo >> 16
    d2 = hi & jnp.uint32(_DMASK)
    d3 = hi >> 16
    return (d0 + _flat_shift(d1, 1, n1) + _flat_shift(d2, 2, n1) +
            _flat_shift(d3, 3, n1))


def _tail_stream_cfg(r1, r2, n1: int, dbl, gswap):
    """(acc_p, acc_n) digit-sum accumulators of one CRT'd product row
    pair — a uniform, runtime-configured form of fixedpoint's
    _signed_streams/_unsigned_stream: every row takes the signed-CRT
    split (an unsigned product's reconstruction never exceeds
    p1·p2/2, so the negative branch simply stays empty), doubling is
    a traced flag, and a global sign applies by swapping the streams
    (gswap < 0).  One kernel body serves the plain and NR tails AND
    grids over components."""
    hi, lo = _k_crt_rec(r1, r2)
    neg = (hi > _C_HALF_HI) | ((hi == _C_HALF_HI) & (lo > _C_HALF_LO))
    nlo = jnp.uint32(_C_P1P2_LO) - lo
    bb = jnp.where(_C_P1P2_LO < lo, jnp.uint32(1), jnp.uint32(0))
    nhi = jnp.uint32(_C_P1P2_HI) - hi - bb
    # batched form: per-component flags arrive as [K, 1, LANES]
    # lane-complete planes — the remaining broadcast is sublane-only
    # (Mosaic's two-axis broadcast is unimplemented with a leading
    # batch dim)
    if getattr(dbl, "ndim", 0) == hi.ndim and dbl.ndim >= 3:
        dbl = _bc_full(dbl, hi.shape)
        gswap = _bc_full(gswap, hi.shape)
    d = dbl > 0
    hi2 = jnp.where(d, (hi << 1) | (lo >> 31), hi)
    lo2 = jnp.where(d, lo << 1, lo)
    nhi2 = jnp.where(d, (nhi << 1) | (nlo >> 31), nhi)
    nlo2 = jnp.where(d, nlo << 1, nlo)
    z = jnp.uint32(0)
    acc_p = _k_parts_acc(jnp.where(neg, z, hi2),
                         jnp.where(neg, z, lo2), n1)
    acc_n = _k_parts_acc(jnp.where(neg, nhi2, z),
                         jnp.where(neg, nlo2, z), n1)
    swap = gswap < 0
    return (jnp.where(swap, acc_n, acc_p),
            jnp.where(swap, acc_p, acc_n))


def _tail_split_kernel(n: int, shadow_fd=None):
    """One grid step = ONE component's full tail (CRT streams, addend
    fold, round, carry resolution, signed finish) — the carry chains
    are per-component, so the component axis grids freely and scoped
    VMEM stays bounded at any n.

    Per-component config rides in SMEM cfg[4k..4k+3] =
    (double, gswap, csign, 0); the addend plane for component k is
    cadd[k] (zeros when none).

    shadow_fd=(F, D): additionally emit the top-digit SHADOW window of
    the value slice [F, F+D) — (4 window digits, base index) in slice
    coordinates, exactly orbit._emit_shadow's semantics — so the orbit
    scan needs no per-iteration argmax/dynamic_slice glue (the
    reference emits HDR shadows from inside the orbit kernel,
    PeriodicityChecker.h:32-46)."""
    n1 = n // LANES

    def kernel(inv_ref, cadd_ref, rnd_ref, cfg_ref, dig_o, sgn_o,
               *shw_o):
        k = pl.program_id(0)
        dbl = cfg_ref[4 * k]
        gswap = cfg_ref[4 * k + 1]
        csign = cfg_ref[4 * k + 2]
        inv = inv_ref[...]                     # [1, 2, n1, 128]
        acc_p, acc_n = _tail_stream_cfg(inv[0, 0], inv[0, 1], n1,
                                        dbl, gswap)
        c = cadd_ref[0]
        z = jnp.zeros_like(c)
        acc_p = acc_p + jnp.where(csign > 0, c, z) + rnd_ref[...]
        acc_n = acc_n + jnp.where(csign > 0, z, c)
        sign, mag = _signed_finish(acc_p, acc_n, n1)
        dig_o[...] = mag[None]
        # basic slice then reshape (None + slice mixed indexing lowers
        # through a gather Mosaic rejects)
        sgn_o[...] = sign[0:8, :].reshape(1, 8, LANES)

        if shadow_fd is not None:
            F_, D_ = shadow_fd
            shw_o[0][...] = _shadow_rows(mag, n1, F_, D_)[None]

    return kernel


def _shadow_rows(mag, n1: int, F_: int, D_: int):
    """[8, LANES] i32 shadow block of a digit plane: the top-digit
    window of the value slice [F, F+D) — (4 window digits, base index)
    in slice coordinates, exactly orbit._emit_shadow's semantics.

    Window extraction packs two 16-bit digits per i32 and SUM-reduces
    (exactly one nonzero position per mask, so the sum IS the value):
    2 full-plane reduces instead of 4."""
    def red2(x):
        return jnp.max(jnp.max(x, axis=-1, keepdims=True),
                       axis=-2, keepdims=True)

    def sum2(x):
        # dtype pinned: under jax_enable_x64 jnp.sum widens i32 to
        # i64, which Mosaic rejects (sums here fit i32 exactly)
        return jnp.sum(jnp.sum(x, axis=-1, keepdims=True,
                               dtype=jnp.int32),
                       axis=-2, keepdims=True, dtype=jnp.int32)

    # digits < 2^16 → value-preserving vector bitcast to i32
    # (Mosaic has no unsigned reductions)
    magi = jax.lax.bitcast_convert_type(mag, jnp.int32)
    flat = _sub_iota(2, n1) * jnp.int32(LANES) + \
        _lane_iota(2) - jnp.int32(F_)
    inreg = (flat >= 0) & (flat < jnp.int32(D_))
    nz = inreg & (magi != 0)
    idx11 = red2(jnp.where(nz, flat, jnp.int32(-1)))
    base11 = jnp.clip(idx11 - 3, jnp.int32(0),
                      jnp.int32(D_ - 4))
    basebc = jnp.broadcast_to(base11, (n1, LANES))
    off = flat - basebc
    zero = jnp.int32(0)
    p01 = sum2(jnp.where(inreg & (off == 0), magi, zero) |
               jnp.where(inreg & (off == 1), magi << 16, zero))
    p23 = sum2(jnp.where(inreg & (off == 2), magi, zero) |
               jnp.where(inreg & (off == 3), magi << 16, zero))
    mask = jnp.int32(0xFFFF)
    rows = [p01 & mask, (p01 >> 16) & mask,
            p23 & mask, (p23 >> 16) & mask, base11]
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    out8 = jnp.zeros((8, LANES), jnp.int32)
    for r, v in enumerate(rows):
        out8 = jnp.where(sub8 == r,
                         jnp.broadcast_to(v, (8, LANES)), out8)
    return out8


def _shadow_rows_b(mag, n1: int, F_: int, D_: int):
    """Batched _shadow_rows: mag [K, n1, LANES] → [K, 8, LANES].

    All reductions stay FULL-SHAPE via _red2_full (no [K, 1, 1]
    tensors — Mosaic's two-axis broadcast is unimplemented with a
    leading batch dim); the [K, 8, LANES] result slices the first 8
    sublanes of the broadcast planes."""
    def sum_i32(x, axis, keepdims):
        # dtype pinned: under jax_enable_x64 jnp.sum widens i32 to
        # i64, which Mosaic rejects (sums here fit i32 exactly)
        return jnp.sum(x, axis=axis, keepdims=keepdims,
                       dtype=jnp.int32)

    K = mag.shape[0]
    magi = jax.lax.bitcast_convert_type(mag, jnp.int32)
    flat = _sub_iota(3, n1) * jnp.int32(LANES) + \
        _lane_iota(3) - jnp.int32(F_)
    inreg = (flat >= 0) & (flat < jnp.int32(D_))
    nz = inreg & (magi != 0)
    idxf = _red2_full(jnp.where(nz, jnp.broadcast_to(flat, magi.shape),
                                jnp.int32(-1)), jnp.max)
    basef = jnp.clip(idxf - 3, jnp.int32(0), jnp.int32(D_ - 4))
    off = jnp.broadcast_to(flat, magi.shape) - basef
    zero = jnp.int32(0)
    p01 = _red2_full(jnp.where(inreg & (off == 0), magi, zero) |
                     jnp.where(inreg & (off == 1), magi << 16, zero),
                     sum_i32)
    p23 = _red2_full(jnp.where(inreg & (off == 2), magi, zero) |
                     jnp.where(inreg & (off == 3), magi << 16, zero),
                     sum_i32)
    mask = jnp.int32(0xFFFF)
    rows = [p01 & mask, (p01 >> 16) & mask,
            p23 & mask, (p23 >> 16) & mask, basef]
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, LANES), 1)
    out = jnp.zeros((K, 8, LANES), jnp.int32)
    for r, v in enumerate(rows):
        out = jnp.where(sub8 == r, v[:, 0:8, :], out)
    return out


def _tail_batched_kernel(n: int, shadow_fd):
    """All K components in ONE kernel invocation, batched on the
    leading dim: the gridded form pays every VPU pass's fixed cost
    once per component; batching runs each pass on [K, n1, 128] so the
    per-op overhead amortizes over K."""
    n1 = n // LANES

    def kernel(inv_ref, cadd_ref, rnd_ref, cfgv_ref, dig_o, sgn_o,
               *shw_o):
        # [K, 1, LANES] lane-complete flag planes (cfgv broadcasts the
        # per-component value across lanes host-side): the only
        # in-kernel broadcast left is sublane-only
        dbl = cfgv_ref[:, 0:1, :]
        gswap = cfgv_ref[:, 1:2, :]
        csign = cfgv_ref[:, 2:3, :]
        r1 = inv_ref[:, 0]                           # [K, n1, LANES]
        r2 = inv_ref[:, 1]
        acc_p, acc_n = _tail_stream_cfg(r1, r2, n1, dbl, gswap)
        c = cadd_ref[...]
        z = jnp.zeros_like(c)
        cs = _bc_full(csign, c.shape) > 0
        acc_p = acc_p + jnp.where(cs, c, z) + rnd_ref[...][None]
        acc_n = acc_n + jnp.where(cs, z, c)
        sign, mag = _signed_finish(acc_p, acc_n, n1)
        dig_o[...] = mag
        sgn_o[...] = sign[:, 0:8, :]
        if shadow_fd is not None:
            F_, D_ = shadow_fd
            shw_o[0][...] = _shadow_rows_b(mag, n1, F_, D_)

    return kernel


# Batched tail default: flipped by A/B on the live backend.
BATCHED_TAIL: bool = False


@functools.partial(jax.jit, static_argnames=("n", "nr", "shadow_fd",
                                             "interpret"))
def _fused_tail_batched(inv, cadd, rnd, cfg, *, n: int, nr: bool,
                        shadow_fd, interpret: bool):
    n1 = n // LANES
    K = inv.shape[0]
    cfg8 = jnp.concatenate([cfg.reshape(K, 4),
                            jnp.zeros((K, 4), jnp.int32)], axis=1)
    cfgv = jnp.broadcast_to(cfg8[:, :, None], (K, 8, LANES))
    out_shape = [jax.ShapeDtypeStruct((K, n1, LANES), jnp.uint32),
                 jax.ShapeDtypeStruct((K, 8, LANES), jnp.int32)]
    if shadow_fd is not None:
        out_shape.append(jax.ShapeDtypeStruct((K, 8, LANES),
                                              jnp.int32))
    return pl.pallas_call(
        _tail_batched_kernel(n, shadow_fd),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(inv.reshape(K, 2, n1, LANES), cadd.reshape(K, n1, LANES),
      rnd.reshape(n1, LANES), cfgv)


@functools.partial(jax.jit, static_argnames=("n", "nr", "shadow_fd",
                                             "interpret"))
def fused_tail(inv, cadd, rnd, sgs, *, n: int, nr: bool = False,
               shadow_fd=None, interpret: bool = False):
    """Fused CRT+carry tail: inv [K, 2, n] (K3 output), cadd [K, n]
    addend digit planes (zeros where none), rnd [n] round plane,
    sgs i32[4] = (scx, scy, sx·sy, 0).  Returns
    (digits [K, n], signs i32[K]) — plus, with shadow_fd=(F, D), the
    per-component shadow rows [K, 5] i32 (4 window digits + base in
    value-slice coordinates; see _tail_split_kernel)."""
    n1 = n // LANES
    K = inv.shape[0]
    one = jnp.int32(1)
    zero = jnp.int32(0)
    if nr:
        # rows (d, xy, u, v): all spectrum-signed; xy/u/v doubled;
        # addends cx (sign scx), cy (scy), +1, none
        cfg = jnp.stack([zero, one, sgs[0], zero,
                         one, one, sgs[1], zero,
                         one, one, one, zero,
                         one, one, one, zero])
    else:
        # rows (d, xy): d signed, no double, +cx; xy unsigned with
        # global sign sx·sy (stream swap) doubled, +cy
        cfg = jnp.stack([zero, one, sgs[0], zero,
                         one, sgs[2], sgs[1], zero])
    if BATCHED_TAIL:
        outs = _fused_tail_batched(inv, cadd, rnd, cfg, n=n, nr=nr,
                                   shadow_fd=shadow_fd,
                                   interpret=interpret)
        if shadow_fd is not None:
            dig, sgn, shw = outs
            return dig.reshape(K, n), sgn[:, 0, 0], shw[:, 0:5, 0]
        dig, sgn = outs
        return dig.reshape(K, n), sgn[:, 0, 0]
    out_specs = [pl.BlockSpec((1, n1, LANES),
                              lambda k: (k, _Z0, _Z0)),
                 pl.BlockSpec((1, 8, LANES),
                              lambda k: (k, _Z0, _Z0))]
    out_shape = [jax.ShapeDtypeStruct((K, n1, LANES), jnp.uint32),
                 jax.ShapeDtypeStruct((K, 8, LANES), jnp.int32)]
    if shadow_fd is not None:
        out_specs.append(pl.BlockSpec((1, 8, LANES),
                                      lambda k: (k, _Z0, _Z0)))
        out_shape.append(jax.ShapeDtypeStruct((K, 8, LANES),
                                              jnp.int32))
    outs = pl.pallas_call(
        _tail_split_kernel(n, shadow_fd),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 2, n1, LANES),
                         lambda k: (k, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, n1, LANES), lambda k: (k, _Z0, _Z0)),
            pl.BlockSpec((n1, LANES), lambda k: (_Z0, _Z0)),
            # explicit i32 index map: a memory-space-only SMEM spec
            # under a grid synthesizes a Python-int map that traces
            # i64 under jax_enable_x64
            pl.BlockSpec((4 * K,), lambda k: (_Z0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(inv.reshape(K, 2, n1, LANES), cadd.reshape(K, n1, LANES),
      rnd.reshape(n1, LANES), cfg)
    if shadow_fd is not None:
        dig, sgn, shw = outs
        return dig.reshape(K, n), sgn[:, 0, 0], shw[:, 0:5, 0]
    dig, sgn = outs
    return dig.reshape(K, n), sgn[:, 0, 0]


# ---------------------------------------------------------------------------
# Paired-digit (base-2^32) fused tail
# ---------------------------------------------------------------------------
#
# The carry machinery above is DATA-SIZE-bound on the VPU (measured
# 11.4/27.6/49.7 µs device at nfft 16384/32768/65536), so the whole
# tail is re-run here on HALF-width planes: two 16-bit digits pack
# into one u32 "pair" (base-2^32 positional digit), the digit planes
# shrink [n/128, 128] → [n/256, 128], and every prefix pass, shift and
# select pays half.  Accumulators that no longer fit u32 carry an i32
# overflow-count side plane (carry-save), converted to single-bit
# generate/propagate by one add before the Kogge-Stone.
#
# The even/odd coefficient deinterleave this needs is FREE: the MXU
# product kernel's phase transforms are matmuls, so column-split
# matrices emit the even and odd coefficient halves as separate
# planes (ntt_mxu.mxu_iter_products_paired) — no shuffle ever runs on
# device.  Reference analogue: the grid-parallel carry pass
# (HpSharkFloatLib/MultiplyNTT.cu:47-153) — redesigned rather than
# translated (VERDICT r3 #5).


def _ovf_add(a, cnt, b):
    """u32 wrapping add with the overflow folded into an i32 count
    plane (a + b wrapping past 2^32 carries weight 2^32 = +1 count)."""
    s = a + b
    return s, cnt + jnp.where(s < b, jnp.int32(1), jnp.int32(0))


def _tail_stream_pairs(r1e, r2e, r1o, r2o, n1p, dbl, gswap):
    """(acc_p, cnt_p, acc_n, cnt_n) base-2^32 pair accumulators of one
    CRT'd product row pair, from residue planes split by coefficient
    parity (even coeff k=2m lands whole at pair m; odd coeff k=2m+1 is
    offset 16 bits: three shifted parts).  Same uniform runtime config
    as _tail_stream_cfg: doubling is a traced flag, a global sign
    swaps the streams."""
    z = jnp.uint32(0)
    d = dbl > 0
    parts = []
    for (r1, r2) in ((r1e, r2e), (r1o, r2o)):
        hi, lo = _k_crt_rec(r1, r2)
        neg = (hi > _C_HALF_HI) | ((hi == _C_HALF_HI) & (lo > _C_HALF_LO))
        nlo = jnp.uint32(_C_P1P2_LO) - lo
        bb = jnp.where(_C_P1P2_LO < lo, jnp.uint32(1), z)
        nhi = jnp.uint32(_C_P1P2_HI) - hi - bb
        hi2 = jnp.where(d, (hi << 1) | (lo >> 31), hi)
        lo2 = jnp.where(d, lo << 1, lo)
        nhi2 = jnp.where(d, (nhi << 1) | (nlo >> 31), nhi)
        nlo2 = jnp.where(d, nlo << 1, nlo)
        parts.append((neg, hi2, lo2, nhi2, nlo2))
    (neg_e, hie, loe, nhie, nloe), (neg_o, hio, loo, nhio, nloo) = parts

    def stream(he, le, ho, lo_):
        cnt = jnp.zeros(he.shape, jnp.int32)
        a, cnt = _ovf_add(le, cnt, lo_ << 16)
        bcnt = jnp.zeros(he.shape, jnp.int32)
        b, bcnt = _ovf_add(he, bcnt, (lo_ >> 16) | (ho << 16))
        a, cnt = _ovf_add(a, cnt, _flat_shift(b, 1, n1p))
        cnt = cnt + _flat_shift(bcnt, 1, n1p)
        a, cnt = _ovf_add(a, cnt, _flat_shift(ho >> 16, 2, n1p))
        return a, cnt

    acc_p, cnt_p = stream(jnp.where(neg_e, z, hie),
                          jnp.where(neg_e, z, loe),
                          jnp.where(neg_o, z, hio),
                          jnp.where(neg_o, z, loo))
    acc_n, cnt_n = stream(jnp.where(neg_e, nhie, z),
                          jnp.where(neg_e, nloe, z),
                          jnp.where(neg_o, nhio, z),
                          jnp.where(neg_o, nloo, z))
    swap = gswap < 0
    return (jnp.where(swap, acc_n, acc_p), jnp.where(swap, cnt_n, cnt_p),
            jnp.where(swap, acc_p, acc_n), jnp.where(swap, cnt_p, cnt_n))


def _pair_carry(lo, cnt, n1p):
    """Canonicalize base-2^32 digit pairs: value = Σ (lo_i + 2^32·cnt_i)
    · 2^32i with cnt small and non-negative.  Returns (pairs u32,
    carry_out i32 full-shape) — the total carry out of the global top
    pair (top count plus lookahead carry; the biased finish reads
    multi-bit carry-outs), the exact analogue of _flat_carry."""
    cin = _flat_shift(cnt, 1, n1p)
    # cnt is small non-negative → value-preserving vector bitcast
    cinu = jax.lax.bitcast_convert_type(cin, jnp.uint32)
    s = lo + cinu
    g = jnp.where(s < cinu, jnp.int32(1), jnp.int32(0))
    p = jnp.where(s == jnp.uint32(0xFFFFFFFF), jnp.int32(1),
                  jnp.int32(0))
    G = _flat_ks(g, p, n1p)
    Gu = jnp.where(G > 0, jnp.uint32(1), jnp.uint32(0))
    out = s + _flat_shift(Gu, 1, n1p)
    cout = _masked_corner(cnt + G, n1p)
    return out, cout


def _twos_complement_pairs(u, n1p):
    """(2^(32·N) − u) mod 2^(32·N) of a canonical pair plane: per-pair
    complement plus increment, the increment's carry a p-only prefix
    (_twos_complement on half-width planes)."""
    pz = jnp.where(u == jnp.uint32(0), jnp.int32(1), jnp.int32(0))
    cin = _flat_shift(_flat_prefix_and(pz, n1p), 1, n1p)
    at0 = (_sub_iota(u.ndim, n1p) == 0) & (_lane_iota(u.ndim) == 0)
    cin = jnp.where(at0, jnp.int32(1), cin)
    cu = jnp.where(cin > 0, jnp.uint32(1), jnp.uint32(0))
    return jnp.uint32(0xFFFFFFFF) - u + cu


def _signed_finish_pairs(acc_p, cnt_p, acc_n, cnt_n, n1p):
    """_signed_finish on base-2^32 pairs in carry-save form.  The bias
    moves to the COUNT plane: D_i = p_i − n_i + 16·2^32 − 16·[i>0]
    telescopes exactly like the 16-bit form (the top pair's +16·2^32
    count is 16·M ≡ 0 mod M), so one canonicalization yields
    u = (pos − neg) mod M with carry-out 16 ⟺ pos ≥ neg.  Counts stay
    in [7, 23] ⊂ [0, 2^31) by construction (stream counts ≤ 5, two
    borrows)."""
    lane = _lane_iota(acc_p.ndim)
    sub = _sub_iota(acc_p.ndim, n1p)
    not0 = (sub > 0) | (lane > 0)
    t = acc_p - acc_n
    b1 = jnp.where(acc_p < acc_n, jnp.int32(1), jnp.int32(0))
    adj = jnp.where(not0, jnp.uint32(16), jnp.uint32(0))
    d_lo = t - adj
    b2 = jnp.where(t < adj, jnp.int32(1), jnp.int32(0))
    d_cnt = cnt_p - cnt_n - b1 - b2 + jnp.int32(16)
    u, cout = _pair_carry(d_lo, d_cnt, n1p)
    v = _twos_complement_pairs(u, n1p)
    pos = cout >= 16
    mag = jnp.where(pos, u, v)
    nzi = jnp.where(mag != jnp.uint32(0), jnp.int32(1), jnp.int32(0))
    nonzero = _red2_full(nzi, jnp.max) > 0
    sign = jnp.where(pos | ~nonzero, jnp.int32(1), jnp.int32(-1))
    return sign, mag


def _tail_paired_kernel(n: int):
    """One grid step = one component's full paired tail.  Inputs are
    the CRT residue rows with each row laid out as even-coefficient
    half ‖ odd-coefficient half (rows 0..n1p-1 / n1p..2n1p-1 after the
    [2, 2·n1p, 128] reshape); addend/round planes arrive PACKED."""
    n1p = n // (2 * LANES)

    def kernel(inv_ref, cadd_ref, rnd_ref, cfg_ref, dig_o, sgn_o):
        k = pl.program_id(0)
        dbl = cfg_ref[4 * k]
        gswap = cfg_ref[4 * k + 1]
        csign = cfg_ref[4 * k + 2]
        inv = inv_ref[...]                 # [1, 2, 2*n1p, LANES]
        r1e = inv[0, 0, :n1p]
        r1o = inv[0, 0, n1p:]
        r2e = inv[0, 1, :n1p]
        r2o = inv[0, 1, n1p:]
        acc_p, cnt_p, acc_n, cnt_n = _tail_stream_pairs(
            r1e, r2e, r1o, r2o, n1p, dbl, gswap)
        c = cadd_ref[0]
        z = jnp.zeros_like(c)
        cs = csign > 0
        acc_p, cnt_p = _ovf_add(acc_p, cnt_p, jnp.where(cs, c, z))
        acc_n, cnt_n = _ovf_add(acc_n, cnt_n, jnp.where(cs, z, c))
        acc_p, cnt_p = _ovf_add(acc_p, cnt_p, rnd_ref[...])
        sign, mag = _signed_finish_pairs(acc_p, cnt_p, acc_n, cnt_n,
                                         n1p)
        dig_o[...] = mag[None]
        sgn_o[...] = sign[0:8, :].reshape(1, 8, LANES)

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "nr", "interpret"))
def fused_tail_paired(inv, caddp, rndp, sgs, *, n: int,
                      nr: bool = False, interpret: bool = False):
    """Paired-digit fused tail: inv [K, 2, n] residue rows, each row
    = even-coefficient half [n/2] ‖ odd-coefficient half (the layout
    ntt_mxu.mxu_iter_products_paired emits); caddp [K, n/2] PACKED
    addend pairs (zeros where none); rndp [n/2] packed round plane;
    sgs as fused_tail.  Returns (pairs [K, n/2] u32, signs i32[K])
    with fixedpoint.unpack_pairs(pairs) bit-identical to fused_tail's
    digits."""
    n1p = n // (2 * LANES)
    K = inv.shape[0]
    one = jnp.int32(1)
    zero = jnp.int32(0)
    if nr:
        cfg = jnp.stack([zero, one, sgs[0], zero,
                         one, one, sgs[1], zero,
                         one, one, one, zero,
                         one, one, one, zero])
    else:
        cfg = jnp.stack([zero, one, sgs[0], zero,
                         one, sgs[2], sgs[1], zero])
    dig, sgn = pl.pallas_call(
        _tail_paired_kernel(n),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 2, 2 * n1p, LANES),
                         lambda k: (k, _Z0, _Z0, _Z0)),
            pl.BlockSpec((1, n1p, LANES), lambda k: (k, _Z0, _Z0)),
            pl.BlockSpec((n1p, LANES), lambda k: (_Z0, _Z0)),
            pl.BlockSpec((4 * K,), lambda k: (_Z0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((1, n1p, LANES),
                                lambda k: (k, _Z0, _Z0)),
                   pl.BlockSpec((1, 8, LANES),
                                lambda k: (k, _Z0, _Z0))),
        out_shape=(jax.ShapeDtypeStruct((K, n1p, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((K, 8, LANES), jnp.int32)),
        interpret=interpret,
    )(inv.reshape(K, 2, 2 * n1p, LANES), caddp.reshape(K, n1p, LANES),
      rndp.reshape(n1p, LANES), cfg)
    return dig.reshape(K, n // 2), sgn[:, 0, 0]


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
    # Raised scoped-VMEM limit: at the View #32 operand (nfft 131072 →
    # [4, 256, 512] blocks) the unrolled stage chain's stack peaks at
    # ~27 MB against the 16 MB default and the compile fails; the
    # whole-kernel family already runs at 64-120 MB limits on v5e.
    cp = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, m, L), jnp.uint32),
        compiler_params=cp,
        interpret=interpret,
    )(y, jnp.asarray(w), jnp.asarray(wp), jnp.asarray(p))
