"""MXU (matmul) NTT phase transforms: bit-identity against the VPU
butterfly paths and the exact-integer multiply oracle.

The MXU path (ops/bignum/ntt_mxu.py) evaluates the four-step's short
transforms as chunked int8 matmuls.  These tests pin:
* the host-built phase matrices reproduce _axis0_dif/_axis0_dit
  EXACTLY (same scrambled output order, unscaled inverse);
* balanced base-256 chunking round-trips and respects int8 bounds;
* a full multiply with the MXU phases routed in is bit-identical.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fractalshark_tpu.ops.bignum import ntt as N
from fractalshark_tpu.ops.bignum import ntt_mxu as NM


def _rand_rows(rng, rows, m, L):
    out = np.empty((rows, m, L), np.uint32)
    for r in range(rows):
        p = (N.P1, N.P2)[r % 2]
        out[r] = rng.integers(0, p, (m, L), dtype=np.uint64)
    return jnp.asarray(out)


@pytest.mark.parametrize("m", [8, 64, 256])
@pytest.mark.parametrize("inverse", [False, True])
def test_phase_bit_identity(m, inverse):
    rng = np.random.default_rng(m + inverse)
    rows, L = 4, 128
    y = _rand_rows(rng, rows, m, L)
    tws = N._fourstep_consts(m * m, rows)["tw1_i" if inverse
                                          else "tw1_f"]
    p_col, _ = N._row_consts(rows)
    ref = (N._axis0_dit if inverse else N._axis0_dif)(y, tws, p_col)
    got = NM.mxu_transform(y, m=m, inverse=inverse)
    assert got.dtype == jnp.uint32
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_balanced_chunks_roundtrip():
    rng = np.random.default_rng(7)
    v = np.concatenate([
        rng.integers(0, N.P1, 4096, dtype=np.uint64).astype(np.uint32),
        np.array([0, 1, 127, 128, 255, 256, N.P1 - 1, N.P2 - 1],
                 np.uint32)])
    ch = np.asarray(NM._balanced_chunks(jnp.asarray(v)), np.int64)
    assert ch.dtype == np.int64 and np.abs(ch).max() <= 128
    recon = sum(ch[k] * 256 ** k for k in range(4))
    assert (recon == v.astype(np.int64)).all()
    # host-side chunker agrees
    hch = NM._balanced_int8_np(v).astype(np.int64)
    assert (hch == ch).all()


def test_phase_matrix_is_linear_butterfly():
    """M @ basis == butterfly(basis) for a non-power-of-content case:
    spot-check the matrix columns directly."""
    m = 16
    for prime_idx in (0, 1):
        for inverse in (False, True):
            M = NM._phase_matrix(m, prime_idx, inverse)
            rows = 2
            y = np.zeros((rows, m, m), np.uint32)
            y[prime_idx] = np.eye(m, dtype=np.uint32)
            tws = N._fourstep_consts(m * m, rows)[
                "tw1_i" if inverse else "tw1_f"]
            p_col, _ = N._row_consts(rows)
            ref = np.asarray((N._axis0_dit if inverse else N._axis0_dif)(
                jnp.asarray(y), tws, p_col))[prime_idx]
            assert (ref == M).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_form_matches_xla_form(inverse):
    """The fused Pallas kernel (interpret mode on CPU) == einsum form."""
    rng = np.random.default_rng(11 + inverse)
    rows, m, L = 4, 64, 64
    y = _rand_rows(rng, rows, m, L)
    ref = NM.mxu_transform_xla(y, m=m, inverse=inverse)
    got = NM.mxu_transform_pallas(y, m=m, inverse=inverse,
                                  interpret=True)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_multiply_bit_identity_mxu_routed():
    """Full orbit-iteration multiply with NTT_MXU routed in == default
    path, and the x·y stream matches exact big-int arithmetic."""
    from fractalshark_tpu.ops.bignum import fixedpoint as FP
    spec = FP.FixedSpec.for_limbs(2048)   # nfft 8192: four-step path
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, spec.digits, dtype=np.uint32)
    b = rng.integers(0, 1 << 16, spec.digits, dtype=np.uint32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    (bs, bd), bxy = FP.multiply_iter(aj, bj, spec)
    old = NM.NTT_MXU
    NM.NTT_MXU = "force"   # route on the CPU backend too
    try:
        (gs, gd), gxy = FP.multiply_iter(aj, bj, spec)
    finally:
        NM.NTT_MXU = old
    assert int(gs) == int(bs)
    assert (np.asarray(gd) == np.asarray(bd)).all()
    assert (np.asarray(gxy) == np.asarray(bxy)).all()

    # exact-int oracle with in-range values (full-digit inputs above
    # exceed the fixed-point range by design — they only pin identity)
    from fractalshark_tpu.core.highprecision import HighPrecision
    prec = spec.frac_bits + 30
    _, dx = FP.hp_to_digits(HighPrecision(1.375, prec=prec), spec)
    _, dy = FP.hp_to_digits(HighPrecision(-0.8125, prec=prec), spec)
    NM.NTT_MXU = "force"
    try:
        (gs2, gd2), gxy2 = FP.multiply_iter(jnp.asarray(dx),
                                            jnp.asarray(dy), spec)
    finally:
        NM.NTT_MXU = old
    ix, iy = FP.digits_to_int(dx), FP.digits_to_int(dy)
    half = 1 << (spec.frac_bits - 1)
    assert int(gs2) * FP.digits_to_int(np.asarray(gd2)) == \
        (ix * ix - iy * iy + half) >> spec.frac_bits
    assert FP.digits_to_int(np.asarray(gxy2)) == \
        (ix * iy + half) >> spec.frac_bits


def test_iter_kernel_bit_identity():
    """Whole-iteration frequency kernel (interpret mode) == the XLA
    four-step → Montgomery pointwise → scaled-inverse chain, bitwise."""
    nf = 8192
    rng = np.random.default_rng(5)
    D = nf // 2
    vx = np.zeros(nf, np.uint32)
    vy = np.zeros(nf, np.uint32)
    vx[:D] = rng.integers(0, 1 << 16, D)
    vy[:D] = rng.integers(0, 1 << 16, D)
    vx, vy = jnp.asarray(vx), jnp.asarray(vy)

    stacked = jnp.stack([vx, vx, vy, vy])
    f = N.fourstep_forward(stacked, nf)
    p2c, pp2c = N._row_consts(2)
    sq = N._mont_mul_rows(f, f, *N._row_consts(4))
    d = N._mod_sub_rows(sq[0:2], sq[2:4], p2c)
    xy = N._mont_mul_rows(f[0:2], f[2:4], p2c, pp2c)
    prod = jnp.concatenate([d, xy])
    inv_ref = N.fourstep_inverse_scaled(prod, nf, extra_scale_r=True)

    got = NM.mxu_iter_products(vx, vy, n=nf, interpret=True)
    assert got.dtype == jnp.uint32 and got.shape == (4, nf)
    assert (np.asarray(got) == np.asarray(inv_ref)).all()


def test_nr_kernel_bit_identity():
    """NR frequency kernel (interpret) == the XLA chain: forward 8
    rows, spectrum sign negation, Montgomery cross products, scaled
    inverse — bitwise, with mixed signs and unpadded inputs."""
    nf = 8192
    rng = np.random.default_rng(11)
    D = nf // 2

    def vec():
        return rng.integers(0, 1 << 16, D).astype(np.uint32)

    x, y, dx, dy = vec(), vec(), vec(), vec()
    signs = np.array([1, -1, -1, 1], np.int32)

    def pad(v):
        return jnp.asarray(np.concatenate([v, np.zeros(D, np.uint32)]))

    stacked = jnp.stack([pad(x), pad(x), pad(y), pad(y),
                         pad(dx), pad(dx), pad(dy), pad(dy)])
    f = N.fourstep_forward(stacked, nf)
    p8c, _ = N._row_consts(8)
    sgn8 = jnp.asarray(np.repeat(signs, 2).astype(np.int32))
    fneg = jnp.where(f == 0, f, p8c - f)
    f = jnp.where((sgn8 < 0)[:, None], fneg, f)
    p2c, pp2c = N._row_consts(2)

    def mul2(a2, b2):
        return N._mont_mul_rows(a2, b2, p2c, pp2c)

    fx, fy, fdx, fdy = f[0:2], f[2:4], f[4:6], f[6:8]
    d = N._mod_sub_rows(mul2(fx, fx), mul2(fy, fy), p2c)
    xy = mul2(fx, fy)
    u = N._mod_sub_rows(mul2(fx, fdx), mul2(fy, fdy), p2c)
    v = N._mod_add_rows(mul2(fx, fdy), mul2(fy, fdx), p2c)
    inv_ref = N.fourstep_inverse_scaled(
        jnp.concatenate([d, xy, u, v]), nf, extra_scale_r=True)

    got = NM.mxu_nr_products(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(dx),
        jnp.asarray(dy), jnp.asarray(signs), n=nf, interpret=True,
        in_digits=D)
    assert got.shape == (8, nf)
    assert (np.asarray(got) == np.asarray(inv_ref)).all()


def test_iter_kernel_routed_multiply():
    """multiply_iter with MXU_ITER forced == default path, bitwise."""
    from fractalshark_tpu.ops.bignum import fixedpoint as FP
    spec = FP.FixedSpec.for_limbs(2048)   # nfft 8192
    rng = np.random.default_rng(9)
    a = rng.integers(0, 1 << 16, spec.digits, dtype=np.uint32)
    b = rng.integers(0, 1 << 16, spec.digits, dtype=np.uint32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    (bs, bd), bxy = FP.multiply_iter(aj, bj, spec)
    old_m, old_i = NM.NTT_MXU, NM.MXU_ITER
    NM.NTT_MXU, NM.MXU_ITER = "force", True
    try:
        assert NM.use_iter_kernel(spec.nfft)
        (gs, gd), gxy = FP.multiply_iter(aj, bj, spec)
    finally:
        NM.NTT_MXU, NM.MXU_ITER = old_m, old_i
    assert int(gs) == int(bs)
    assert (np.asarray(gd) == np.asarray(bd)).all()
    assert (np.asarray(gxy) == np.asarray(bxy)).all()
