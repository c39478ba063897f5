"""Paired-digit (base-2^32) iteration pipeline: bit-identity against
the unpaired kernels and exact Python-int oracles (the same
differential strategy as test_bignum.py / test_ntt_iter_fused.py —
the reference validates its CUDA bignum against MPIR the same way,
``HpSharkFloatTest``).

The paired route (VERDICT r3 #5) packs two 16-bit digits per u32 so
the fused tail's carry machinery runs on half-width planes; the
even/odd coefficient deinterleave is absorbed into host-split phase
matrices (ntt_mxu._iter_tables_paired), so these tests pin three
layers: the tail alone, the product kernels alone, and the whole
iterate_z/iterate_z_nr step."""

import numpy as np
import jax.numpy as jnp
import pytest

from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum import ntt as N
from fractalshark_tpu.ops.bignum import ntt_mxu as NM
from fractalshark_tpu.ops.bignum import ntt_pallas as NP


def _unpack(p):
    return np.stack([np.asarray(p) & 0xFFFF, np.asarray(p) >> 16],
                    axis=-1).reshape(*p.shape[:-1], -1)


def _rand_mag(rng, spec):
    d = rng.integers(0, 1 << 16, size=spec.digits, dtype=np.uint32)
    d[-2:] = 0                      # keep |v| < 1 (escape-bounded form)
    return int(rng.choice([-1, 1])), d


@pytest.mark.parametrize("n,nr", [(2048, False), (2048, True),
                                  (4096, False)])
def test_paired_tail_vs_fused_tail(n, nr):
    rng = np.random.default_rng(3 + n + nr)
    K = 4 if nr else 2
    inv = np.stack([rng.integers(0, N.P1, size=(K, n), dtype=np.uint32),
                    rng.integers(0, N.P2, size=(K, n), dtype=np.uint32)],
                   axis=1)
    cadd = rng.integers(0, 1 << 16, size=(K, n), dtype=np.uint32)
    rnd = np.zeros((n,), np.uint32)
    rnd[n // 4] = 1 << 15
    sgs = jnp.asarray([1, -1, -1, 0], jnp.int32)
    dig, sgn = NP.fused_tail(jnp.asarray(inv), jnp.asarray(cadd),
                             jnp.asarray(rnd), sgs, n=n, nr=nr,
                             interpret=True)
    inv_eo = np.concatenate([inv[..., 0::2], inv[..., 1::2]], axis=-1)
    caddp = np.stack([FP.pack_pairs_np(cadd[k]) for k in range(K)])
    digp, sgnp = NP.fused_tail_paired(
        jnp.asarray(inv_eo), jnp.asarray(caddp),
        jnp.asarray(FP.pack_pairs_np(rnd)), sgs, n=n, nr=nr,
        interpret=True)
    np.testing.assert_array_equal(_unpack(np.asarray(digp)),
                                  np.asarray(dig))
    np.testing.assert_array_equal(np.asarray(sgnp), np.asarray(sgn))


def test_paired_products_vs_unpaired():
    """Smallest paired-supported transform (nfft 32768): the paired
    product rows must equal the unpaired ones after re-interleaving
    the even/odd halves — for both the plain and the NR kernel."""
    n, D = 32768, 16384
    assert NM.paired_kernel_supported(n, D)
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1 << 16, size=(D,), dtype=np.uint32)
    y = rng.integers(0, 1 << 16, size=(D,), dtype=np.uint32)
    ref = np.asarray(NM.mxu_iter_products(
        jnp.asarray(x), jnp.asarray(y), n=n, interpret=True,
        in_digits=D))
    got = np.asarray(NM.mxu_iter_products_paired(
        jnp.asarray(FP.pack_pairs_np(x)),
        jnp.asarray(FP.pack_pairs_np(y)), n=n, interpret=True,
        in_digits=D))
    inter = np.empty_like(got)
    inter[:, 0::2] = got[:, :n // 2]
    inter[:, 1::2] = got[:, n // 2:]
    np.testing.assert_array_equal(inter, ref)

    dx = rng.integers(0, 1 << 16, size=(D,), dtype=np.uint32)
    dy = rng.integers(0, 1 << 16, size=(D,), dtype=np.uint32)
    signs = jnp.asarray([1, -1, 1, -1], jnp.int32)
    refn = np.asarray(NM.mxu_nr_products(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(dx),
        jnp.asarray(dy), signs, n=n, interpret=True, in_digits=D))
    gotn = np.asarray(NM.mxu_nr_products_paired(
        jnp.asarray(FP.pack_pairs_np(x)),
        jnp.asarray(FP.pack_pairs_np(y)),
        jnp.asarray(FP.pack_pairs_np(dx)),
        jnp.asarray(FP.pack_pairs_np(dy)), signs, n=n,
        interpret=True, in_digits=D))
    intn = np.empty_like(gotn)
    intn[:, 0::2] = gotn[:, :n // 2]
    intn[:, 1::2] = gotn[:, n // 2:]
    np.testing.assert_array_equal(intn, refn)


def test_paired_iterate_exact_int():
    """iterate_z_paired vs exact Python-int arithmetic (the
    test_view32_iterate_32768_limbs_exact oracle) at the smallest
    paired size, random signed state."""
    spec = FP.FixedSpec.for_limbs(8192)
    D, F = spec.digits, spec.frac_digits
    rng = np.random.default_rng(7)
    (sx, ax), (sy, ay) = _rand_mag(rng, spec), _rand_mag(rng, spec)
    (scx, cxd), (scy, cyd) = _rand_mag(rng, spec), _rand_mag(rng, spec)
    nsx, nxp, nsy, nyp = FP.iterate_z_paired(
        jnp.int32(sx), jnp.asarray(FP.pack_pairs_np(ax)),
        jnp.int32(sy), jnp.asarray(FP.pack_pairs_np(ay)),
        jnp.int32(scx), jnp.asarray(FP.pack_pairs_np(cxd)),
        jnp.int32(scy), jnp.asarray(FP.pack_pairs_np(cyd)), spec)
    x_i = sx * FP.digits_to_int(ax)
    y_i = sy * FP.digits_to_int(ay)
    cx_i = scx * FP.digits_to_int(cxd)
    cy_i = scy * FP.digits_to_int(cyd)
    shift = 16 * F
    half = 1 << (shift - 1)

    def rhu(v):
        t = v + half
        return (1 if t >= 0 else -1) * (abs(t) >> shift)

    want_x = rhu(x_i * x_i - y_i * y_i + (cx_i << shift))
    want_y = rhu(2 * x_i * y_i + (cy_i << shift))
    got_x = int(np.asarray(nsx)) * FP.digits_to_int(
        FP.unpack_pairs_np(np.asarray(nxp)))
    got_y = int(np.asarray(nsy)) * FP.digits_to_int(
        FP.unpack_pairs_np(np.asarray(nyp)))
    assert got_x == want_x
    assert got_y == want_y


def test_paired_iterate_nr_exact_int():
    """iterate_z_nr_paired vs exact Python ints: the z update plus
    dzdc' = 2·z·dzdc + 1 computed from the PRE-update z
    (MpirOrbitEval order)."""
    spec = FP.FixedSpec.for_limbs(8192)
    F = spec.frac_digits
    rng = np.random.default_rng(17)
    vals = [_rand_mag(rng, spec) for _ in range(6)]
    (sx, ax), (sy, ay), (sdx, adx), (sdy, ady), (scx, cxd), \
        (scy, cyd) = vals
    out = FP.iterate_z_nr_paired(
        jnp.int32(sx), jnp.asarray(FP.pack_pairs_np(ax)),
        jnp.int32(sy), jnp.asarray(FP.pack_pairs_np(ay)),
        jnp.int32(sdx), jnp.asarray(FP.pack_pairs_np(adx)),
        jnp.int32(sdy), jnp.asarray(FP.pack_pairs_np(ady)),
        jnp.int32(scx), jnp.asarray(FP.pack_pairs_np(cxd)),
        jnp.int32(scy), jnp.asarray(FP.pack_pairs_np(cyd)), spec)
    ints = []
    for k in range(4):
        s, m = out[2 * k], out[2 * k + 1]
        ints.append(int(np.asarray(s)) * FP.digits_to_int(
            FP.unpack_pairs_np(np.asarray(m))))
    x_i = sx * FP.digits_to_int(ax)
    y_i = sy * FP.digits_to_int(ay)
    dx_i = sdx * FP.digits_to_int(adx)
    dy_i = sdy * FP.digits_to_int(ady)
    cx_i = scx * FP.digits_to_int(cxd)
    cy_i = scy * FP.digits_to_int(cyd)
    shift = 16 * F
    half = 1 << (shift - 1)

    def rhu(v):
        t = v + half
        return (1 if t >= 0 else -1) * (abs(t) >> shift)

    assert ints[0] == rhu(x_i * x_i - y_i * y_i + (cx_i << shift))
    assert ints[1] == rhu(2 * x_i * y_i + (cy_i << shift))
    assert ints[2] == rhu(2 * (x_i * dx_i - y_i * dy_i) +
                          (1 << (2 * shift)))
    assert ints[3] == rhu(2 * (x_i * dy_i + y_i * dx_i))
