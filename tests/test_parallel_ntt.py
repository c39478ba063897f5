"""Limb-sharded NTT (parallel/ntt_sharded.py): bit-identical to the
single-device four-step chain on an 8-virtual-device CPU mesh — the
VERDICT done-criterion for the multi-chip bignum path (analogue of the
reference's whole-GPU cooperative kernel,
KernelHpSharkReferenceOrbit_cu.h:255)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fractalshark_tpu.ops.bignum import ntt as N
from fractalshark_tpu.parallel import ntt_sharded as NS


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return NS.make_limb_mesh(jax.devices()[:8])


def test_forward_bit_identical_65536(mesh):
    n = 65536
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 16, (4, n)).astype(np.uint32)
    want = np.asarray(N.fourstep_forward(jnp.asarray(x), n))
    got = np.asarray(NS.fourstep_forward_sharded(
        jnp.asarray(x), n, mesh)).reshape(4, n)
    np.testing.assert_array_equal(got, want)


def test_round_trip_bit_identical(mesh):
    n = 65536
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 16, (2, n)).astype(np.uint32)
    f = NS.fourstep_forward_sharded(jnp.asarray(x), n, mesh)
    y = np.asarray(NS.fourstep_inverse_sharded(
        f, n, mesh, extra_scale_r=False)).reshape(2, n)
    np.testing.assert_array_equal(y, x)


def test_sharded_3way_products_match_exact_convolution(mesh):
    """Full sharded multiply chain vs an exact big-int oracle AND the
    single-device chain, at the 16384-limb operand size (nfft 65536)."""
    n = 65536
    ndig = n // 2  # zero-padded convolution
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 16, n).astype(np.uint32)
    b = rng.integers(0, 1 << 16, n).astype(np.uint32)
    a[ndig:] = 0
    b[ndig:] = 0

    got = np.asarray(NS.multiply_3way_sharded(a, b, mesh))
    assert got.shape == (6, n)

    # single-device chain for bit-identity
    x = np.zeros((4, n), np.uint32)
    x[0] = x[1] = a
    x[2] = x[3] = b
    f = N.fourstep_forward(jnp.asarray(x), n)
    p_col, pp_col = N._row_consts(4)
    fx, fy = f[:2], f[2:]
    pc, ppc = p_col[:2, :, None][:, :, 0], pp_col[:2, :, None][:, :, 0]
    xx = N._mont_mul_rows(fx, fx, p_col[:2], pp_col[:2])
    yy = N._mont_mul_rows(fy, fy, p_col[:2], pp_col[:2])
    xy = N._mont_mul_rows(fx, fy, p_col[:2], pp_col[:2])
    prod = jnp.concatenate([xx, yy, xy], axis=0)
    want = np.asarray(N.fourstep_inverse_scaled(prod, n,
                                                extra_scale_r=True))
    np.testing.assert_array_equal(got, want)

    # exact oracle on one product (a*b), via CRT of the two residues
    conv = np.zeros(n, dtype=object)
    ai = [int(v) for v in a[:ndig]]
    bi = [int(v) for v in b[:ndig]]
    A = sum(v << (16 * i) for i, v in enumerate(ai))
    B = sum(v << (16 * i) for i, v in enumerate(bi))
    AB = A * B
    # reconstruct the sharded xy rows (scrambled-order safe: CRT per
    # element then weighted sum must equal A·B)
    from math import prod as _mprod
    P1, P2 = N.P1, N.P2
    m1 = pow(P2, -1, P1)
    r1 = got[4].astype(np.int64)
    r2 = got[5].astype(np.int64)
    # CRT: v = r2 + P2 * ((r1 - r2) * m1 mod P1)
    t = ((r1 - r2) % P1) * m1 % P1
    v = r2 + P2 * t
    total = sum(int(vv) << (16 * i) for i, vv in enumerate(v))
    assert total == AB
