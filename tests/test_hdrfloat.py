"""HDRFloat tests (mirrors reference TestHDRFloat.cpp /
TestHDRFloatComplex.cpp): differential vs native float64 within range,
exactness of the renormalization bit-twiddling, huge-exponent behavior,
and render-level equivalence (HDR64 escape ≡ f64 escape bit-for-bit)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from fractalshark_tpu.core.views import get_view_preset
from fractalshark_tpu.ops import escape, hdr_escape
from fractalshark_tpu.ops import hdrfloat as hdr
from fractalshark_tpu.ops.hdrfloat import HDR, HDRComplex


def mk(vals, dtype=np.float64):
    arr = np.asarray(vals, dtype)
    return hdr.hdr_from_float(jnp.asarray(arr))


def to_np(x):
    return np.asarray(hdr.hdr_to_float(x))


def test_reduce_normalizes():
    x = HDR(jnp.asarray([6.0, 0.25, -12.0, 0.0]),
            jnp.asarray([0, 0, 0, 0], jnp.int32))
    r = hdr.reduce(x)
    m = np.asarray(r.m)
    e = np.asarray(r.e)
    assert np.allclose(np.abs(m[:3]), [1.5, 1.0, 1.5])
    assert list(e[:3]) == [2, -2, 3]
    assert e[3] == int(hdr.MIN_BIG_EXPONENT)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_frexp_bit_twiddle(dtype):
    rng = np.random.default_rng(1)
    vals = (rng.uniform(-100, 100, 64) *
            np.power(2.0, rng.integers(-60, 60, 64))).astype(dtype)
    h = hdr.reduce(hdr.hdr_from_float(jnp.asarray(vals)))
    back = np.asarray(h.m) * np.power(2.0, np.asarray(h.e), dtype=np.float64)
    np.testing.assert_allclose(back, vals.astype(np.float64), rtol=0)


def test_add_mul_matches_f64():
    rng = np.random.default_rng(2)
    a = rng.uniform(-10, 10, 100)
    b = rng.uniform(-10, 10, 100)
    ha, hb = mk(a), mk(b)
    np.testing.assert_array_equal(to_np(hdr.reduce(hdr.add(ha, hb))), a + b)
    np.testing.assert_array_equal(to_np(hdr.reduce(hdr.sub(ha, hb))), a - b)
    np.testing.assert_array_equal(to_np(hdr.reduce(hdr.mul(ha, hb))), a * b)
    np.testing.assert_array_equal(to_np(hdr.reduce(hdr.square(ha))), a * a)


def test_huge_exponent_no_overflow():
    # values far beyond f64 range: 2^100000 etc.
    a = HDR(jnp.asarray([1.5]), jnp.asarray([100000], jnp.int32))
    b = HDR(jnp.asarray([1.2]), jnp.asarray([99990], jnp.int32))
    p = hdr.reduce(hdr.mul(a, b))
    assert int(p.e[0]) == 100000 + 99990 or int(p.e[0]) == 100000 + 99991
    s = hdr.reduce(hdr.add(a, b))
    # 1.5*2^100000 + 1.2*2^99990 ≈ 1.5012*2^100000
    assert int(s.e[0]) == 100000
    assert abs(float(s.m[0]) - (1.5 + 1.2 * 2 ** -10)) < 1e-12


def test_exponent_diff_ignored():
    a = HDR(jnp.asarray([1.5]), jnp.asarray([0], jnp.int32))
    b = HDR(jnp.asarray([1.9]), jnp.asarray([-300], jnp.int32))
    s = hdr.add(a, b)
    assert float(s.m[0]) == 1.5  # b entirely ignored (diff > 120)


def test_compare_reduced():
    a = hdr.reduce(mk([2.0, 4.0, 1.0, 0.5]))
    b = hdr.reduce(mk([3.0, 4.0, 1.0, 8.0]))
    np.testing.assert_array_equal(
        np.asarray(hdr.lt_reduced(a, b)), [True, False, False, True])
    np.testing.assert_array_equal(
        np.asarray(hdr.gt_reduced(a, b)), [False, False, False, False])


def test_compare_signed():
    a = hdr.reduce(mk([-2.0, 3.0, -1.0, 5.0]))
    b = hdr.reduce(mk([1.0, -3.0, -0.5, 5.0]))
    np.testing.assert_array_equal(
        np.asarray(hdr.compare_signed(a, b)), [-1, 1, -1, 0])


def test_sqrt_divide():
    vals = np.asarray([2.0, 16.0, 0.125, 3.0])
    h = hdr.reduce(mk(vals))
    np.testing.assert_allclose(to_np(hdr.reduce(hdr.hdr_sqrt(h))),
                               np.sqrt(vals), rtol=1e-15)
    d = hdr.reduce(hdr.divide(h, hdr.reduce(mk([4.0, 2.0, 0.5, 7.0]))))
    np.testing.assert_allclose(to_np(d), vals / [4.0, 2.0, 0.5, 7.0],
                               rtol=1e-15)


def test_complex_ops_vs_python():
    rng = np.random.default_rng(3)
    za = rng.uniform(-2, 2, 32) + 1j * rng.uniform(-2, 2, 32)
    zb = rng.uniform(-2, 2, 32) + 1j * rng.uniform(-2, 2, 32)
    ha = hdr.complex_from_hdr(mk(za.real), mk(za.imag))
    hb = hdr.complex_from_hdr(mk(zb.real), mk(zb.imag))

    def c_to_np(z):
        zr = hdr.reduce_complex(z)
        s = np.power(2.0, np.asarray(zr.e, np.float64))
        return np.asarray(zr.re) * s + 1j * np.asarray(zr.im) * s

    np.testing.assert_allclose(c_to_np(hdr.complex_add(ha, hb)), za + zb,
                               rtol=1e-14, atol=1e-14)
    np.testing.assert_allclose(c_to_np(hdr.complex_mul(ha, hb)), za * zb,
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(c_to_np(hdr.complex_sqr(ha)), za * za,
                               rtol=1e-13, atol=1e-13)
    ns = to_np(hdr.reduce(hdr.norm_squared(ha)))
    np.testing.assert_allclose(ns, np.abs(za) ** 2, rtol=1e-13)
    cn = to_np(hdr.reduce(hdr.chebychev_norm(ha)))
    np.testing.assert_allclose(
        cn, np.maximum(np.abs(za.real), np.abs(za.imag)), rtol=1e-14)


def test_hdr64_escape_matches_f64_exactly():
    """HDR<double> escape ≡ plain f64 escape, iteration-for-iteration
    (HDR ops reduce to the identical f64 rounding sequence in range)."""
    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(64, 64)
    params = escape.PlainParams.from_view(ptz, 64, 64)
    f64 = np.asarray(escape.escape_jax(params, 64, 64, 200,
                                       dtype=jnp.float64))
    h64 = np.asarray(hdr_escape.escape_hdr(ptz, 64, 64, 200,
                                           sub_dtype=jnp.float64))
    np.testing.assert_array_equal(f64, h64)


def test_hdr32_escape_close_to_f32():
    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(64, 64)
    params = escape.PlainParams.from_view(ptz, 64, 64)
    f32 = np.asarray(escape.escape_jax(params, 64, 64, 100,
                                       dtype=jnp.float32))
    h32 = np.asarray(hdr_escape.escape_hdr(ptz, 64, 64, 100,
                                           sub_dtype=jnp.float32))
    # identical up to boundary pixels where rounding order differs
    mismatch = (f32 != h32).mean()
    assert mismatch < 0.02, mismatch


def test_hdr32_escape_at_deep_zoom_runs():
    """HDR32 keeps working far beyond f32/f64 exponent range."""
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    ptz = PointZoomBBConverter(pt_x="-0.75", pt_y="0.05",
                               zoom_factor="1e300", prec=1200)
    it = np.asarray(hdr_escape.escape_hdr(ptz, 8, 8, 64,
                                          sub_dtype=jnp.float32))
    assert it.shape == (8, 8)
    # pixels distinguish (dx ~ 1e-300 is representable in HDR)
    assert (it > 0).all()
