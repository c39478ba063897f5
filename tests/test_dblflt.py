"""Double-float tests (mirrors reference TestCudaDblflt.cpp coverage):
error-free transforms verified exactly, df32 arithmetic checked against
f64 as the wider oracle, render-level comparison vs f64."""

import jax.numpy as jnp
import numpy as np

from fractalshark_tpu.core.views import get_view_preset
from fractalshark_tpu.ops import dblflt, escape
from fractalshark_tpu.ops.dblflt import DF


def as_f64(d: DF) -> np.ndarray:
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


def rand_df32(rng, n, scale=1.0):
    v = rng.uniform(-scale, scale, n)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo)), \
        hi.astype(np.float64) + lo.astype(np.float64)


def test_two_sum_exact():
    a = jnp.asarray([1.0, 1e10, 0.1], jnp.float64)
    b = jnp.asarray([1e-20, -1e10, 0.2], jnp.float64)
    s, e = dblflt.two_sum(a, b)
    # s + e == a + b exactly (error-free transform)
    np.testing.assert_array_equal(np.asarray(s) + np.asarray(e),
                                  np.asarray(a + b))
    # and e captures what s lost
    assert float(e[0]) == 1e-20


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, 64), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, 64), jnp.float32)
    p, e = dblflt.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_df32_add_mul_vs_f64():
    rng = np.random.default_rng(1)
    da, va = rand_df32(rng, 200)
    db, vb = rand_df32(rng, 200)
    # ~48-bit mantissa → relative error ~2^-45
    np.testing.assert_allclose(as_f64(dblflt.df_add(da, db)), va + vb,
                               rtol=2 ** -44, atol=2 ** -60)
    np.testing.assert_allclose(as_f64(dblflt.df_mul(da, db)), va * vb,
                               rtol=2 ** -44, atol=2 ** -60)
    np.testing.assert_allclose(as_f64(dblflt.df_sqr(da)), va * va,
                               rtol=2 ** -44, atol=2 ** -60)


def test_df32_precision_beats_f32():
    # a value needing more than 24 bits: 1 + 2^-30
    v = 1.0 + 2.0 ** -30
    hi = np.float32(v)
    lo = np.float32(v - np.float64(hi))
    d = DF(jnp.asarray([hi]), jnp.asarray([lo]))
    sq = dblflt.df_sqr(d)
    exact = v * v
    df_err = abs(float(as_f64(sq)[0]) - exact)
    f32_err = abs(float(np.float32(hi * hi)) - exact)
    assert df_err < 1e-13
    assert df_err < f32_err


def test_df_from_hp_exact():
    from fractalshark_tpu.core.highprecision import HighPrecision
    x = HighPrecision("-1.76339917706675269585422012081849339487476471507552",
                      prec=256)
    hi, lo = dblflt.df_from_hp(x, np.float32)
    recon = HighPrecision(hi, prec=256) + HighPrecision(lo, prec=256)
    err = abs(float(x - recon))
    assert err < 2 ** -45


def test_escape_df32_vs_f64_render():
    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(64, 64)
    params = escape.PlainParams.from_view(ptz, 64, 64)
    f64 = np.asarray(escape.escape_jax(params, 64, 64, 150,
                                       dtype=jnp.float64))
    d32 = np.asarray(dblflt.escape_df(ptz, 64, 64, 150, variant="2x32"))
    # 48-bit vs 53-bit: identical away from the set boundary
    assert (f64 != d32).mean() < 0.02


def test_escape_df64_runs():
    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(32, 32)
    out = np.asarray(dblflt.escape_df(ptz, 32, 32, 64, variant="2x64"))
    assert out.shape == (32, 32)
    assert out.max() == 64  # interior present
