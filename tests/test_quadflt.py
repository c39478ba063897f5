"""Quad-float (4×32) tests against the HighPrecision oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.core.views import get_view_preset
from fractalshark_tpu.ops import escape, quadflt
from fractalshark_tpu.ops.dblflt import DF
from fractalshark_tpu.ops.quadflt import QF


def mk_qf(values, prec=512):
    """QF array from decimal strings via exact 4-way splits."""
    parts = np.asarray([quadflt.qf_from_hp(HighPrecision(v, prec=prec),
                                           np.float32) for v in values])
    return QF(jnp.asarray(parts[:, 0], jnp.float32),
              jnp.asarray(parts[:, 1], jnp.float32),
              jnp.asarray(parts[:, 2], jnp.float32),
              jnp.asarray(parts[:, 3], jnp.float32)), \
        [HighPrecision(v, prec=prec) for v in values]


def _qf_value_hp(q: QF, i: int, prec=512) -> HighPrecision:
    s = HighPrecision(0, prec=prec)
    for comp in (q.a_hi, q.a_lo, q.b_hi, q.b_lo):
        s = s + HighPrecision(float(np.asarray(comp)[i]), prec=prec)
    return s


@pytest.mark.parametrize("op", ["add", "sub", "mul", "sqr"])
def test_qf32_precision_vs_hp(op):
    vals_a = ["1.234567890123456789012345678901", "-0.73456789012345678901",
              "0.000123456789012345678901234", "2.718281828459045235360287"]
    vals_b = ["0.987654321098765432109876543210", "1.41421356237309504880168",
              "-1.00000000000000000000001", "0.5"]
    qa, ha = mk_qf(vals_a)
    qb, hb = mk_qf(vals_b)
    if op == "add":
        qr = quadflt.qf_add(qa, qb)
        hr = [x + y for x, y in zip(ha, hb)]
    elif op == "sub":
        qr = quadflt.qf_sub(qa, qb)
        hr = [x - y for x, y in zip(ha, hb)]
    elif op == "mul":
        qr = quadflt.qf_mul(qa, qb)
        hr = [x * y for x, y in zip(ha, hb)]
    else:
        qr = quadflt.qf_sqr(qa)
        hr = [x * x for x in ha]
    for i, want in enumerate(hr):
        got = _qf_value_hp(qr, i)
        err = got - want
        if err.is_zero():
            continue
        rel_exp = err.exponent2() - max(want.exponent2(), -20)
        # compensated-DF construction: ≥72 effective mantissa bits
        # (measured ~76-103; textbook QD renorm is a ROADMAP item)
        assert rel_exp < -72, (op, i, rel_exp)


def test_qf32_beats_df32():
    # value needing > 48 bits: (1 + 2^-40)² = 1 + 2^-39 + 2^-80
    v = HighPrecision(1, prec=512) + HighPrecision.from_mant_exp(1, -40)
    q, _ = mk_qf([v.to_string(60)])
    sq = quadflt.qf_sqr(q)
    got = _qf_value_hp(sq, 0)
    want = v * v
    err = got - want
    assert err.is_zero() or err.exponent2() < -85


def test_escape_qf_matches_f64():
    v = get_view_preset(0)
    ptz = v.ptz.square_aspect_ratio(48, 48)
    params = escape.PlainParams.from_view(ptz, 48, 48)
    f64 = np.asarray(escape.escape_jax(params, 48, 48, 150,
                                       dtype=jnp.float64))
    q32 = np.asarray(quadflt.escape_qf(ptz, 48, 48, 150, variant="4x32"))
    # 90+ bits ≥ f64's 53: agreement everywhere except rounding-flip
    # boundary pixels
    assert (q32 == f64).mean() > 0.97


def test_engine_4x32_dispatch():
    from fractalshark_tpu.engine.fractal import Fractal
    f = Fractal(width=24, height=24, view=0, algorithm="Gpu4x32",
                num_iterations=100, backend="cpu")
    out = np.asarray(f.calc_fractal())
    assert out.shape == (24, 24)
    assert out.max() == 100


def _qd_bits(dtype, ops=200, seed=0):
    """Measured effective precision of QD ops vs a HighPrecision
    oracle over random mul/add chains."""
    import numpy as np

    import jax.numpy as jnp

    from fractalshark_tpu.core.highprecision import HighPrecision as HP
    from fractalshark_tpu.ops import quadd as Q

    rng = np.random.default_rng(seed)
    prec = 400
    a_hp = HP(rng.uniform(0.5, 2.0), prec=prec)
    b_hp = HP(rng.uniform(0.5, 2.0), prec=prec)

    def to_qd(h):
        comps = Q.qd_from_hp(h, dtype)
        return Q.QD(*(jnp.asarray(np.full((1,), c)) for c in comps))

    a = to_qd(a_hp)
    b = to_qd(b_hp)
    worst = 1e9
    for k in range(ops):
        if k % 2 == 0:
            a = Q.qd_mul(a, b)
            a_hp = a_hp * b_hp
        else:
            a = Q.qd_add(a, b)
            a_hp = a_hp + b_hp
        # keep magnitudes in range
        if abs(float(a_hp)) > 1e6 or abs(float(a_hp)) < 1e-6:
            scale = 2.0 ** -int(np.log2(abs(float(a_hp))))
            a = Q.qd_mul_pow2(a, dtype(scale))
            a_hp = a_hp * HP(scale, prec=prec)
        got = sum(HP(float(np.asarray(c)[0]), prec=prec)
                  for c in a)
        err = abs(float((got - a_hp) / a_hp))
        if err > 0:
            worst = min(worst, -np.log2(err))
    return worst


def test_qd32_effective_precision():
    """True renormalizing QD (4xf32) must beat the compensated
    pair-of-DFs' ~76-bit floor: expect >= 85 effective bits worst-case
    over random op chains (textbook ~3.9x24 ≈ 93)."""
    bits = _qd_bits(np.float32)
    assert bits >= 85, bits


def test_qd64_effective_precision():
    bits = _qd_bits(np.float64, ops=60)
    assert bits >= 180, bits


def test_escape_qd_matches_qf_on_deep_view():
    """The QD escape render agrees with the QF render away from its
    precision floor and is at least as accurate (both beyond f64)."""
    import numpy as np

    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.ops.quadd import escape_qd
    from fractalshark_tpu.ops.quadflt import escape_qf

    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037151", pt_y="0.131825904205330",
        zoom_factor="1e17", prec=256).square_aspect_ratio(24, 24)
    qd = np.asarray(escape_qd(ptz, 24, 24, 600, variant="4x32"))
    qf = np.asarray(escape_qf(ptz, 24, 24, 600, variant="4x32"))
    assert (qd == qf).mean() > 0.9
