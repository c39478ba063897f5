"""HighPrecision unit tests (mirrors reference TestHighPrecisionStrings /
TestMpirSerialization coverage, differential-tested against mpmath)."""

import math
import random

import mpmath
import pytest

from fractalshark_tpu.core.highprecision import HighPrecision, set_default_precision


def test_construct_int():
    assert float(HighPrecision(0)) == 0.0
    assert float(HighPrecision(5)) == 5.0
    assert float(HighPrecision(-123456789)) == -123456789.0


def test_construct_float():
    for v in [0.5, -1.25, 3.141592653589793, 1e300, -1e-300]:
        assert float(HighPrecision(v)) == v


def test_parse_simple():
    assert float(HighPrecision("2")) == 2.0
    assert float(HighPrecision("-2.5")) == -2.5
    assert float(HighPrecision("0.125")) == 0.125
    assert float(HighPrecision("1e3")) == 1000.0
    assert float(HighPrecision("1.5e-3")) == 0.0015
    assert float(HighPrecision(".5")) == 0.5


def test_parse_huge_exponent():
    z = HighPrecision("1.36733731087e+114514", prec=128)
    # exponent2 ≈ 114514 * log2(10) + log2(1.367)
    expected = 114514 * math.log2(10) + math.log2(1.36733731087)
    assert abs(z.exponent2() - expected) <= 2
    tiny = HighPrecision("1", prec=380400 + 192) / z
    assert abs(-tiny.exponent2() - expected) <= 2


def test_string_round_trip():
    s = ("-1.7633991770667526958542201208184933948747647150755250"
         "706970853761736441566245736498735267295596915347542847e-01")
    hp = HighPrecision(s, prec=512)
    s2 = hp.to_string(100)
    hp2 = HighPrecision(s2, prec=512)
    assert (hp - hp2).is_zero() or abs(
        (hp - hp2).exponent2() - hp.exponent2()) > 320


def test_arithmetic_vs_mpmath():
    random.seed(42)
    mpmath.mp.prec = 300
    for _ in range(200):
        a = random.uniform(-10, 10)
        b = random.uniform(-10, 10)
        scale = 10 ** random.randint(-30, 30)
        a *= scale
        b *= scale
        if b == 0:
            continue
        ha, hb = HighPrecision(a, prec=256), HighPrecision(b, prec=256)
        ma, mb = mpmath.mpf(a), mpmath.mpf(b)
        for op, mop in [(ha + hb, ma + mb), (ha - hb, ma - mb),
                        (ha * hb, ma * mb), (ha / hb, ma / mb)]:
            got = mpmath.mpf(op.to_string(40))
            if mop == 0:
                assert abs(got) < mpmath.mpf(10) ** -35
            else:
                assert abs((got - mop) / mop) < mpmath.mpf(10) ** -36, \
                    (a, b, got, mop)


def test_add_exact():
    a = HighPrecision("1", prec=256)
    b = HighPrecision("0.0000000000000000000001", prec=256)  # 1e-22
    c = a + b
    d = c - a
    rel = (d - b) / b
    assert abs(rel) < HighPrecision("1e-50", prec=256)


def test_huge_exponent_diff_add():
    a = HighPrecision("1e1000", prec=128)
    b = HighPrecision("1e-1000", prec=128)
    assert (a + b) == a
    assert (b + a) == a


def test_comparison():
    vals = ["-2.5", "-1", "0", "0.5", "1", "2.5", "1e100"]
    hps = [HighPrecision(v) for v in vals]
    for i in range(len(hps)):
        for j in range(len(hps)):
            assert (hps[i] < hps[j]) == (i < j)
            assert (hps[i] == hps[j]) == (i == j)
            assert (hps[i] >= hps[j]) == (i >= j)


def test_division():
    a = HighPrecision(1, prec=256)
    b = HighPrecision(3, prec=256)
    c = a / b
    # 3 * (1/3) == 1 to ~256 bits
    err = abs(c * b - a)
    assert err < HighPrecision("1e-70")


def test_sqrt():
    x = HighPrecision(2, prec=256)
    r = x.sqrt()
    assert abs(r * r - x) < HighPrecision("1e-70")


def test_pow():
    x = HighPrecision(10, prec=256)
    assert abs(x ** 5 - HighPrecision(100000)) < HighPrecision("1e-60")
    assert abs(x ** -2 - HighPrecision("0.01")) < HighPrecision("1e-60")


def test_mantissa_exp2():
    x = HighPrecision("0.75")
    m, e = x.mantissa_exp2()
    assert math.ldexp(m, e) == 0.75
    assert 0.5 <= m < 1.0


def test_mul_pow2():
    x = HighPrecision("3.5")
    assert float(x.mul_pow2(3)) == 28.0
    assert float(x.mul_pow2(-2)) == 0.875


def test_default_precision():
    old = HighPrecision.DEFAULT_PREC
    try:
        set_default_precision(1024)
        assert HighPrecision("1").prec == 1024
    finally:
        set_default_precision(old)


def test_precision_rounding():
    # rounding to 8 bits: 257 → 256
    x = HighPrecision(257, prec=8)
    assert float(x) == 256.0
    # round-half-even: 258 stays representable? 258 = 0b100000010, 9 bits
    y = HighPrecision(258, prec=8)
    assert float(y) == 258.0  # exactly representable: trailing zero


def test_int_conversion():
    assert int(HighPrecision("123456789123456789", prec=128)) == 123456789123456789
    assert int(HighPrecision("-42.9")) == -42
