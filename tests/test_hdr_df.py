"""HDR double-float (HDRx2x32) perturbation: ~48-bit mantissa
precision between f32 and f64 (reference HDRFloat<CudaDblflt> kernels,
GPU_Render.cu HDRx2x32 variants)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fractalshark_tpu.ops import hdr_df
from fractalshark_tpu.ops.dblflt import DF


class TestHDC2Ops:
    def test_mul_exactness_vs_f64(self):
        rng = np.random.default_rng(3)
        a = rng.uniform(-2, 2, 64)
        b = rng.uniform(-2, 2, 64)
        c = rng.uniform(-2, 2, 64)
        d = rng.uniform(-2, 2, 64)

        def to_hdc2(re, im):
            rh = re.astype(np.float32)
            ih = im.astype(np.float32)
            return hdr_df.HDC2(
                DF(jnp.asarray(rh), jnp.asarray((re - rh).astype(np.float32))),
                DF(jnp.asarray(ih), jnp.asarray((im - ih).astype(np.float32))),
                jnp.zeros(64, jnp.int32))

        za = to_hdc2(a, b)
        zb = to_hdc2(c, d)
        out = hdr_df.reduce(hdr_df.mul(za, zb))
        want_re = a * c - b * d
        got_re = (np.asarray(out.re.hi, np.float64) +
                  np.asarray(out.re.lo, np.float64)) * np.exp2(
                      np.asarray(out.e, np.float64))
        err = np.abs(got_re - want_re)
        scale = np.maximum(np.abs(want_re), 1e-30)
        assert (err / scale < 1e-13).all()   # ~44+ bits survived

    def test_add_exponent_alignment(self):
        big = hdr_df.HDC2(DF(jnp.full(4, 1.5, jnp.float32),
                             jnp.zeros(4, jnp.float32)),
                          DF(jnp.zeros(4, jnp.float32),
                             jnp.zeros(4, jnp.float32)),
                          jnp.full(4, 100, jnp.int32))
        small = hdr_df.HDC2(DF(jnp.full(4, 1.0, jnp.float32),
                               jnp.zeros(4, jnp.float32)),
                            DF(jnp.zeros(4, jnp.float32),
                               jnp.zeros(4, jnp.float32)),
                            jnp.full(4, 70, jnp.int32))
        out = hdr_df.add(big, small)
        # 1.5·2^100 + 1.0·2^70 → mantissa 1.5 + 2^-30
        got = np.asarray(out.re.hi, np.float64) + np.asarray(out.re.lo,
                                                             np.float64)
        assert np.allclose(got, 1.5 + 2.0 ** -30, rtol=0, atol=1e-12)
        assert (np.asarray(out.e) == 100).all()

    def test_ignore_threshold_drops_tiny(self):
        big = hdr_df.HDC2(DF(jnp.full(2, 1.0, jnp.float32),
                             jnp.zeros(2, jnp.float32)),
                          DF(jnp.zeros(2, jnp.float32),
                             jnp.zeros(2, jnp.float32)),
                          jnp.full(2, 0, jnp.int32))
        tiny = hdr_df.HDC2(DF(jnp.full(2, 1.9, jnp.float32),
                              jnp.zeros(2, jnp.float32)),
                           DF(jnp.zeros(2, jnp.float32),
                              jnp.zeros(2, jnp.float32)),
                           jnp.full(2, -400, jnp.int32))
        out = hdr_df.add(big, tiny)
        # the far operand underflows to a ≤2^-126 denormal residue —
        # identical to the f32 HDR ignore-path semantics
        assert (np.asarray(out.re.hi) == 1.0).all()
        assert (np.abs(np.asarray(out.re.lo)) < 2.0 ** -120).all()


@pytest.mark.slow
class TestPrecisionBand:
    def test_df_tracks_f64_where_f32_glitches(self):
        """View 9 (radius ≈ 2^-77) at 40k iterations: the 2x32 render
        must agree with HDRx64 almost everywhere while plain HDRx32
        visibly diverges (the depth band HDRx2x32 exists for)."""
        from fractalshark_tpu.core.algorithms import get_algorithm
        from fractalshark_tpu.engine.fractal import Fractal
        from fractalshark_tpu.engine.renderers import (calc_perturbed,
                                                       get_orbit_calc)
        outs = {}
        for alg in ('GpuHDRx64PerturbedLAv2PO',
                    'GpuHDRx2x32PerturbedLAv2PO',
                    'GpuHDRx32PerturbedLAv2PO'):
            f = Fractal(width=24, height=24)
            f.set_view_preset(9)
            f.num_iterations = 40000
            get_orbit_calc(f).orbit_backend = "native"
            outs[alg] = np.asarray(
                calc_perturbed(f, get_algorithm(alg))).astype(np.int64)
        ref = outs['GpuHDRx64PerturbedLAv2PO']
        df_match = float((outs['GpuHDRx2x32PerturbedLAv2PO'] == ref).mean())
        f32_match = float((outs['GpuHDRx32PerturbedLAv2PO'] == ref).mean())
        assert df_match > 0.95, df_match
        assert df_match > f32_match
