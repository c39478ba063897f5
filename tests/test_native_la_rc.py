"""LA build from a COMPRESSED orbit (native streaming reconstruction).

The RC builder (native_la.generate_native_rc → fs_la_generate_rc) reads
the orbit through the reconstructing accessor — anchors + the f64
recurrence, resetting at every anchor — so its node table must be
BIT-IDENTICAL to a direct native build on CompressedOrbit.decompress()
of the same orbit (same values by construction; reference analogue:
LA building through the decompressing orbit helpers,
PerturbationResultsHelpers.h:51-161).
"""

import numpy as np
import pytest

from fractalshark_tpu.core.hdr_host import HD
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine import native_la as NL
from fractalshark_tpu.engine.perturbation_results import CompressedOrbit
from fractalshark_tpu.engine.reforbit import RefOrbitCalc

pytestmark = pytest.mark.skipif(not NL.available(),
                                reason="native toolchain missing")


@pytest.fixture(scope="module")
def deep_orbit():
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e13", prec=512).square_aspect_ratio(32, 32)
    calc = RefOrbitCalc()
    res = calc.get_and_create_useful_results(ptz, 50_000)
    return ptz, res


def _assert_tables_equal(a, b):
    assert a is not None and b is not None
    for k in ("ref_m", "ref_e", "zc_m", "zc_e", "cc_m", "cc_e",
              "thr_m", "thr_e", "thrc_m", "thrc_e",
              "step_length", "next_stage_la_index"):
        np.testing.assert_array_equal(a._arrays[k], b._arrays[k],
                                      err_msg=k)
    assert a.stage_la_index == b.stage_la_index
    assert a.stage_macro_it_count == b.stage_macro_it_count
    assert a.stage_count == b.stage_count
    assert a.use_at == b.use_at
    if a.use_at:
        assert a.at.step_length == b.at.step_length
        assert a.at.threshold_c == b.at.threshold_c


@pytest.mark.parametrize("error_exp", [20, 30])
def test_rc_build_matches_decompressed_build(deep_orbit, error_exp):
    ptz, res = deep_orbit
    comp = CompressedOrbit.from_uncompressed(res, error_exp=error_exp)
    assert comp.compression_ratio() > 1.5  # the test must compress
    dx, dy = comp.decompress()
    rad = HD.from_hp(res.max_radius)
    direct = NL.generate_native(dx, dy, rad)
    rc = NL.generate_native_rc(comp, rad)
    _assert_tables_equal(direct, rc)


def test_rc_build_identity_anchors(deep_orbit):
    """ratio-1 anchors: the RC accessor reduces to direct reads, so the
    table equals a direct build on the plain orbit."""
    ptz, res = deep_orbit
    comp = CompressedOrbit.identity(res)
    rad = HD.from_hp(res.max_radius)
    x, y = res.orbit_plain()
    direct = NL.generate_native(x, y, rad)
    rc = NL.generate_native_rc(comp, rad)
    _assert_tables_equal(direct, rc)


def test_rc_build_renders_like_decompressed(deep_orbit):
    """End-to-end: an LAv2 render using the RC-built table equals the
    render using the decompressed-build table (identical node data)."""
    from fractalshark_tpu.engine.perturbation_results import \
        PerturbationResults
    from fractalshark_tpu.ops import la_kernel

    ptz, res = deep_orbit
    comp = CompressedOrbit.from_uncompressed(res, error_exp=20)
    rc = NL.generate_native_rc(comp, HD.from_hp(res.max_radius))
    assert rc is not None and rc.is_valid
    # render against the DECOMPRESSED orbit values (the render-side
    # consistency the reference maintains: same reconstruction feeds
    # both the LA build and the delta kernels)
    dx, dy = comp.decompress()
    res_rc = PerturbationResults(
        center_x=res.center_x, center_y=res.center_y,
        orbit_x=dx, orbit_y=dy, max_radius=res.max_radius,
        period=res.period, escaped_at=res.escaped_at,
        max_iterations=res.max_iterations,
        precision_bits=res.precision_bits)
    out = np.asarray(la_kernel.la_perturb_render(
        res_rc, rc, ptz, 16, 16, 20_000, sub_dtype=np.float64))
    assert out.min() > 0


def test_streamed_two_call_matches_one_call(deep_orbit):
    """The two-call protocol (fs_la_begin_rc → exact-n fs_la_collect)
    must be bit-identical to the one-call fs_la_generate_rc — same
    builder, only the output-buffer sizing differs (the two-call path
    removes the cap-guessing failure mode at View #27 scale)."""
    ptz, res = deep_orbit
    comp = CompressedOrbit.from_uncompressed(res, error_exp=20)
    rad = HD.from_hp(res.max_radius)
    one = NL.generate_native_rc(comp, rad)
    two, info = NL.generate_native_rc_streamed(comp, rad)
    _assert_tables_equal(one, two)
    assert info["n_nodes"] == len(two.las) == info["cnt"]
    assert info["n_stage_entries"] >= two.stage_count
