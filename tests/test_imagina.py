"""Imagina .im orbit format + engine orbit persistence tests (mirrors
reference TestReferenceSave / TestImaginaLoad in CrummyTest)."""

import struct

import numpy as np
import pytest

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.fractal import Fractal
from fractalshark_tpu.engine.reforbit import compute_reference_orbit
from fractalshark_tpu.io.imagina import (SHARKS_MAGIC, _read_mpf,
                                         _write_mpf, load_orbit_im,
                                         save_orbit_im)


def test_mpf_stream_round_trip():
    vals = ["0", "1", "-2.5", "0.1",
            "-1.76339917706675269585422012081849339487476471507552e-01",
            "1e-300", "123456789.987654321"]
    for v in vals:
        x = HighPrecision(v, prec=512)
        buf = bytearray()
        _write_mpf(buf, x)
        back, off = _read_mpf(bytes(buf), 0, 512)
        assert off == len(buf)
        assert (back - x).is_zero() or \
            abs((back - x).exponent2() - x.exponent2()) > 400, v


@pytest.fixture(scope="module")
def orbit():
    return compute_reference_orbit(
        HighPrecision("-0.743643887037158704752191506114774", prec=256),
        HighPrecision("0.131825904205311970493132056385139", prec=256),
        2000, HighPrecision("1e-9", prec=64), periodicity=True,
        precision_bits=256)


def test_im_round_trip(tmp_path, orbit):
    p = str(tmp_path / "orbit.im")
    save_orbit_im(p, orbit)
    with open(p, "rb") as f:
        magic = struct.unpack("<Q", f.read(8))[0]
    assert magic == SHARKS_MAGIC

    back = load_orbit_im(p)
    assert (back.center_x - orbit.center_x).is_zero()
    assert (back.center_y - orbit.center_y).is_zero()
    assert back.results is not None
    res = back.results
    assert res.count_orbit_entries() == orbit.count_orbit_entries()
    assert res.period == orbit.period
    # decompressed orbit reproduces the original within the compression
    # tolerance (relative 2^-20)
    n = res.count_orbit_entries()
    mag = np.hypot(orbit.orbit_x[:n], orbit.orbit_y[:n]) + 1e-30
    err = np.hypot(res.orbit_x[:n] - orbit.orbit_x[:n],
                   res.orbit_y[:n] - orbit.orbit_y[:n]) / mag
    assert err.max() < 2.0 ** -18


def test_engine_save_load_render(tmp_path, orbit):
    """Save an orbit from one engine, load into another, render — the
    perturbation render must match (TestReferenceSave flow)."""
    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512)
    f1 = Fractal(width=24, height=24, view=ptz,
                 algorithm="GpuHDRx32PerturbedLAv2PO",
                 num_iterations=1500, backend="cpu")
    it1 = np.asarray(f1.calc_fractal())
    p = str(tmp_path / "o.im")
    f1.save_ref_orbit(p, compression="imagina")
    from fractalshark_tpu.engine.renderers import get_orbit_calc
    saved = get_orbit_calc(f1).cache[-1]

    f2 = Fractal(width=24, height=24, view=ptz,
                 algorithm="GpuHDRx32PerturbedLAv2PO",
                 num_iterations=1500, backend="cpu")
    loaded = f2.load_ref_orbit(p)
    it2 = np.asarray(f2.calc_fractal())
    # compression error can flip a few boundary pixels only
    assert (it1 == it2).mean() > 0.97

    d = Fractal.diff_ref_orbits(saved, loaded)
    assert d["period_match"]
    assert d["max_abs_dx"] < 1e-5


def test_own_format_save_load(tmp_path):
    ptz = PointZoomBBConverter(pt_x="-0.6", pt_y="0.45", zoom_factor="1e3")
    f = Fractal(width=16, height=16, view=ptz, algorithm="Cpu64PerturbedBLA",
                num_iterations=300, backend="cpu")
    f.calc_fractal()
    p = str(tmp_path / "own")
    f.save_ref_orbit(p, compression="none")
    loaded = f.load_ref_orbit(p, imagina=False)
    assert loaded.count_orbit_entries() > 0


def test_save_iters_as_text(tmp_path):
    f = Fractal(width=8, height=8, view=0, algorithm="Cpu64",
                num_iterations=32, backend="cpu")
    f.calc_fractal()
    p = str(tmp_path / "iters.txt")
    f.save_iters_as_text(p)
    arr = np.loadtxt(p)
    assert arr.shape == (8, 8)
    assert arr.max() <= 32


def test_orbit_parameter_pack_recommendation(tmp_path):
    """OrbitParameterPack re-derives view + algorithm + iteration type
    from a loaded orbit (RecommendedSettings, RefOrbitCalc.cpp:3483);
    an AUTO fractal adopts it, an explicit algorithm wins."""
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine.fractal import Fractal
    from fractalshark_tpu.engine.renderers import get_orbit_calc
    from fractalshark_tpu.io.imagina import (OrbitParameterPack,
                                             load_orbit_im)

    ptz = PointZoomBBConverter(
        pt_x="-0.743643887037158704752191506114774",
        pt_y="0.131825904205311970493132056385139",
        zoom_factor="1e8", prec=512)
    f1 = Fractal(width=16, height=16, view=ptz,
                 algorithm="GpuHDRx32PerturbedLAv2PO",
                 num_iterations=800, backend="cpu")
    f1.calc_fractal()
    p = str(tmp_path / "o.im")
    f1.save_ref_orbit(p, compression="imagina")

    pack = OrbitParameterPack(load_orbit_im(p))
    assert pack.iter_type_bits == 32
    alg = pack.recommended_algorithm(has_accelerator=False)
    # 1e8 = ~27 bits of zoom: direct f64 still covers it (auto_select
    # thresholds); the point is the pack derives it from the ORBIT file
    assert alg.name == "Cpu64"
    assert pack.zoom_exp2 > 20
    # AUTO fractal adopts the recommendation on load
    f2 = Fractal(width=16, height=16, view=ptz, algorithm="AUTO",
                 num_iterations=800, backend="cpu")
    f2.load_ref_orbit(p)
    assert f2.algorithm_name == alg.name
    # explicit algorithm is NOT clobbered
    f3 = Fractal(width=16, height=16, view=ptz,
                 algorithm="GpuHDRx32PerturbedLAv2PO",
                 num_iterations=800, backend="cpu")
    f3.load_ref_orbit(p)
    assert f3.algorithm_name == "GpuHDRx32PerturbedLAv2PO"


def test_im_writer_golden_crc(tmp_path):
    """Byte-level golden of save_orbit_im output (VERDICT r3 #9): the
    reference's sample .im artifacts are git-LFS stubs here, so format
    drift in the writer (header layout, mpf streams, HRReal packing,
    LAReferenceTrivialContent, entry framing) can't be caught against
    them — pin a CRC of the writer's own bytes instead.  The orbit is
    fully synthetic (exact-IEEE f64 z<-z^2+c at an interior point), so
    the golden is independent of the orbit-computation code."""
    import zlib
    from dataclasses import replace

    n = 64
    cx, cy = -0.12, 0.74    # period-3 bulb interior: orbit stays bounded
    ox = np.zeros(n)
    oy = np.zeros(n)
    zx = zy = 0.0
    for k in range(n):
        ox[k], oy[k] = zx, zy
        zx, zy = zx * zx - zy * zy + cx, 2.0 * zx * zy + cy
    from fractalshark_tpu.engine.perturbation_results import \
        PerturbationResults
    res = PerturbationResults(
        center_x=HighPrecision("-0.12", prec=256),
        center_y=HighPrecision("0.74", prec=256),
        orbit_x=ox, orbit_y=oy,
        max_radius=HighPrecision("1e-6", prec=64),
        period=0, escaped_at=0, max_iterations=1000,
        precision_bits=256, compression_error_exp=20)
    p1 = str(tmp_path / "golden_plain.im")
    save_orbit_im(p1, res)
    with open(p1, "rb") as f:
        b1 = f.read()
    assert (len(b1), zlib.crc32(b1)) == (433, 0x13C5742E)

    # ExtendedRange payload (HRReal (m, e) entries incl. a sub-f64 dip)
    oe = np.zeros(n, np.int32)
    ox2 = ox.copy()
    oy2 = oy.copy()
    ox2[40] = 0.71875
    oy2[40] = -0.40625
    oe[40] = -5000
    deep = replace(res, orbit_x=ox2, orbit_y=oy2, orbit_e=oe)
    p2 = str(tmp_path / "golden_ext.im")
    save_orbit_im(p2, deep)
    with open(p2, "rb") as f:
        b2 = f.read()
    assert (len(b2), zlib.crc32(b2)) == (529, 0xF84C765D)


def test_extended_range_round_trip(tmp_path, orbit):
    """ExtendedRange payload: an orbit with sub-f64 HDR dips exports
    as HRReal (m, e) entry pairs, and a reload preserves the dip's
    (mantissa, shared-exp) form where the f64 payload stores 0.0
    (Imagina's deep-orbit format; PeriodicityChecker.h:32-33 stores
    HDRFloat per entry)."""
    from dataclasses import replace

    from fractalshark_tpu.io.imagina import load_orbit_im, save_orbit_im

    # plant a sub-f64 dip mid-orbit: value (0.71875, -0.40625)·2^-5000
    dip = 900
    ox = orbit.orbit_x.copy()
    oy = orbit.orbit_y.copy()
    oe = np.zeros(len(ox), np.int32)
    ox[dip] = 0.71875
    oy[dip] = -0.40625
    oe[dip] = -5000
    deep = replace(orbit, orbit_x=ox, orbit_y=oy, orbit_e=oe)

    # auto-selects ExtendedRange (orbit_e nonzero)
    p = str(tmp_path / "deep.im")
    save_orbit_im(p, deep)
    back = load_orbit_im(p)
    res = back.results
    assert res is not None and res.orbit_e is not None
    assert res.orbit_e[dip] == -5000
    assert res.orbit_x[dip] == 0.71875
    assert res.orbit_y[dip] == -0.40625
    # non-dip entries round-trip as before (plain, orbit_e == 0)
    n = res.count_orbit_entries()
    assert (res.orbit_e[:n] != 0).sum() == 1

    # the f64 payload provably loses the dip
    p2 = str(tmp_path / "deep_f64.im")
    save_orbit_im(p2, deep, extended=False)
    flat = load_orbit_im(p2).results
    assert flat.orbit_e is None
    assert flat.orbit_x[dip] == 0.0 and flat.orbit_y[dip] == 0.0
