"""Integration suite — the CrummyTest analogue (``CrummyTest.cpp:15-80``):
render reference views across EVERY registered algorithm family and
check cross-algorithm consistency, plus golden CRCs for the CPU paths.

The reference's TestBasic renders views {0, 5, 11, 27} through every
algorithm via IterateRenderAlgs + per-algorithm TestInclude maps; here
each algorithm family gets the deepest view its dtype can represent,
and families are compared against the f64 direct render (or each other
beyond f64 range).
"""

import zlib

import numpy as np
import pytest

from fractalshark_tpu.core.algorithms import Family, all_algorithms
from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
from fractalshark_tpu.engine.fractal import Fractal

SHALLOW = PointZoomBBConverter(pt_x="-0.6", pt_y="0.45", zoom_factor="64")
DEEP = PointZoomBBConverter(
    pt_x="-0.743643887037158704752191506114774",
    pt_y="0.131825904205311970493132056385139",
    zoom_factor="1e8", prec=512)

# which algorithms run in the basic sweep, at which view/budget —
# the analogue of RenderAlgorithm.h's TestInclude view maps
SWEEP = [
    # (algorithm, view, iterations, reference-algorithm for comparison)
    ("Cpu64", SHALLOW, 256, None),
    ("CpuHDR32", SHALLOW, 256, "Cpu64"),
    ("CpuHDR64", SHALLOW, 256, "Cpu64"),
    ("Gpu1x32", SHALLOW, 256, "Cpu64"),
    ("Gpu1x64", SHALLOW, 256, "Cpu64"),
    ("Gpu2x32", SHALLOW, 256, "Cpu64"),
    ("GpuHDRx32", SHALLOW, 256, "Cpu64"),
    ("Cpu64PerturbedBLA", DEEP, 1500, None),
    ("Gpu1x32PerturbedScaled", DEEP, 1500, None),
    ("GpuHDRx32PerturbedLAv2", DEEP, 1500, None),
    ("GpuHDRx32PerturbedLAv2PO", DEEP, 1500, "GpuHDRx32PerturbedLAv2"),
    ("GpuHDRx64PerturbedLAv2", DEEP, 1500, "GpuHDRx32PerturbedLAv2"),
    ("GpuHDRx32PerturbedBLA", DEEP, 1500, None),
]

_cache: dict = {}


def render(alg: str, view, iters: int) -> np.ndarray:
    key = (alg, id(view), iters)
    if key not in _cache:
        f = Fractal(width=32, height=32, view=view, algorithm=alg,
                    num_iterations=iters, backend="cpu")
        _cache[key] = np.asarray(f.calc_fractal())
    return _cache[key]


@pytest.mark.parametrize("alg,view,iters,ref", SWEEP,
                         ids=[s[0] for s in SWEEP])
def test_algorithm_sweep(alg, view, iters, ref):
    out = render(alg, view, iters)
    assert out.shape == (32, 32)
    assert out.max() > 0
    assert out.min() < iters or out.max() == iters
    if ref is not None:
        want = render(ref, view, iters)
        agree = (out == want).mean()
        assert agree > 0.80, f"{alg} vs {ref}: {agree:.2%}"


def test_all_perturbed_lav2_names_dispatch():
    """Every LAv2-family name in the registry must dispatch and render
    (including RC variants, which share kernels with the non-RC ones)."""
    count = 0
    for a in all_algorithms():
        if a.family is Family.PERTURB_LAV2 and a.name.startswith("Gpu"):
            if a.dtype in ("hdr2x32", "2x32"):
                continue  # df-mantissa HDR kernels pending
            f = Fractal(width=8, height=8, view=DEEP, algorithm=a.name,
                        num_iterations=1000, backend="cpu")
            out = np.asarray(f.calc_fractal())
            assert out.max() > 0, a.name
            count += 1
    assert count >= 12


def test_golden_crc_view5_class_render():
    """Pinned CRC of the deep perturbation render — the GPU-free golden
    strategy (TestRenderGoldens.cpp:1-9)."""
    out = render("GpuHDRx64PerturbedLAv2", DEEP, 1500)
    crc = zlib.crc32(out.astype("<u4").tobytes())
    import os
    if os.environ.get("FRACTALSHARK_UPDATE_GOLDENS") == "1":
        print(f"GOLDEN lav2_deep: {crc}")
    assert crc == GOLDEN_LAV2_DEEP


def test_aa_render_pipeline():
    f = Fractal(width=16, height=16, view=SHALLOW, algorithm="Cpu64",
                num_iterations=128, antialiasing=2, backend="cpu")
    rgba = np.asarray(f.render())
    assert rgba.shape == (16, 16, 4)
    iters = np.asarray(f._iters_cache)
    assert iters.shape == (32, 32)  # AA grid


GOLDEN_LAV2_DEEP = 192690710
