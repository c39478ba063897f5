"""Parallel PNG, mmap orbit store, render queue, CLI flag, and NTT
debug-checksum tests."""

import numpy as np
import pytest

from fractalshark_tpu.core.highprecision import HighPrecision


def test_parallel_png_round_trip(tmp_path):
    from fractalshark_tpu.io.png import read_png
    from fractalshark_tpu.io.png_parallel import write_png_parallel
    rng = np.random.default_rng(0)
    for shape, dtype in [((50, 33, 4), np.uint16), ((20, 41, 3), np.uint8)]:
        hi = 65536 if dtype == np.uint16 else 256
        img = rng.integers(0, hi, size=shape).astype(dtype)
        p = str(tmp_path / "p.png")
        write_png_parallel(p, img, num_threads=3)
        np.testing.assert_array_equal(read_png(p), img)


def test_orbit_mmap_load(tmp_path):
    from fractalshark_tpu.engine.perturbation_results import \
        PerturbationResults
    from fractalshark_tpu.engine.reforbit import compute_reference_orbit
    res = compute_reference_orbit(
        HighPrecision("-0.6", prec=128), HighPrecision("0.4", prec=128),
        300, HighPrecision("0.5"), periodicity=True, precision_bits=128)
    p = str(tmp_path / "orbit")
    res.save(p)
    back = PerturbationResults.load(p, mmap=True)
    assert isinstance(back.orbit_x, np.memmap)
    np.testing.assert_array_equal(np.asarray(back.orbit_x), res.orbit_x)


def test_tray_queue(tmp_path):
    from fractalshark_tpu.tray import main as tray_main
    loc = tmp_path / "locs.txt"
    loc.write_text("24 24 -2 -2 2 2 64 1 home\n"
                   "24 24 -1 -1 0 0 32 1 quadrant\n")
    out = tmp_path / "renders"
    rc = tray_main([str(loc), "--out-dir", str(out),
                    "--render-algorithm", "Cpu64"])
    assert rc == 0
    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 2
    from fractalshark_tpu.io.png import read_png
    assert read_png(str(pngs[0])).shape == (24, 24, 4)


def test_cli_perturbation_alg_flag(tmp_path, capsys):
    from fractalshark_tpu.cli import main
    rc = main(["--center-x", "-0.6", "--center-y", "0.4", "--zoom", "1e6",
               "--width", "16", "--height", "16", "--iterations", "200",
               "--render-algorithm", "GpuHDRx32PerturbedLAv2PO",
               "--perturbation-alg", "ST", "--stats"])
    assert rc == 0
    assert '"iter_max"' in capsys.readouterr().out


def test_ntt_stage_checksums_match_oracle():
    from fractalshark_tpu.ops.bignum import fixedpoint as FP
    from fractalshark_tpu.ops.bignum.debug import (
        checksum_multiply_3way, diff_checksums,
        host_multiply_3way_checksums)
    spec = FP.FixedSpec.for_limbs(8)
    rng = np.random.default_rng(7)
    x = HighPrecision(rng.uniform(-2, 2), prec=spec.frac_bits + 20)
    y = HighPrecision(rng.uniform(-2, 2), prec=spec.frac_bits + 20)
    _, dx = FP.hp_to_digits(x, spec)
    _, dy = FP.hp_to_digits(y, spec)
    dev = checksum_multiply_3way(dx, dy, spec)
    host = host_multiply_3way_checksums(dx, dy, spec)
    # output digit stages must agree exactly with the big-int oracle
    assert diff_checksums(dev, host) == []
    assert dev["digits_xx"] == host["digits_xx"]
    assert dev["digits_xy"] == host["digits_xy"]
    # and a corrupted input must localize to the earliest stage
    dx_bad = dx.copy()
    dx_bad[0] ^= 1
    dev_bad = checksum_multiply_3way(dx_bad, dy, spec)
    diffs = diff_checksums(dev_bad, host)
    assert "input_x_digits" in diffs


def test_tray_poster_mode_resumable(tmp_path):
    """--tile-rows renders through the checkpointed TileFarm and a
    second run resumes (no tiles recomputed) while producing the same
    PNG."""
    import os

    from fractalshark_tpu.tray import main

    loc = tmp_path / "locs.txt"
    loc.write_text("96 96 -2.5 -1.5 1.5 1.5 64 1 poster\n")
    out1 = tmp_path / "o1"
    main([str(loc), "--out-dir", str(out1), "--tile-rows", "32"])
    png = next(p for p in os.listdir(out1) if p.endswith(".png"))
    first = (out1 / png).read_bytes()
    # second run with the same ckpt dir: all tiles done -> same output
    main([str(loc), "--out-dir", str(out1), "--tile-rows", "32"])
    assert (out1 / png).read_bytes() == first
    ck = out1 / "tiles_000"
    assert any(f.endswith(".npy") for f in os.listdir(ck))
