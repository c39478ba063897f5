"""CLI + engine + PNG integration smoke tests (mirrors the reference CI
smoke render, .github/workflows/build.yml:218-222: View 0 via Cpu64)."""

import numpy as np

from fractalshark_tpu.cli import main
from fractalshark_tpu.io.png import read_png, write_png


def test_cli_smoke_view0_png(tmp_path):
    out = tmp_path / "view0.png"
    rc = main(["--view", "0", "--render-algorithm", "Cpu64",
               "--width", "64", "--height", "64", "--iterations", "128",
               "--output-png", str(out), "--stats"])
    assert rc == 0
    img = read_png(str(out))
    assert img.shape == (64, 64, 4)
    # home view must contain both interior (black) and escaped pixels
    rgb = img[..., :3]
    assert (rgb.sum(axis=-1) == 0).any()
    assert (rgb.sum(axis=-1) > 0).any()


def test_cli_center_zoom_ascii(capsys):
    rc = main(["--center-x", "-0.75", "--center-y", "0", "--zoom", "1",
               "--width", "32", "--height", "32", "--iterations", "64",
               "--render-algorithm", "Cpu64", "--console-output", "ascii"])
    assert rc == 0
    outp = capsys.readouterr().out
    assert len(outp.strip()) > 0


def test_cli_locations_file(tmp_path, capsys):
    locfile = tmp_path / "locs.txt"
    locfile.write_text(
        "32 32 -2 -2 2 2 64 1 home view smoke\n")
    rc = main(["--locations-file", str(locfile), "--location-index", "0",
               "--render-algorithm", "Cpu64", "--stats"])
    assert rc == 0
    assert '"iter_max"' in capsys.readouterr().out


def test_png_16bit_round_trip(tmp_path):
    img = (np.arange(4 * 5 * 4, dtype=np.uint16).reshape(4, 5, 4) * 977)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(img, back)


def test_png_8bit_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(7, 3, 3), dtype=np.uint8)
    p = str(tmp_path / "t8.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(img, back)


def test_save_location_round_trip(tmp_path):
    from fractalshark_tpu.io.saved_location import (
        SavedLocation, load_locations, save_locations)
    from fractalshark_tpu.core.highprecision import HighPrecision

    loc = SavedLocation(
        width=800, height=600,
        min_x=HighPrecision("-2"), min_y=HighPrecision("-1.5"),
        max_x=HighPrecision("1"), max_y=HighPrecision("1.5"),
        num_iterations=1000, antialiasing=2, description="round trip")
    p = str(tmp_path / "locs.txt")
    save_locations(p, [loc])
    back = load_locations(p)
    assert len(back) == 1
    assert back[0].width == 800
    assert back[0].num_iterations == 1000
    assert back[0].description == "round trip"
    assert abs(float(back[0].min_x) - (-2.0)) < 1e-15


def test_cli_feature_scan(capsys):
    import json
    from fractalshark_tpu.cli import main
    rc = main(["--center-x", "-1.75487766624669276", "--center-y", "0",
               "--zoom", "100000", "--feature-scan", "3x3",
               "--feature-mode", "pt", "--feature-max-period", "64",
               "--width", "32", "--height", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["found"] == 1
    assert out["features"][0]["period"] == 3


def test_cli_feature_scan_bad_grid(capsys):
    from fractalshark_tpu.cli import main
    rc = main(["--view", "0", "--feature-scan", "oops",
               "--width", "32", "--height", "32"])
    assert rc == 2
    assert "NXxNY" in capsys.readouterr().err
