"""One-time extraction of built-in view-preset *data* (coordinates,
iteration budgets) from the reference implementation into
fractalshark_tpu/data/views.json.

Source: /root/reference/FractalSharkLib/FractalViewPresets.cpp (33 views)
plus LargeCoords30.h / LargeCoords32.h (deep-zoom center coordinates).
These are numeric locations in the Mandelbrot set — data, not code.
"""

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/FractalSharkLib")
OUT = Path(__file__).resolve().parent.parent / "fractalshark_tpu" / "data" / "views.json"

STRLIT = re.compile(r'"((?:[^"\\]|\\.)*)"')


def join_string_literals(text: str) -> str:
    return "".join(STRLIT.findall(text))


def load_large_coords(path: Path) -> dict:
    """Extract `const char *NAME = "..." "...";` definitions."""
    text = path.read_text()
    out = {}
    for m in re.finditer(r"const\s+char\s*\*\s*(\w+)\s*=([^;]*);", text, re.S):
        out[m.group(1)] = join_string_literals(m.group(2))
    return out


def main():
    src = (REF / "FractalViewPresets.cpp").read_text()
    coords30 = load_large_coords(REF / "LargeCoords30.h")
    coords32 = load_large_coords(REF / "LargeCoords32.h")

    # Split into cases. 'case 0:' is last (shares 'default').
    case_iter = list(re.finditer(r"^\s*case (\d+):", src, re.M))
    views = {}
    for i, m in enumerate(case_iter):
        n = int(m.group(1))
        start = m.end()
        end = case_iter[i + 1].start() if i + 1 < len(case_iter) else len(src)
        body = src[start:end]
        v = {}

        # PointZoomBBConverter convert{X, Y, ZOOM, TestMode}
        conv = re.search(
            r"PointZoomBBConverter\s+convert\s*\{(.*?)PointZoomBBConverter::TestMode",
            body, re.S)
        if conv and n != 30:
            args = conv.group(1)
            hps = re.findall(r"HighPrecision\s*\{([^{}]*)\}", args, re.S)
            vals = []
            for h in hps:
                h = h.strip()
                if h.startswith('"'):
                    vals.append(join_string_literals(h))
                elif h in ("strX", "strY"):
                    vals.append(coords32[h] if n == 32 else coords30[h])
                else:
                    vals.append(h)
            assert len(vals) == 3, (n, len(vals))
            v["kind"] = "ptz"
            v["pt_x"], v["pt_y"], v["zoom"] = vals
        elif n == 30:
            # case 30 parses hex-limb dumps; LargeCoords30.h also carries the
            # full-precision decimal strings strX/strY — use those.
            zoom = re.search(r'HighPrecision\{"([0-9.eE+\-]+)"\},\s*\n?\s*PointZoomBBConverter::TestMode', body)
            v["kind"] = "ptz"
            v["pt_x"] = coords30["strX"]
            v["pt_y"] = coords30["strY"]
            v["zoom"] = zoom.group(1) if zoom else "1.36733731087e+114514"
        else:
            bb = {}
            for field in ("minX", "minY", "maxX", "maxY"):
                fm = re.search(
                    r"result\.%s\s*=\s*\n?\s*HighPrecision\s*\{(.*?)\};" % field,
                    body, re.S)
                if fm:
                    bb[field] = join_string_literals(fm.group(1))
            if len(bb) == 4:
                v["kind"] = "bb"
                v["min_x"], v["min_y"] = bb["minX"], bb["minY"]
                v["max_x"], v["max_y"] = bb["maxX"], bb["maxY"]
            else:
                print(f"warning: case {n}: no coords parsed", file=sys.stderr)
                continue

        it = re.search(r"result\.numIterations\s*=\s*([0-9']+)", body)
        if it:
            v["num_iterations"] = int(it.group(1).replace("'", ""))
        aa = re.search(r"result\.gpuAntialiasing\s*=\s*(\d+)", body)
        if aa:
            v["antialiasing"] = int(aa.group(1))
        if re.search(r"IterTypeEnum::Bits64", body):
            v["iter_type"] = 64
        if re.search(r"setLADefaultsMaxPerf\s*=\s*true", body):
            v["la_defaults_max_perf"] = True
        ce = re.search(r"compressionErrorExpLow\s*=\s*(\d+)", body)
        if ce:
            v["compression_error_exp_low"] = int(ce.group(1))
        views[str(n)] = v

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps({"views": views}, indent=1))
    sizes = {k: sum(len(str(x)) for x in v.values()) for k, v in views.items()}
    print(f"wrote {OUT}: {len(views)} views; total bytes {OUT.stat().st_size}")
    print("views:", sorted(int(k) for k in views))


if __name__ == "__main__":
    main()
