"""Queued hi-res renderer — the FractalTray analogue.

The reference's tray app queues saved locations for unattended hi-res
rendering; this module consumes a saved-locations file and renders each
entry to a PNG through the async render pool, with per-item progress,
abort support, and parallel PNG encoding.

    python -m fractalshark_tpu.tray locations.txt --out-dir renders/
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fractalshark-tray")
    p.add_argument("locations", help="saved-locations text file")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--render-algorithm", default="AUTO")
    p.add_argument("--width", type=int, default=None,
                   help="override the per-location width")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--abort-file", default=None,
                   help="touch this file to stop the queue")
    p.add_argument("--tile-rows", type=int, default=None,
                   help="poster mode: render in checkpointed row bands "
                        "of this height (resumable across runs)")
    p.add_argument("--ckpt-dir", default=None,
                   help="tile checkpoint directory (default: out-dir)")
    args = p.parse_args(argv)

    from fractalshark_tpu.engine.fractal import Fractal
    from fractalshark_tpu.io.png_parallel import write_png_parallel
    from fractalshark_tpu.io.saved_location import load_locations
    from fractalshark_tpu.ops.coloring import rgba16_to_rgba8
    from fractalshark_tpu.utils.aux import AbortMonitor

    import numpy as np

    locs = load_locations(args.locations)
    if not locs:
        print("no locations found", file=sys.stderr)
        return 2
    os.makedirs(args.out_dir, exist_ok=True)
    monitor = AbortMonitor(sentinel_file=args.abort_file) \
        if args.abort_file else None

    for i, loc in enumerate(locs):
        if monitor is not None and monitor.aborted():
            print("aborted by sentinel")
            break
        w = args.width or loc.width or 1024
        h = args.height or loc.height or 1024
        t0 = time.perf_counter()
        f = Fractal(width=w, height=h, view=loc.to_view(),
                    algorithm=args.render_algorithm,
                    num_iterations=loc.num_iterations,
                    antialiasing=max(1, loc.antialiasing))
        # poster mode's band renderer is the plain f64 escape kernel —
        # only valid for direct (non-reference) algorithms.  A deep
        # perturbation-class location silently got a garbage image here
        # (ADVICE r2 #4); route those through the full renderer dispatch.
        tile_ok = args.tile_rows and \
            not f.resolve_algorithm().requires_reference
        if args.tile_rows and not tile_ok:
            print(f"[{i + 1}/{len(locs)}] {loc.description!r}: algorithm "
                  f"{f.resolve_algorithm().name} needs a reference orbit "
                  "— rendering whole-frame instead of tiled",
                  file=sys.stderr)
        if tile_ok:
            # poster mode: checkpointed resumable tile farm — a killed
            # queue resumes from the finished bands (direct escape
            # algorithms; y0-offset bands are bit-identical to the
            # whole image)
            import jax.numpy as jnp

            from fractalshark_tpu.parallel.tile_farm import TileFarm
            from fractalshark_tpu.ops import escape

            ck = os.path.join(args.ckpt_dir or args.out_dir,
                              f"tiles_{i:03d}")
            farm = TileFarm(f.ptz, w, h, args.tile_rows, ck)

            def render_band(ptz, width, height, y0, th):
                pp = escape.PlainParams.from_view(ptz, width, height)
                return np.asarray(escape.escape_jax(
                    pp, width, th, f.num_iterations,
                    dtype=jnp.float64, y0=y0))

            farm.run(render_band)
            iters = farm.gather_local()
            rgba = np.asarray(f.color(jnp.asarray(iters)))
        else:
            rgba = np.asarray(f.render())
        name = (loc.description.replace(" ", "_")[:40] or f"location{i}")
        out = os.path.join(args.out_dir, f"{i:03d}_{name}.png")
        write_png_parallel(out, rgba16_to_rgba8(rgba))
        print(f"[{i + 1}/{len(locs)}] {out} "
              f"({time.perf_counter() - t0:.1f}s, "
              f"alg {f.resolve_algorithm().name})")
    if monitor is not None:
        monitor.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
