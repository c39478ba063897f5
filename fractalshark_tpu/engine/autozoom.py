"""Automated zoom animation (reference ``AutoZoomer.h:7-31``,
heuristics {Default, Max, Feature, FilamentTip}, ``Fractal.h:101``).

Each step picks a target in the current view and zooms toward it:

* Max / Default — the unescaped-or-slowest region: centroid of the
  highest-iteration pixels (keeps descending into the boundary),
* FilamentTip — the escaped pixel with the highest count (follows a
  filament outward),
* Feature — run the Feature Finder and zoom onto the found nucleus.

The reference pipelines these renders through its thread pool as
non-supersedable jobs; here each step is a synchronous render + view
update, and the async pipeline wraps it when animation is driven
through the render pool.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import numpy as np


class AutoZoomHeuristic(Enum):
    DEFAULT = "default"
    MAX = "max"
    FEATURE = "feature"
    FILAMENT_TIP = "filament_tip"


@dataclass
class AutoZoomer:
    fractal: object
    heuristic: AutoZoomHeuristic = AutoZoomHeuristic.DEFAULT
    scale_per_step: float = 2.0

    def pick_target(self, iters: np.ndarray) -> tuple[float, float]:
        """Screen-space target (x, y) for the next zoom."""
        h, w = iters.shape
        n = self.fractal.num_iterations
        escaped = iters < n
        if not escaped.any():
            return w / 2, h / 2
        if self.heuristic is AutoZoomHeuristic.FILAMENT_TIP:
            vals = np.where(escaped, iters, 0)
            flat = int(vals.argmax())
            return flat % w, flat // w
        # Default/Max: centroid of the slowest-escaping band — tracks
        # the set boundary (interior pixels are excluded so the target
        # never drifts into the cardioid)
        esc_vals = iters[escaped]
        thresh = np.quantile(esc_vals, 0.98)
        mask = escaped & (iters >= thresh)
        ys, xs = np.nonzero(mask)
        return float(xs.mean()), float(ys.mean())

    def step(self) -> dict:
        f = self.fractal
        if self.heuristic is AutoZoomHeuristic.FEATURE:
            feat = f.try_find_periodic_point()
            if feat is not None:
                f.zoom_to_feature(feat, frame_scale=self.scale_per_step)
                return {"target": "feature", "period": feat.period,
                        "zoom": float(f.ptz.zoom_factor.mantissa_exp2()[1])}
            # fall through to max heuristic when no feature found
        iters = np.asarray(f.calc_fractal())
        tx, ty = self.pick_target(iters)
        # scale from AA render grid to screen coordinates
        aa = f.antialiasing
        f.zoom_at(tx / aa, ty / aa, self.scale_per_step)
        return {"target": (tx, ty),
                "zoom_exp2": f.ptz.zoom_factor.exponent2()}

    def run(self, n_steps: int, on_frame=None) -> list:
        log = []
        for _ in range(n_steps):
            info = self.step()
            log.append(info)
            if on_frame is not None:
                on_frame(self.fractal)
        return log
