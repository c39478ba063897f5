"""AutoZoomer tests."""

import numpy as np

from fractalshark_tpu.engine.autozoom import AutoZoomer, AutoZoomHeuristic
from fractalshark_tpu.engine.fractal import Fractal


def test_autozoom_max_descends():
    f = Fractal(width=48, height=48, view=0, algorithm="Cpu64",
                num_iterations=128, backend="cpu")
    z0 = f.ptz.zoom_factor.exponent2()
    az = AutoZoomer(f, AutoZoomHeuristic.MAX, scale_per_step=2.0)
    log = az.run(3)
    assert len(log) == 3
    assert f.ptz.zoom_factor.exponent2() == z0 + 3
    # the zoomed view still shows structure (mixed iteration counts)
    iters = np.asarray(f.calc_fractal())
    assert iters.min() < iters.max()


def test_autozoom_filament():
    f = Fractal(width=32, height=32, view=0, algorithm="Cpu64",
                num_iterations=64, backend="cpu")
    az = AutoZoomer(f, AutoZoomHeuristic.FILAMENT_TIP, scale_per_step=4.0)
    az.run(2)
    assert f.ptz.zoom_factor.exponent2() >= 4


def test_zoom_to_feature():
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    f = Fractal(width=24, height=24,
                view=PointZoomBBConverter(pt_x="-1.7549", pt_y="1e-6",
                                          zoom_factor="1e4", prec=256),
                algorithm="Cpu64", num_iterations=2000, backend="cpu")
    feat = f.try_find_periodic_point(max_period=50)
    assert feat is not None and feat.period == 3
    f.zoom_to_feature(feat)
    # the view is now centered on the nucleus, framed to its size
    assert abs(float(f.ptz.pt_x - feat.center_x)) < 1e-12
    iters = np.asarray(f.calc_fractal())
    # centered on a minibrot: the center pixel must be interior
    assert iters[12, 12] == f.num_iterations
