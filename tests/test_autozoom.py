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


def test_feature_zoom_pipeline_presents_every_frame():
    """The animation path (AutoZoomer.cpp:623-688 parity): precomputed
    ×1.1 steps run as NON-supersedable paced jobs; every frame is
    presented, in generation order, and live state lands on the final
    step."""
    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine.render_pool import RenderThreadPool

    f = Fractal(width=16, height=16, view=0, algorithm="Cpu64",
                num_iterations=64, backend="cpu")
    pool = RenderThreadPool(f, num_workers=2)
    try:
        az = AutoZoomer(f)
        target = PointZoomBBConverter(pt_x="-0.743643887",
                                      pt_y="0.131825904",
                                      zoom_factor="8", prec=64)
        steps = az.setup_feature_zoom(target_ptz=target,
                                      target_iters=256, max_steps=12)
        assert len(steps) == 12
        # iteration interpolation is monotonic to the target
        its = [s.num_iterations for s in steps]
        assert its == sorted(its) and its[-1] == 256
        res = az.run_feature_zoom_pipeline(pool, steps, interval_s=0.01)
        assert not res["aborted"]
        assert res["presented"] == len(steps)
        gens = [g for g, _ in res["frames"]]
        assert gens == sorted(gens)
        # paced cadence: presents are >= interval apart
        times = [t for _, t in res["frames"]]
        assert all(b - a >= 0.009 for a, b in zip(times, times[1:]))
        # live state advanced to the final step (no snap-back)
        assert f.num_iterations == 256
        assert f.ptz.zoom_factor.exponent2() == \
            steps[-1].ptz.zoom_factor.exponent2()
    finally:
        pool.shutdown()


def test_feature_zoom_pipeline_abort_restores_view():
    import threading

    from fractalshark_tpu.core.pointzoom import PointZoomBBConverter
    from fractalshark_tpu.engine.render_pool import RenderThreadPool

    f = Fractal(width=16, height=16, view=0, algorithm="Cpu64",
                num_iterations=64, backend="cpu")
    pool = RenderThreadPool(f, num_workers=1)
    try:
        az = AutoZoomer(f)
        target = PointZoomBBConverter(pt_x="-0.75", pt_y="0.1",
                                      zoom_factor="64", prec=64)
        steps = az.setup_feature_zoom(target_ptz=target, max_steps=30)
        abort = threading.Event()
        n_before_abort = 4

        presented = []

        def on_frame(frame):
            presented.append(frame.generation)
            if len(presented) == n_before_abort:
                abort.set()

        res = az.run_feature_zoom_pipeline(pool, steps, on_frame=on_frame,
                                           abort_flag=abort)
        assert res["aborted"]
        assert res["presented"] < len(steps)
        # the live view was restored to the last PRESENTED step
        assert pool.last_presented_view is not None
        assert f.ptz.zoom_factor.exponent2() == \
            pool.last_presented_view["ptz"].zoom_factor.exponent2()
    finally:
        pool.shutdown()


def test_pool_wait_and_groups():
    from fractalshark_tpu.engine.render_pool import RenderThreadPool

    f = Fractal(width=16, height=16, view=0, algorithm="Cpu64",
                num_iterations=32, backend="cpu")
    pool = RenderThreadPool(f, num_workers=1)
    try:
        g1 = pool.begin_paced_animation()
        g2 = pool.begin_paced_animation()
        assert g1 != g2
        gen = pool.enqueue_mutation(lambda fr: None, supersedable=False,
                                    group=g1, final_only=True)
        assert pool.wait(gen, timeout=30.0)
        # cancelled group's frames are dropped by the consumer
        pool.cancel_paced_animation(g1)
        frame = pool.next_frame(timeout=1.0)
        assert frame is None or frame.group != g1
    finally:
        pool.shutdown()


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
