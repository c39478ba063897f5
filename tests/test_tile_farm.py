"""Multi-host tile farming: checkpointed queue, resume, DCN gather
(two real jax.distributed CPU processes)."""

import os
import subprocess
import sys

import numpy as np

from fractalshark_tpu.core.views import get_view_preset
from fractalshark_tpu.parallel.tile_farm import (TileFarm, make_tiles,
                                                 render_tile_escape)


def _view(size):
    return get_view_preset(0).ptz.square_aspect_ratio(size, size)


def test_tiles_cover_exactly():
    ts = make_tiles(100, 32)
    assert [t.y0 for t in ts] == [0, 32, 64, 96]
    assert [t.h for t in ts] == [32, 32, 32, 4]
    assert sum(t.h for t in ts) == 100


def test_single_process_matches_whole_render(tmp_path):
    from fractalshark_tpu.ops import escape
    import jax.numpy as jnp
    size = 64
    ptz = _view(size)
    farm = TileFarm(ptz, size, size, 24, str(tmp_path / "ck"))
    n = farm.run(render_tile_escape(max_iter=128))
    assert n == len(farm.tiles)
    img = farm.gather_local()
    p = escape.PlainParams.from_view(ptz, size, size)
    whole = np.asarray(escape.escape_jax(p, size, size, 128,
                                         dtype=jnp.float32))
    np.testing.assert_array_equal(img, whole)


def test_resume_skips_done_tiles(tmp_path):
    size = 48
    ptz = _view(size)
    ck = str(tmp_path / "ck")
    farm = TileFarm(ptz, size, size, 16, ck)
    calls = []

    def counting(ptz_, w, h, y0, th):
        calls.append(y0)
        return render_tile_escape(max_iter=64)(ptz_, w, h, y0, th)

    assert farm.run(counting) == 3
    # second farm over the same checkpoint dir: nothing to do
    farm2 = TileFarm(ptz, size, size, 16, ck)
    assert farm2.pending() == []
    assert farm2.run(counting) == 0
    assert len(calls) == 3


_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # match the test session
pid = int(sys.argv[1]); np_ = int(sys.argv[2]); port = sys.argv[3]
ck = sys.argv[4]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=np_, process_id=pid)
import numpy as np
from fractalshark_tpu.core.views import get_view_preset
from fractalshark_tpu.parallel.tile_farm import (TileFarm,
                                                 render_tile_escape)
size = 48
ptz = get_view_preset(0).ptz.square_aspect_ratio(size, size)
farm = TileFarm(ptz, size, size, 16, ck, process_index=pid,
                process_count=np_)
farm.run(render_tile_escape(max_iter=64))
# banding correctness: THIS process's tiles must equal the matching
# rows of a whole-image render in the same process (cross-process f32
# codegen may differ at escape boundaries, so only same-process rows
# are compared exactly)
import jax.numpy as jnp
from fractalshark_tpu.ops import escape
p0 = escape.PlainParams.from_view(ptz, size, size)
whole = np.asarray(escape.escape_jax(p0, size, size, 64,
                                     dtype=jnp.float32))
for t in farm.my_tiles():
    mine = np.load(farm._tile_path(t))
    assert (mine == whole[t.y0:t.y0 + t.h]).all(), t
img = farm.gather_dcn()
if pid == 0:
    mism = (img != whole).mean()
    assert mism < 0.01, mism     # other process: boundary ulps only
    np.save(os.path.join(ck, "assembled.npy"), img)
"""


def test_two_process_dcn_gather(tmp_path):
    """Two real processes coordinate via jax.distributed over
    localhost (the DCN transport path) and assemble disjoint tile
    sets with process_allgather."""
    import socket

    import jax.numpy as jnp

    from fractalshark_tpu.ops import escape

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    ck = str(tmp_path / "ck")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), "2", str(port), ck],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    # worker 0 asserted tiles == its own whole-image render; here just
    # sanity-check shape and content of the assembled image
    img = np.load(os.path.join(ck, "assembled.npy"))
    assert img.shape == (48, 48)
    assert img.max() == 64 and img.min() >= 0
