"""Palette + coloring tests (reference FractalPalette.cpp semantics)."""

import jax.numpy as jnp
import numpy as np

from fractalshark_tpu.core.palette import (BIT_DEPTHS, FractalPalette,
                                           PALETTE_TYPES)
from fractalshark_tpu.ops.coloring import color_from_iters, iteration_stats


def test_default_palette_shape():
    p = FractalPalette()
    pal = p.current()
    # Default @ depth 8: 7 transitions × 256 entries
    assert pal.shape == (7 * 256, 3)
    assert pal.dtype == np.uint16


def test_default_palette_anchors():
    p = FractalPalette()
    pal = p.current()
    n = 256
    # after the first ramp we are at pure red; after the last, black
    np.testing.assert_array_equal(pal[n - 1], [65535, 0, 0])
    np.testing.assert_array_equal(pal[2 * n - 1], [65535, 65535, 0])
    np.testing.assert_array_equal(pal[-1], [0, 0, 0])


def test_all_types_and_depths_build():
    p = FractalPalette()
    for t in PALETTE_TYPES:
        p.use_palette_type(t)
        for d in BIT_DEPTHS[:3]:
            p.use_depth(d)
            pal = p.current()
            assert pal.shape[0] >= (1 << d)


def test_aux_depth_and_rotation_state():
    p = FractalPalette()
    g0 = p.generation
    p.set_aux_depth(3)
    p.rotate(10, 100)
    assert p.aux_depth == 3
    assert p.rotation == 10
    assert p.generation > g0
    p.reset_rotation()
    assert p.rotation == 0


def test_color_from_iters_interior_black():
    pal = jnp.asarray(np.full((16, 3), 30000, np.uint16))
    iters = jnp.asarray(np.array([[5, 100]], np.uint32))
    rgba = np.asarray(color_from_iters(
        iters, pal, jnp.asarray(100, jnp.uint64), jnp.asarray(0, jnp.uint32)))
    assert rgba.shape == (1, 2, 4)
    assert tuple(rgba[0, 0]) == (30000, 30000, 30000, 65535)
    assert tuple(rgba[0, 1]) == (0, 0, 0, 65535)  # interior → black


def test_color_aux_depth_shifts():
    pal = jnp.asarray((np.arange(8)[:, None] * np.ones(3)[None, :] * 1000)
                      .astype(np.uint16))
    iters = jnp.asarray(np.array([[4]], np.uint32))
    # aux_depth=2: index = 4>>2 = 1
    rgba = np.asarray(color_from_iters(
        iters, pal, jnp.asarray(100, jnp.uint64), jnp.asarray(2, jnp.uint32)))
    assert rgba[0, 0, 0] == 1000


def test_color_antialiasing_average():
    pal = jnp.asarray(np.array([[100, 0, 0], [300, 0, 0]], np.uint16))
    iters = jnp.asarray(np.array([[0, 1], [1, 0]], np.uint32))
    rgba = np.asarray(color_from_iters(
        iters, pal, jnp.asarray(100, jnp.uint64), jnp.asarray(0, jnp.uint32),
        antialiasing=2))
    assert rgba.shape == (1, 1, 4)
    assert rgba[0, 0, 0] == 200  # mean of 100,300,300,100


def test_iteration_stats():
    iters = jnp.asarray(np.array([[1, 2], [3, 4]], np.uint32))
    s = iteration_stats(iters)
    assert int(s["min"]) == 1
    assert int(s["max"]) == 4
    assert int(s["sum"]) == 10
