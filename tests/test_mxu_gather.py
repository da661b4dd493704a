"""Unit tests for the MXU gather-by-matmul sampler (ops/mxu_gather.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rend3_tpu.ops import mxu_gather as mg


def _reference(img, bx, by, valid, offsets):
    H, W = bx.shape
    Hs, Ws = img.shape
    out = np.zeros((len(offsets), H, W), np.float32)
    for k, (dx, dy) in enumerate(offsets):
        for yy in range(H):
            for xx in range(W):
                if not valid[yy, xx]:
                    continue
                sy, sx = by[yy, xx] + dy, bx[yy, xx] + dx
                if 0 <= by[yy, xx] < Hs and 0 <= bx[yy, xx] < Ws:
                    if 0 <= sy < Hs and 0 <= sx < Ws:
                        out[k, yy, xx] = img[sy, sx]
    return out


PCF_OFFSETS = (
    (-1, 0), (-1, 1),
    (0, -1), (0, 0), (0, 1), (0, 2),
    (1, -1), (1, 0), (1, 1), (1, 2),
    (2, 0), (2, 1),
)


@pytest.mark.parametrize("offsets", [((0, 0),), PCF_OFFSETS])
def test_sample_grid_matches_direct(offsets):
    rng = np.random.default_rng(3)
    H, W = 32, 128
    Hs, Ws = 200, 150
    img = rng.standard_normal((Hs, Ws)).astype(np.float32)
    bx = rng.integers(-10, Ws + 10, size=(H, W)).astype(np.int32)
    by = rng.integers(-10, Hs + 10, size=(H, W)).astype(np.int32)
    valid = rng.random((H, W)) > 0.2

    got, overflow = mg.sample_grid(
        jnp.asarray(img), jnp.asarray(bx), jnp.asarray(by), jnp.asarray(valid),
        offsets, interpret=True,
    )
    want = _reference(img, bx, by, valid, offsets)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sample_grid_multi_tile_screen():
    rng = np.random.default_rng(5)
    H, W = 64, 256  # 2x2 screen tiles
    Hs, Ws = 64, 64  # single source cell
    img = rng.standard_normal((Hs, Ws)).astype(np.float32)
    bx = rng.integers(0, Ws, size=(H, W)).astype(np.int32)
    by = rng.integers(0, Hs, size=(H, W)).astype(np.int32)
    valid = np.ones((H, W), bool)
    offsets = ((0, 0), (1, 1))
    got, overflow = mg.sample_grid(
        jnp.asarray(img), jnp.asarray(bx), jnp.asarray(by), jnp.asarray(valid),
        offsets, interpret=True,
    )
    want = _reference(img, bx, by, valid, offsets)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(got), want)
