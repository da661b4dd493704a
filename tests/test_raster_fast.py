"""Fast-raster consistency: the binned XLA raster and the Pallas tile kernel
must agree with the brute-force reference rasterizer on random triangle
soups (same coverage, same depth winner, same draw-order tie behavior)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rend3_tpu.ops import geometry as G
from rend3_tpu.ops import raster as R
from rend3_tpu.ops import raster_pallas as RP


def random_clip_tris(n, seed, z_range=(0.0, 1.0)):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-1.2, 1.2, (n, 3, 2)).astype(np.float32)
    z = rng.uniform(*z_range, (n, 1, 1)).astype(np.float32) * np.ones((n, 3, 1), np.float32)
    w = np.ones((n, 3, 1), np.float32)
    return jnp.asarray(np.concatenate([xy, z, w], axis=2))


@pytest.mark.parametrize("seed,cull", [(0, R.CullMode.BACK), (1, R.CullMode.FRONT), (2, R.CullMode.NONE)])
def test_binned_xla_matches_reference(seed, cull):
    W = H = 128
    n = 64
    clip = random_clip_tris(n, seed)
    valid = jnp.ones(n, bool)

    ref = R.rasterize(clip, valid, W, H, cull_mode=cull, front_is_cw=True)

    tris = G.cull_and_setup(clip, valid, W, H, cull_mode=cull, front_is_cw=True)
    binned = G.bin_triangles(tris, W, H, tile_cap=n)
    fast = RP.rasterize_binned_xla(tris, binned, W, H, R.CENTER_OFFSET)

    ref_t = np.asarray(ref.tri)
    fast_t = np.asarray(fast.tri)
    # Fast path ids index the same (clipped) table via setup S_ID.
    mismatch = (ref_t != fast_t).mean()
    assert mismatch < 0.002, f"coverage mismatch {mismatch}"  # allow rare edge-tie diffs
    d_err = np.abs(np.asarray(ref.depth) - np.asarray(fast.depth))
    same = (ref_t == fast_t) & (ref_t >= 0)
    assert (d_err * same).max() < 1e-4


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_matches_binned_xla(seed):
    W = H = 128
    n = 64
    clip = random_clip_tris(n, seed)
    valid = jnp.ones(n, bool)

    tris = G.cull_and_setup(clip, valid, W, H, cull_mode=R.CullMode.BACK, front_is_cw=True)
    binned = G.bin_triangles(tris, W, H, tile_cap=n)

    oracle = RP.rasterize_binned_xla(tris, binned, W, H, R.CENTER_OFFSET)
    interpret = jax.default_backend() != "tpu"
    fast = RP.rasterize_binned(tris, binned, W, H, R.CENTER_OFFSET, interpret=interpret)

    assert (np.asarray(oracle.tri) == np.asarray(fast.tri)).all()
    np.testing.assert_allclose(np.asarray(oracle.depth), np.asarray(fast.depth), atol=1e-6)


def test_msaa_binned():
    W = H = 128
    n = 32
    clip = random_clip_tris(n, 7)
    valid = jnp.ones(n, bool)
    ref = R.rasterize(clip, valid, W, H, cull_mode=R.CullMode.BACK, front_is_cw=True,
                      sample_offsets=R.MSAA4_OFFSETS)
    tris = G.cull_and_setup(clip, valid, W, H, cull_mode=R.CullMode.BACK, front_is_cw=True)
    binned = G.bin_triangles(tris, W, H, tile_cap=n)
    fast = RP.rasterize_binned_xla(tris, binned, W, H, R.MSAA4_OFFSETS)
    assert (np.asarray(ref.tri) != np.asarray(fast.tri)).mean() < 0.002
