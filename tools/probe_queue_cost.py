"""Measure the MXU-gather work-queue step economics on the real TPU.

The adaptive queues (routine/base.py QUEUE_CLASSES) cost ~1 us/step by
folklore; this probe separates the FIXED per-step cost (scalar control +
block DMA issue) from the VARIABLE cost (bands fired, dot size) by timing
sample_grid_bilinear launches with controlled step counts and band
occupancy on a synthetic atlas.

Usage: python tools/probe_queue_cost.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rend3_tpu.ops import mxu_gather as mg
    from rend3_tpu.utils.devbench import time_op

    H, W = 1088, 1920  # bench-sized screen (34 x 15 = 510 tiles)
    C = 4
    AH, AW = 2048, 2048  # atlas
    planes = jnp.asarray(np.random.rand(C, AH, AW), jnp.float32)
    tiles = jax.jit(
        lambda p: mg.build_bilinear_tiles(p).astype(jnp.bfloat16)
    )(planes)
    tiles = jax.block_until_ready(tiles)

    rng = np.random.default_rng(0)

    def coords_for(cells_per_tile: int, frac_valid: float = 1.0):
        """Every (32,128) screen tile addresses `cells_per_tile` distinct
        atlas cells (pixels striped across them by lane)."""
        n_rows, n_cols = H // mg.STILE_H, W // mg.STILE_W
        bx = np.zeros((H, W), np.int32)
        by = np.zeros((H, W), np.int32)
        Gx = AW // mg.LT
        for tr in range(n_rows):
            for tc in range(n_cols):
                # pick cells_per_tile distinct cells
                cids = rng.integers(0, (AH // mg.LT) * Gx, size=cells_per_tile)
                ys, xs = np.divmod(cids, Gx)
                lane = np.arange(mg.STILE_W) % cells_per_tile
                tile_bx = xs[lane][None, :] * mg.LT + 7
                tile_by = ys[lane][None, :] * mg.LT + 9
                bx[tr * 32 : tr * 32 + 32, tc * 128 : tc * 128 + 128] = tile_bx
                by[tr * 32 : tr * 32 + 32, tc * 128 : tc * 128 + 128] = tile_by
        valid = rng.random((H, W)) < frac_valid
        f = jnp.asarray(rng.random((H, W)), jnp.float32)
        return (
            jnp.asarray(bx), jnp.asarray(by), f, f,
            jnp.ones((H, W), jnp.float32), jnp.asarray(valid),
        )

    nT = (H // 32) * (W // 128)
    print(f"screen tiles: {nT}")

    for cpt in (1, 2, 4, 8):
        bx, by, fx, fy, wt, valid = coords_for(cpt)
        steps = nT * cpt  # every tile: cpt pairs (init rides the first)
        fn = jax.jit(
            lambda bx, by, fx, fy, wt, valid: mg.sample_grid_bilinear(
                planes, bx, by, fx, fy, wt, valid,
                pair_cap=max(16, cpt * 2), dot_dtype=jnp.bfloat16,
                tiles=tiles, queue_cap=steps + 8,
            )[0]
        )
        ms = time_op(fn, bx, by, fx, fy, wt, valid, iters=8,
                     name=f"cells/tile={cpt}")
        print(
            f"cells/tile={cpt}: steps={steps} -> {ms:.2f} ms "
            f"({1e3 * ms / steps:.2f} us/step)", flush=True,
        )

    # Band sparsity: same pair count, but only 1 of 4 bands fires per pair.
    bx, by, fx, fy, wt, valid = coords_for(4)
    vb = np.asarray(valid)
    vb2 = vb.copy().reshape(H // 8, 8, W)
    vb2[1::4] = False
    vb2[2::4] = False
    vb2[3::4] = False
    valid_sparse = jnp.asarray(vb2.reshape(H, W))
    steps = nT * 4
    fn = jax.jit(
        lambda bx, by, fx, fy, wt, valid: mg.sample_grid_bilinear(
            planes, bx, by, fx, fy, wt, valid,
            pair_cap=16, dot_dtype=jnp.bfloat16,
            tiles=tiles, queue_cap=steps + 8,
        )[0]
    )
    ms = time_op(fn, bx, by, fx, fy, wt, valid_sparse, iters=8, name="sparse-band")
    print(f"1-of-4 bands, 4 cells/tile: ~{steps} steps -> {ms:.2f} ms", flush=True)

    # Padding-only steps: tiny real work, large queue_cap.
    bx, by, fx, fy, wt, valid = coords_for(1)
    for qcap in (1024, 8192, 16384, 32768):
        fn = jax.jit(
            lambda bx, by, fx, fy, wt, valid, qcap=qcap: mg.sample_grid_bilinear(
                planes, bx, by, fx, fy, wt, valid,
                pair_cap=16, dot_dtype=jnp.bfloat16,
                tiles=tiles, queue_cap=qcap,
            )[0]
        )
        ms = time_op(fn, bx, by, fx, fy, wt, valid, iters=8, name=f"qcap={qcap}")
        print(f"qcap={qcap} (510 real): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
