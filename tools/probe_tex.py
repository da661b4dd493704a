"""Standalone piecewise timing of the MXU texture sampler at bench scale:
pair-list build vs bilinear kernel vs the full sample_textures_grid, with a
synthetic but representative query field (1080p padded, 24 materials in
screen blocks, mip-varied uv gradients).

Usage: python tools/probe_tex.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import build_city_scene
    from rend3_tpu.testing import TestRunner
    from rend3_tpu.utils.devbench import time_op
    from rend3_tpu.ops import mxu_gather as mg
    from rend3_tpu.ops import texture as tex_ops

    runner = TestRunner()
    keep = build_city_scene(runner)
    r = runner.renderer
    r.swap_instruction_buffers()
    r.evaluate_instructions()
    tex = r.d2_texture_manager.evaluate()
    print("atlas:", tex.atlas.shape, "textures:", int(tex.rects.shape[0]), flush=True)

    hp, wp = 1088, 1920
    N = hp * wp
    rng = np.random.default_rng(0)

    # Representative per-pixel fields: material blocks of ~64px, smooth uv.
    yy, xx = np.mgrid[0:hp, 0:wp]
    mat_img = ((xx // 96) + (yy // 96) * 7) % 24
    mtex = np.zeros((N, 10), np.int32)
    # slots: albedo=texture 2*m+1, aomr=2*m+2 (1-based ids like the manager)
    mtex[:, 0] = (2 * mat_img + 1).reshape(-1)
    mtex[:, 9] = (2 * mat_img + 2).reshape(-1)
    u = (xx / 97.0).astype(np.float32)
    v = (yy / 53.0).astype(np.float32)
    coords = np.stack([u.reshape(-1), v.reshape(-1)], -1)
    scale = (1.0 + (yy / hp) * 8.0).astype(np.float32)  # mip ramp
    duv = np.zeros((N, 2, 2), np.float32)
    duv[:, 0, 0] = (scale / 128.0).reshape(-1)
    duv[:, 1, 1] = (scale / 128.0).reshape(-1)
    mflags = np.zeros(N, np.int32)
    hit = np.ones(N, bool)

    mtex_d = jnp.asarray(mtex)
    coords_d = jnp.asarray(coords)
    duv_d = jnp.asarray(duv)
    mflags_d = jnp.asarray(mflags)
    hit_d = jnp.asarray(hit)

    @jax.jit
    def full(mtex, coords, duv, mflags, hit):
        samples, ovf, _q = tex_ops.sample_textures_grid(
            tex, mtex, coords, duv, mflags, (hp, wp), (0, 9),
            pair_cap=128, hit=hit,
        )
        return samples[0], samples[9], ovf

    s0, s9, ovf = jax.block_until_ready(full(mtex_d, coords_d, duv_d, mflags_d, hit_d))
    print("pair need:", int(ovf), flush=True)
    time_op(full, mtex_d, coords_d, duv_d, mflags_d, hit_d, iters=8, name="sample_textures_grid(2 slots)")

    # Piecewise: replicate the query build, then time pair_lists and the
    # kernel separately through sample_grid_bilinear's internals.
    planes = jnp.moveaxis(tex.atlas, -1, 0)
    print("planes:", planes.shape, flush=True)

    # One mip-0-only query set for the kernel-cost scaling check.
    S = tex.rects.shape[0]
    rect0 = np.asarray(tex.rects)[:, 0]  # (S, 4)
    slv = mtex[:, 0]
    rct = rect0[np.clip(slv, 0, S - 1)]
    xf = (u.reshape(-1) - np.floor(u.reshape(-1))) * rct[:, 2] - 0.5
    yf = (v.reshape(-1) - np.floor(v.reshape(-1))) * rct[:, 3] - 0.5
    bx = (np.floor(xf) + rct[:, 0]).astype(np.int32).reshape(hp, wp)
    by = (np.floor(yf) + rct[:, 1]).astype(np.int32).reshape(hp, wp)
    fx = (xf - np.floor(xf)).astype(np.float32).reshape(hp, wp)
    fy = (yf - np.floor(yf)).astype(np.float32).reshape(hp, wp)
    wt = np.ones((hp, wp), np.float32)
    valid = np.ones((hp, wp), bool)

    bx_d, by_d = jnp.asarray(bx), jnp.asarray(by)
    fx_d, fy_d, wt_d = jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(wt)
    valid_d = jnp.asarray(valid)

    Gy = -(-planes.shape[1] // mg.LT)
    Gx = -(-planes.shape[2] // mg.LT)

    @jax.jit
    def pairs_only(bx, by, valid):
        ids, counts, bits, need = mg.pair_lists(bx, by, valid, Gy, Gx, 128)
        return ids.astype(jnp.float32)

    jax.block_until_ready(pairs_only(bx_d, by_d, valid_d))
    time_op(pairs_only, bx_d, by_d, valid_d, iters=8, name="pair_lists(1 entry)")

    @jax.jit
    def tiling_only(planes_in):
        return mg._build_grid_tiles_multi(planes_in, 0, 1).tiles

    jax.block_until_ready(tiling_only(planes))
    time_op(tiling_only, planes, iters=8, name="grid tiling (atlas reshuffle)")

    @jax.jit
    def bilinear(bx, by, fx, fy, wt, valid):
        return mg.sample_grid_bilinear(
            planes, bx, by, fx, fy, wt, valid, pair_cap=128,
        )

    out, need, _q = jax.block_until_ready(bilinear(bx_d, by_d, fx_d, fy_d, wt_d, valid_d))
    print("1-entry pair need:", int(need), flush=True)
    time_op(bilinear, bx_d, by_d, fx_d, fy_d, wt_d, valid_d, iters=8, name="sample_grid_bilinear(1 entry)")


if __name__ == "__main__":
    main()
