"""Software rasterization to a visibility buffer.

This is the component wgpu gave the reference for free, re-designed for TPU:
instead of per-fragment hardware raster, triangles are processed in vectorized
chunks against the whole pixel grid (edge functions on (C, H, W) blocks),
reduced with a reverse-Z GreaterEqual depth test into a {depth, triangle-id}
visibility buffer. Shading happens later as a dense image-space pass
(ops/shade.py), which is the TPU-idiomatic split: raster is gather+compare,
shading is pure vectorized math.

Matched wgpu semantics:
 - front face = CW in NDC for Handedness::Left (rend3-routine/src/forward.rs:338),
 - cull back (forward) / cull front (depth/shadow),
 - depth compare GreaterEqual onto a 0-cleared buffer (reverse-Z)
   (forward.rs:348-351),
 - top-left fill rule, pixel centers at (x+0.5, y+0.5),
 - standard 4x MSAA sample locations.

This file is the *reference* implementation (pure jnp, runs on CPU and TPU);
the Pallas tile-binned kernel (ops/raster_pallas.py) is the performance path
and is validated against this one.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["VisBuffer", "CullMode", "rasterize", "screen_coords", "MSAA4_OFFSETS", "CENTER_OFFSET"]

NEG_DEPTH = -1.0  # sentinel "no coverage" depth; real depths are >= 0

# wgpu/Vulkan standard sample positions (pixel-relative).
CENTER_OFFSET = ((0.5, 0.5),)
MSAA4_OFFSETS = ((0.375, 0.125), (0.875, 0.375), (0.125, 0.625), (0.625, 0.875))


class CullMode:
    NONE = 0
    BACK = 1
    FRONT = 2


class VisBuffer(NamedTuple):
    """Per-sample visibility: depth (S, H, W) f32 and triangle id (S, H, W)
    i32 into the clipped-triangle table, -1 = no hit."""

    depth: jnp.ndarray
    tri: jnp.ndarray


def screen_coords(clip: jnp.ndarray, width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """clip (..., 4) -> pixel-space x, y (y down) and ndc z, after w divide."""
    w = clip[..., 3]
    inv_w = 1.0 / w
    x = (clip[..., 0] * inv_w * 0.5 + 0.5) * width
    y = (0.5 - clip[..., 1] * inv_w * 0.5) * height
    z = clip[..., 2] * inv_w
    return x, y, z


def _edge(ax, ay, bx, by, px, py):
    """Signed area*2 of (a, b, p); positive when p is left of a->b in y-down
    screen space."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _edge_canonical(ax, ay, bx, by, px, py):
    """Watertight edge function: evaluated from the lexicographically-smaller
    endpoint and sign-corrected, so the two triangles sharing an edge get
    bitwise-opposite values (float negation is exact). Prevents a pixel
    center exactly on a shared edge from rounding to outside for both."""
    swap = (bx < ax) | ((bx == ax) & (by < ay))
    lx = jnp.where(swap, bx, ax)
    hx = jnp.where(swap, ax, bx)
    ly = jnp.where(swap, by, ay)
    hy = jnp.where(swap, ay, by)
    sgn = jnp.where(swap, -1.0, 1.0)
    return sgn * _edge(lx, ly, hx, hy, px, py)


def _top_left(ax, ay, bx, by):
    """wgpu top-left fill rule for a CCW(-in-screen-space) triangle edge a->b."""
    dy = by - ay
    dx = bx - ax
    is_top = (dy == 0.0) & (dx > 0.0)
    is_left = dy < 0.0
    return is_top | is_left


def prepare_tris(
    clip: jnp.ndarray,        # (T, 3, 4)
    valid: jnp.ndarray,       # (T,)
    width: int,
    height: int,
    cull_mode: int,
    front_is_cw: bool,
):
    """Per-triangle setup: screen coords, winding cull, orientation fix.

    Returns (xs, ys, zs, ws, keep) with corners reordered so the screen-space
    signed area is positive (CCW in y-down coords) for uniform edge tests.
    """
    x, y, z = screen_coords(clip, width, height)   # (T, 3) each
    w = clip[..., 3]

    area2 = _edge(x[:, 0], y[:, 0], x[:, 1], y[:, 1], x[:, 2], y[:, 2])
    # CW in NDC (y up) == positive area in pixel coords (y down).
    is_front = (area2 > 0.0) if front_is_cw else (area2 < 0.0)

    keep = valid & (area2 != 0.0) & (w > 0.0).all(axis=-1)
    if cull_mode == CullMode.BACK:
        keep = keep & is_front
    elif cull_mode == CullMode.FRONT:
        keep = keep & ~is_front

    # Reorder corners 1<->2 when area is negative so every kept triangle is
    # positively oriented for the edge functions.
    flip = area2 < 0.0

    def _sw(a):
        return jnp.where(flip[:, None], a[:, jnp.array([0, 2, 1])], a)

    return _sw(x), _sw(y), _sw(z), _sw(w), keep, flip


def rasterize(
    clip: jnp.ndarray,          # (T, 3, 4) clipped triangles
    valid: jnp.ndarray,         # (T,) bool
    width: int,
    height: int,
    *,
    cull_mode: int = CullMode.BACK,
    front_is_cw: bool = True,
    sample_offsets=CENTER_OFFSET,
    chunk: int = 256,
    frag_mask_fn=None,
    init: Optional[VisBuffer] = None,
    origin=(0, 0),
    tile=None,
) -> VisBuffer:
    """Rasterize triangles into a per-sample visibility buffer.

    ``frag_mask_fn(tri_ids (C,), bary (C,3,H,W), persp_bary (C,3,H,W)) -> (C,H,W) bool``
    optionally discards fragments (alpha cutout). Triangle order is draw
    order: on depth ties the later triangle wins (GreaterEqual).

    ``tile`` restricts rasterization to a (tile_w, tile_h) window whose
    top-left pixel is ``origin`` (may be traced — used for screen-tile
    sharding across chips); ``width``/``height`` remain the full viewport for
    the NDC -> pixel mapping. Output arrays are tile-sized.
    """
    T = clip.shape[0]
    tile_w, tile_h = tile if tile is not None else (width, height)
    xs, ys, zs, ws, keep, _ = prepare_tris(clip, valid, width, height, cull_mode, front_is_cw)

    nsamp = len(sample_offsets)
    if init is None:
        depth0 = jnp.zeros((nsamp, tile_h, tile_w), jnp.float32)
        tri0 = jnp.full((nsamp, tile_h, tile_w), -1, jnp.int32)
    else:
        depth0, tri0 = init

    # Pixel-center grids per sample.
    px_rows = jnp.arange(tile_h, dtype=jnp.float32) + origin[1]
    px_cols = jnp.arange(tile_w, dtype=jnp.float32) + origin[0]
    grids = []
    for ox, oy in sample_offsets:
        py, px = jnp.meshgrid(px_rows + oy, px_cols + ox, indexing="ij")
        grids.append((px, py))

    nchunks = max(1, -(-T // chunk))
    pad = nchunks * chunk - T
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        ys = jnp.pad(ys, ((0, pad), (0, 0)))
        zs = jnp.pad(zs, ((0, pad), (0, 0)))
        ws = jnp.pad(ws, ((0, pad), (0, 0)), constant_values=1.0)
        keep = jnp.pad(keep, (0, pad))

    xs = xs.reshape(nchunks, chunk, 3)
    ys = ys.reshape(nchunks, chunk, 3)
    zs = zs.reshape(nchunks, chunk, 3)
    ws = ws.reshape(nchunks, chunk, 3)
    keepc = keep.reshape(nchunks, chunk)
    ids = jnp.arange(nchunks * chunk, dtype=jnp.int32).reshape(nchunks, chunk)

    def chunk_body(carry, inp):
        depth, tri = carry
        cx, cy, cz, cw, ck, cid = inp

        # Edge setup (C, 3): edge i is corner i -> corner i+1.
        ax, bx = cx, jnp.roll(cx, -1, axis=1)
        ay, by = cy, jnp.roll(cy, -1, axis=1)
        tl = _top_left(ax, ay, bx, by)  # (C, 3)

        new_depth, new_tri = depth, tri
        for s, (px, py) in enumerate(grids):
            # Edge functions at this sample position: (C, 3, H, W)
            e = _edge_canonical(ax[:, :, None, None], ay[:, :, None, None],
                                bx[:, :, None, None], by[:, :, None, None],
                                px[None, None], py[None, None])
            inside = (e > 0.0) | ((e == 0.0) & tl[:, :, None, None])
            cov = inside.all(axis=1) & ck[:, None, None]  # (C, H, W)

            # Screen-space barycentrics from the opposite-edge values.
            # lambda_0 ~ e12, lambda_1 ~ e20, lambda_2 ~ e01.
            bar = jnp.stack([e[:, 1], e[:, 2], e[:, 0]], axis=1)  # (C,3,H,W)
            bsum = bar.sum(axis=1, keepdims=True)
            bar = bar / jnp.where(bsum == 0.0, 1.0, bsum)

            # Depth: linear-in-screen-space interpolation of ndc z.
            zfrag = (bar * cz[:, :, None, None]).sum(axis=1)  # (C,H,W)
            cov = cov & (zfrag >= 0.0) & (zfrag <= 1.0)

            if frag_mask_fn is not None:
                pb = bar / cw[:, :, None, None]
                pb = pb / pb.sum(axis=1, keepdims=True)
                cov = cov & frag_mask_fn(cid, bar, pb)

            cand = jnp.where(cov, zfrag, NEG_DEPTH)  # (C,H,W)

            # Within-chunk reduce; later triangle wins ties (GreaterEqual).
            C = cand.shape[0]
            rev_best = jnp.argmax(cand[::-1], axis=0)
            best = (C - 1) - rev_best                     # (H, W) last argmax
            best_depth = jnp.take_along_axis(cand, best[None], axis=0)[0]
            best_id = cid[best]

            write = (best_depth >= new_depth[s]) & (best_depth > NEG_DEPTH)
            new_depth = new_depth.at[s].set(jnp.where(write, best_depth, new_depth[s]))
            new_tri = new_tri.at[s].set(jnp.where(write, best_id, new_tri[s]))

        return (new_depth, new_tri), None

    (depth, tri), _ = jax.lax.scan(chunk_body, (depth0, tri0), (xs, ys, zs, ws, keepc, ids))
    return VisBuffer(depth=depth, tri=tri)
