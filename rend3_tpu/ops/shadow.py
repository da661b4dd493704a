"""Gather-free shadow resolve.

The reference samples a rasterized shadow atlas per pixel with a bilinear
GreaterEqual comparison sampler + 5-tap PCF (shadow/pcf.wgsl, samplers.rs).
Per-pixel scalar gathers cost ~22 ms/2M px on TPU, so the TPU redesign skips
the shadow *map* entirely: for each screen tile, the shadow-casting triangles
(set up in light pixel space, exactly as the shadow pass would rasterize
them) are tested directly against every pixel's light-space position — the
occluder depth "stored at texel center c" IS the max triangle depth covering
c, so evaluating the triangle soup at the 12 texel centers used by
PCF5-with-bilinear reproduces the reference's shadow term bit-for-bit in
exact arithmetic, with zero gathers.

Pipeline: per-pixel light coords (elementwise) -> per-screen-tile light-space
bounding rects (reductions) -> rect-vs-bbox binning -> Pallas kernel
accumulating max occluder depth at the 12 offsets -> elementwise PCF blend.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .geometry import (
    S_EA,
    S_EB,
    S_EC,
    S_TL,
    S_TL1,
    S_TL2,
    S_ZA,
    S_ZB,
    S_ZC,
    SETUP_W,
    BinnedTris,
    TriSetup,
    _compact,
)

__all__ = ["PCF_OFFSETS", "bin_rects", "shadow_occlusion", "pcf5_from_occlusion"]

STILE_H = 32
STILE_W = 128
GROUP = 8

# The 12 distinct texel centers touched by 5-tap PCF with bilinear corners:
# taps {(0,0),(0,1),(0,-1),(1,0),(-1,0)} x corners {0,1}^2.
PCF_OFFSETS = (
    (-1, 0), (-1, 1),
    (0, -1), (0, 0), (0, 1), (0, 2),
    (1, -1), (1, 0), (1, 1), (1, 2),
    (2, 0), (2, 1),
)  # (dx, dy)
N_OFF = len(PCF_OFFSETS)


def bin_rects(bbox: jnp.ndarray, rects: jnp.ndarray, cap: int) -> BinnedTris:
    """One-level binning of triangle bboxes (V, 4) against per-tile rects
    (nT, 4) [xmin, ymin, xmax, ymax]; returns per-tile id lists."""
    V = bbox.shape[0]
    nT = rects.shape[0]
    mask = (
        (bbox[None, :, 2] > rects[:, None, 0])
        & (bbox[None, :, 0] < rects[:, None, 2])
        & (bbox[None, :, 3] > rects[:, None, 1])
        & (bbox[None, :, 1] < rects[:, None, 3])
    )  # (nT, V)
    from .geometry import _compact_rows

    ids, counts = _compact_rows(mask, cap)
    overflow = jnp.maximum(counts - cap, 0).sum()
    return BinnedTris(ids=ids, counts=jnp.minimum(counts, cap), overflow=overflow)


def bin_rects_2level(
    bbox: jnp.ndarray,
    rects: jnp.ndarray,
    n_rows: int,
    n_cols: int,
    cap: int,
    *,
    group_rows: int = 2,
    group_cols: int = 4,
    super_cap: int = 0,
) -> BinnedTris:
    """Hierarchical rect binning: tiles grouped into super-tiles (union
    rect), triangles binned to super-tiles first, then refined per member
    tile. Cuts the scatter volume ~(group size)x vs one-level (the scatter is
    the dominant cost at ~1 elem/cycle on TPU)."""
    V = bbox.shape[0]
    if n_rows % group_rows or n_cols % group_cols:
        return bin_rects(bbox, rects, cap)
    sr, sc = n_rows // group_rows, n_cols // group_cols
    nS = sr * sc
    members = group_rows * group_cols
    if not super_cap:
        super_cap = max(4 * cap, (16 * V) // max(nS, 1))

    r4 = rects.reshape(sr, group_rows, sc, group_cols, 4)
    super_rects = jnp.stack(
        [
            r4[..., 0].min(axis=(1, 3)),
            r4[..., 1].min(axis=(1, 3)),
            r4[..., 2].max(axis=(1, 3)),
            r4[..., 3].max(axis=(1, 3)),
        ],
        axis=-1,
    ).reshape(nS, 4)

    lvl1 = bin_rects(bbox, super_rects, min(V, super_cap))  # (nS, cap1)
    cap1 = lvl1.ids.shape[1]

    live = lvl1.ids >= 0
    g = jnp.clip(lvl1.ids, 0, V - 1)
    bb = jnp.where(live[..., None], bbox[g], jnp.array([1e9, 1e9, -1e9, -1e9]))  # (nS, cap1, 4)

    # Member-tile rects arranged (nS, members, 4) matching lvl1 ordering.
    mrect = rects.reshape(sr, group_rows, sc, group_cols, 4).transpose(0, 2, 1, 3, 4).reshape(
        nS, members, 4
    )
    mask = (
        (bb[:, None, :, 2] > mrect[:, :, None, 0])
        & (bb[:, None, :, 0] < mrect[:, :, None, 2])
        & (bb[:, None, :, 3] > mrect[:, :, None, 1])
        & (bb[:, None, :, 1] < mrect[:, :, None, 3])
    )  # (nS, members, cap1)
    from .geometry import _compact_rows

    ids2, counts = _compact_rows(mask.reshape(nS * members, cap1), cap)
    ids = jnp.where(
        ids2 >= 0,
        lvl1.ids[jnp.arange(nS * members)[:, None] // members, jnp.clip(ids2, 0, cap1 - 1)],
        -1,
    ).reshape(nS, members, cap)
    counts = counts.reshape(nS, members)
    overflow = lvl1.overflow + jnp.maximum(counts - cap, 0).sum()

    # (nS, members) -> flat row-major tile order.
    ids = ids.reshape(sr, sc, group_rows, group_cols, cap).transpose(0, 2, 1, 3, 4).reshape(
        n_rows * n_cols, cap
    )
    counts = counts.reshape(sr, sc, group_rows, group_cols).transpose(0, 2, 1, 3).reshape(-1)
    return BinnedTris(ids=ids, counts=jnp.minimum(counts, cap), overflow=overflow)


def _tile_rects(sx, sy, hit, height, width):
    """Per-(32,128)-tile light-space bounds of the snapped PCF footprint."""
    n_rows = height // STILE_H
    n_cols = width // STILE_W
    big = jnp.float32(1e9)

    def t(img, red, fill):
        v = jnp.where(hit, img, fill)
        v = v.reshape(n_rows, STILE_H, n_cols, STILE_W)
        return red(red(v, axis=3), axis=1).reshape(-1)

    xmin = t(sx, jnp.min, big) - 2.0
    xmax = t(sx, jnp.max, -big) + 3.0
    ymin = t(sy, jnp.min, big) - 2.0
    ymax = t(sy, jnp.max, -big) + 3.0
    return jnp.stack([xmin, ymin, xmax, ymax], axis=1)  # (nT, 4)


def shadow_occlusion(
    tris: TriSetup,
    sx: jnp.ndarray,     # (H, W) light-space pixel x of each screen pixel
    sy: jnp.ndarray,     # (H, W)
    hit: jnp.ndarray,    # (H, W) bool
    width: int,          # padded screen width (mult of 128)
    height: int,         # padded screen height (mult of 32)
    *,
    tile_cap: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Max occluder depth at the 12 PCF texel centers: (12, H, W)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = height // STILE_H
    n_cols = width // STILE_W
    n_tiles = n_rows * n_cols

    rects = _tile_rects(sx, sy, hit, height, width)
    V = tris.setup.shape[0]
    cap = max(256, min(tile_cap, (8 * V) // max(n_tiles, 1)))
    cap = min(V, -(-cap // GROUP) * GROUP)
    if V <= (1 << 18):
        binned = bin_rects(tris.bbox, rects, cap)
    else:
        binned = bin_rects_2level(tris.bbox, rects, n_rows, n_cols, cap)
    K = binned.ids.shape[1]
    K = max(GROUP, -(-K // GROUP) * GROUP)
    if K != binned.ids.shape[1]:
        pad = K - binned.ids.shape[1]
        binned = binned._replace(ids=jnp.pad(binned.ids, ((0, 0), (0, pad)), constant_values=-1))

    gi = jnp.clip(binned.ids, 0, tris.setup.shape[0] - 1)
    bset = tris.setup[gi]  # (nT, K, SETUP_W)

    # Tile the coordinate images: (nT, 3, 32, 128).
    def tile_img(img):
        return img.reshape(n_rows, STILE_H, n_cols, STILE_W).transpose(0, 2, 1, 3).reshape(
            n_tiles, STILE_H, STILE_W
        )

    coords = jnp.stack([tile_img(sx), tile_img(sy), tile_img(hit.astype(jnp.float32))], axis=1)

    npix_flat = STILE_H * STILE_W

    def kernel(counts_ref, bset_ref, coords_ref, occ_ref):
        i = pl.program_id(0)
        cnt = counts_ref[i]
        sxl = coords_ref[0, 0].reshape(1, npix_flat)
        syl = coords_ref[0, 1].reshape(1, npix_flat)
        # Snapped base texel center.
        bx = jnp.floor(sxl - 0.5) + 0.5
        by = jnp.floor(syl - 0.5) + 0.5

        ngroups = pl.cdiv(cnt, GROUP)

        def grp(gk, occ):
            base = gk * GROUP
            blk = bset_ref[0, pl.ds(base, GROUP), :]

            def cf(lane_idx):
                return blk[:, lane_idx : lane_idx + 1]   # (GROUP, 1) sublane bcast

            valid = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0) + base) < cnt
            a0, b0, c0 = cf(S_EA), cf(S_EB), cf(S_EC)
            a1, b1, c1 = cf(S_EA + 1), cf(S_EB + 1), cf(S_EC + 1)
            a2, b2, c2 = cf(S_EA + 2), cf(S_EB + 2), cf(S_EC + 2)
            za, zb, zc = cf(S_ZA), cf(S_ZB), cf(S_ZC)
            e0 = a0 * bx + b0 * by + c0                  # (GROUP, npix)
            e1 = a1 * bx + b1 * by + c1
            e2 = a2 * bx + b2 * by + c2
            zv = za * bx + zb * by + zc
            # Exact-on-edge ties are irrelevant for shadow terms; using a
            # strict interior test here avoids three selects per position.
            zvalid = jnp.where(valid, 1.0, -1.0)

            new_occ = []
            for oi, (dx, dy) in enumerate(PCF_OFFSETS):
                fdx, fdy = float(dx), float(dy)
                p0 = e0 + a0 * fdx + b0 * fdy
                p1 = e1 + a1 * fdx + b1 * fdy
                p2 = e2 + a2 * fdx + b2 * fdy
                zp = (zv + za * fdx + zb * fdy) * zvalid
                cov = (p0 > 0.0) & (p1 > 0.0) & (p2 > 0.0) & (zp >= 0.0)
                zo = jnp.where(cov, zp, 0.0).max(axis=0, keepdims=True)  # (1, npix)
                new_occ.append(jnp.maximum(occ[oi], zo))
            return tuple(new_occ)

        occ0 = tuple(jnp.zeros((1, npix_flat), jnp.float32) for _ in range(N_OFF))
        occ = jax.lax.fori_loop(0, ngroups, grp, occ0)
        for oi in range(N_OFF):
            occ_ref[0, oi] = occ[oi].reshape(STILE_H, STILE_W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, K, SETUP_W), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 3, STILE_H, STILE_W), lambda i, c: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N_OFF, STILE_H, STILE_W), lambda i, c: (i, 0, 0, 0)),
    )

    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, N_OFF, STILE_H, STILE_W), jnp.float32),
        interpret=interpret,
    )(binned.counts, bset, coords)

    occ = tiles.reshape(n_rows, n_cols, N_OFF, STILE_H, STILE_W)
    return occ.transpose(2, 0, 3, 1, 4).reshape(N_OFF, height, width)


def pcf5_from_occlusion(occ: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Exact PCF5-with-bilinear-GE from the 12 occluder depths (elementwise).

    occ: (12, H, W); sx/sy: unsnapped light pixel coords; ref: reference
    depth. Returns the shadow factor in [0, 1]."""
    fx = (sx - 0.5) - jnp.floor(sx - 0.5)
    fy = (sy - 0.5) - jnp.floor(sy - 0.5)

    idx = {off: i for i, off in enumerate(PCF_OFFSETS)}

    def cmp(dx, dy):
        return (ref >= occ[idx[(dx, dy)]]).astype(jnp.float32)

    def tap(ox, oy):
        c00 = cmp(ox, oy)
        c10 = cmp(ox + 1, oy)
        c01 = cmp(ox, oy + 1)
        c11 = cmp(ox + 1, oy + 1)
        top = c00 * (1.0 - fx) + c10 * fx
        bot = c01 * (1.0 - fx) + c11 * fx
        return top * (1.0 - fy) + bot * fy

    total = tap(0, 0) + tap(0, 1) + tap(0, -1) + tap(1, 0) + tap(-1, 0)
    return total * 0.2
