"""Hi-Z depth pyramid + occlusion test.

Reference: rend3-routine/src/hi_z.rs + shaders hi_z.wgsl /
resolve_depth_min.wgsl — a min-reduction mip pyramid over reverse-Z depth
(min = farthest), and cull.wgsl's occlusion test (:243-262): pick the mip
where the triangle's screen bbox spans <= 2x2 texels, take the min of those 4
texels, and cull when the triangle's nearest depth is still farther than
everything already drawn there.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

__all__ = ["build_pyramid", "occlusion_test"]


def build_pyramid(depth: jnp.ndarray, max_levels: int = 12) -> List[jnp.ndarray]:
    """depth (H, W) reverse-Z -> list of min-reduced mips [full, half, ...].

    Odd edges fold into the last texel (the reference samples the extra
    row/column; min over a 2x2 after padding with +inf edge replication is
    conservative the same way)."""
    mips = [depth]
    cur = depth
    while min(cur.shape) > 1 and len(mips) < max_levels:
        h, w = cur.shape
        nh, nw = max(1, h // 2), max(1, w // 2)
        c = cur[: nh * 2, : nw * 2].reshape(nh, 2, nw, 2)
        m = c.min(axis=(1, 3))
        # Fold odd edges (min with the trailing row/col) to stay conservative.
        if h > nh * 2:
            m = jnp.minimum(m, cur[nh * 2, : nw * 2].reshape(nw, 2).min(axis=1)[None, :])
        if w > nw * 2:
            m = jnp.minimum(m, cur[: nh * 2, nw * 2].reshape(nh, 2).min(axis=1)[:, None])
        mips.append(m)
        cur = m
    return mips


def occlusion_test(
    pyramid: List[jnp.ndarray],
    _unused_mips,
    xmin: jnp.ndarray,
    ymin: jnp.ndarray,
    xmax: jnp.ndarray,
    ymax: jnp.ndarray,
    zmax: jnp.ndarray,
    width: int,
    height: int,
    *,
    live=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Vectorized over triangles: True where definitely occluded.

    Mip selection by the bbox's longest screen edge (cull.wgsl:243-250);
    2x2 min-filter footprint. The per-triangle mip fetches go through the
    MXU gather sampler over a single edge-padded horizontally-packed mip
    atlas (per-triangle scalar gathers cost milliseconds at 100k+
    triangles); any sampler pair overflow degrades to "not occluded", so
    the test is always conservative."""
    from . import mxu_gather as mg

    n_levels = len(pyramid)
    extent = jnp.maximum(xmax - xmin, ymax - ymin)
    level = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(extent, 1.0))).astype(jnp.int32), 0, n_levels - 1)

    # Pack edge-padded mips side by side (padding makes the +1 taps clamp).
    padded = [jnp.pad(m, ((0, 1), (0, 1)), mode="edge") for m in pyramid]
    AH = max(p.shape[0] for p in padded)
    offs = []
    off = 0
    for p in padded:
        offs.append(off)
        off += p.shape[1]
    atlas = jnp.zeros((AH, off), jnp.float32)
    for p, ox in zip(padded, offs):
        atlas = jax.lax.dynamic_update_slice(atlas, p, (0, ox))

    bx = jnp.zeros(xmin.shape, jnp.int32)
    by = jnp.zeros(xmin.shape, jnp.int32)
    for lv, mip in enumerate(pyramid):
        mh, mw = mip.shape
        scale = float(1 << lv)
        x0 = jnp.clip((xmin / scale).astype(jnp.int32), 0, mw - 1) + offs[lv]
        y0 = jnp.clip((ymin / scale).astype(jnp.int32), 0, mh - 1)
        sel = level == lv
        bx = jnp.where(sel, x0, bx)
        by = jnp.where(sel, y0, by)

    # Queries as a fake image for the tile-based sampler.
    V = xmin.shape[0]
    Vp = -(-V // 4096) * 4096
    def img(a, fill):
        return jnp.pad(a, (0, Vp - V), constant_values=fill).reshape(Vp // 128, 128)

    valid = jnp.ones(V, bool) if live is None else live
    vals, _ovf, _q = mg.sample_grid(
        atlas, img(bx, 0), img(by, 0), img(valid, False),
        ((0, 0), (1, 0), (0, 1), (1, 1)), pair_cap=64, interpret=interpret,
    )
    m = jnp.minimum(jnp.minimum(vals[0], vals[1]), jnp.minimum(vals[2], vals[3]))
    return zmax < m.reshape(-1)[:V]
