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
) -> jnp.ndarray:
    """Vectorized over triangles: True where definitely occluded.

    Mip selection by the bbox's longest screen edge (cull.wgsl:243-250);
    2x2 min-filter footprint."""
    n_levels = len(pyramid)
    extent = jnp.maximum(xmax - xmin, ymax - ymin)
    level = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(extent, 1.0))).astype(jnp.int32), 0, n_levels - 1)

    occluded = jnp.zeros(xmin.shape, bool)
    hit_any = jnp.zeros(xmin.shape, bool)
    for lv, mip in enumerate(pyramid):
        mh, mw = mip.shape
        scale = 1 << lv
        x0 = jnp.clip((xmin / scale).astype(jnp.int32), 0, mw - 1)
        y0 = jnp.clip((ymin / scale).astype(jnp.int32), 0, mh - 1)
        x1 = jnp.clip(x0 + 1, 0, mw - 1)
        y1 = jnp.clip(y0 + 1, 0, mh - 1)
        m = jnp.minimum(
            jnp.minimum(mip[y0, x0], mip[y1, x0]),
            jnp.minimum(mip[y0, x1], mip[y1, x1]),
        )
        sel = level == lv
        occluded = jnp.where(sel, zmax < m, occluded)
        hit_any = hit_any | sel
    return occluded & hit_any
