"""Vertex transform and near-plane clipping.

The GPU pipeline's vertex stage + primitive clipping, re-designed for XLA:
everything is a dense batched matmul / gather over the triangle table, with
static shapes (clipping expands each triangle into at most 3 output slots
instead of emitting a variable-length stream).

Reference behavior being matched: wgpu clip volume 0 <= z <= w with reverse-Z
depth; the vertex stage itself is opaque.wgsl vs_main
(rend3-routine/shaders/src/opaque.wgsl).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["ClippedTris", "object_uniforms", "gather_tri_clip", "clip_triangles"]

W_EPS = 1e-6


class ClippedTris(NamedTuple):
    """Post-clip triangle table (static capacity = 3x input).

    clip:  (T', 3, 4) clip-space corner positions
    orig:  (T',) index of the source triangle in the pre-clip table
    bary:  (T', 3, 3) each clipped corner as barycentrics of the source tri
    valid: (T',) bool
    """

    clip: jnp.ndarray
    orig: jnp.ndarray
    bary: jnp.ndarray
    valid: jnp.ndarray


def object_uniforms(transforms: jnp.ndarray, view: jnp.ndarray, proj: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-object model_view and model_view_proj (the uniform-prep pass,
    reference: rend3-routine/shaders/src/uniform_prep.wgsl:9-27).

    transforms: (O, 4, 4); view, proj: (4, 4) -> ((O,4,4), (O,4,4))
    """
    model_view = jnp.einsum("ab,obc->oac", view, transforms)
    model_view_proj = jnp.einsum("ab,obc->oac", proj, model_view)
    return model_view, model_view_proj


def per_tri_matrices(tri_obj: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle 4x4 matrices from per-object ones: (T,), (O,4,4) -> (T,4,4).

    For small object tables a one-hot f32 matmul rides the MXU (~0.27 ms for
    131k tris x 1024 objects) vs ~1.3 ms for the 16-wide row gather; larger
    tables fall back to the gather, whose cost is O-independent."""
    obj = jnp.maximum(tri_obj, 0)
    O = mats.shape[0]
    if O <= 2048:
        onehot = (obj[:, None] == jnp.arange(O, dtype=obj.dtype)[None, :]).astype(jnp.float32)
        return (onehot @ mats.reshape(O, 16).astype(jnp.float32)).reshape(-1, 4, 4)
    return mats[obj]


def tri_global_ids(
    tri_vlocal: jnp.ndarray, tri_obj: jnp.ndarray, base_position: jnp.ndarray, n_verts: int
) -> jnp.ndarray:
    """Global position-arena ids per corner: (T, 3) int32. Static per scene —
    compute once per frame (or on host) and reuse across main/shadow passes."""
    obj = jnp.maximum(tri_obj, 0)
    ids = tri_vlocal + base_position[obj][:, None]
    return jnp.clip(ids, 0, n_verts - 1)


def gather_tri_clip(
    positions: jnp.ndarray,  # (V, 3) position arena
    tri_vlocal: jnp.ndarray,  # (T, 3) int32 mesh-local vertex ids
    tri_obj: jnp.ndarray,    # (T,) int32 object ids (-1 invalid)
    base_position: jnp.ndarray,  # (O,) int32 per-object position arena base
    mvp: jnp.ndarray,        # (O, 4, 4)
    tri_gid: jnp.ndarray | None = None,  # optional precomputed (T, 3) global ids
    tri_pos: jnp.ndarray | None = None,  # optional pre-gathered (T, 3, 3) corners
) -> jnp.ndarray:
    """Gather corner positions (mesh-local index + per-object arena base,
    mirroring the reference's vertex_attribute_start_offsets) and transform to
    clip space: (T, 3, 4)."""
    if tri_pos is None:
        if tri_gid is None:
            tri_gid = tri_global_ids(tri_vlocal, tri_obj, base_position, positions.shape[0])
        tri_pos = positions[tri_gid]                       # (T, 3, 3)
    m = per_tri_matrices(tri_obj, mvp)                     # (T, 4, 4)
    # clip[t, c, a] = sum_b m[t, a, b] * p[t, c, b] + m[t, a, 3], written as
    # broadcast mul+reduce: a batched (4x4)@(4x3) einsum lowers to a
    # catastrophically padded MXU op that XLA then RECOMPUTES per consumer
    # fusion (~2 ms a pop at 131k tris); this form is pure VPU and fuses.
    c = (m[:, None, :, :3] * tri_pos[:, :, None, :]).sum(-1) + m[:, None, :, 3]
    return c                                               # (T, 3, 4)


def _clip_one_plane(verts, bary, count, plane_fn):
    """Sutherland-Hodgman step against one plane for a polygon of up to 4
    verts stored in fixed 5-slot buffers. Vectorized over the leading axis.

    verts: (T, 5, 4), bary: (T, 5, 3), count: (T,) int32 in [0, 4]
    plane_fn(v) >= 0 means inside.
    """
    T = verts.shape[0]
    MAXV = verts.shape[1]  # 5

    d = plane_fn(verts)  # (T, 5)
    inside = d >= 0.0

    out_v = jnp.zeros_like(verts)
    out_b = jnp.zeros_like(bary)
    out_n = jnp.zeros_like(count)

    # Walk the polygon edges, Python-unrolled so every slot access is a
    # static slice + a wrap select. (A fori_loop with take_along_axis here
    # issued ~20 tiny dynamic gathers; each has ~0.2 ms fixed cost on TPU.)
    for i in range(MAXV - 1):
        wrap = (i + 1 >= count)  # (T,) next vertex wraps to slot 0
        live = i < count

        def nxt(a):
            lo, hi = a[:, 0], a[:, min(i + 1, MAXV - 1)]
            return jnp.where(wrap.reshape((T,) + (1,) * (lo.ndim - 1)), lo, hi)

        vi, vj = verts[:, i], nxt(verts)
        bi, bj = bary[:, i], nxt(bary)
        di, dj = d[:, i], nxt(d)
        ini, inj = inside[:, i], nxt(inside)

        # Emit current vertex if inside.
        emit_cur = live & ini
        idx = out_n
        out_v = _masked_set(out_v, idx, vi, emit_cur)
        out_b = _masked_set(out_b, idx, bi, emit_cur)
        out_n = out_n + emit_cur.astype(out_n.dtype)

        # Emit intersection if the edge crosses the plane.
        crosses = live & (ini != inj)
        t = di / jnp.where(jnp.abs(di - dj) < 1e-30, 1e-30, di - dj)
        v_int = vi + (vj - vi) * t[:, None]
        b_int = bi + (bj - bi) * t[:, None]
        idx = out_n
        out_v = _masked_set(out_v, idx, v_int, crosses)
        out_b = _masked_set(out_b, idx, b_int, crosses)
        out_n = out_n + crosses.astype(out_n.dtype)
    return out_v, out_b, out_n


def _masked_set(buf, idx, val, mask):
    """buf: (T, S, C); write val (T, C) at slot idx (T,) where mask."""
    T, S, C = buf.shape
    onehot = (jnp.arange(S)[None, :] == idx[:, None]) & mask[:, None]  # (T, S)
    return jnp.where(onehot[:, :, None], val[:, None, :], buf)


def clip_triangles(clip: jnp.ndarray, tri_valid: jnp.ndarray, clip_cap: int = 1024) -> ClippedTris:
    """Near-plane clipping with crossing-only expansion.

    Triangles fully inside the clip volume (w > eps and w - z >= 0 at every
    corner) pass through untouched; fully-outside ones are dropped; only the
    (rare) crossing triangles are compacted into a small side set and run
    through Sutherland-Hodgman, appending <= 3 fan triangles each. Output
    table size: T + 3*clip_cap (instead of 3T), which keeps the setup /
    planes tables and their binned gathers small.

    clip: (T, 3, 4); tri_valid: (T,) bool
    """
    T = clip.shape[0]
    clip_cap = min(clip_cap, T)

    d = clip[..., 3] - clip[..., 2]          # near-plane signed distance
    weps = clip[..., 3] > W_EPS
    inside = (d >= 0.0) & weps               # per corner
    all_in = inside.all(axis=-1)
    any_in = inside.any(axis=-1)
    crossing = tri_valid & any_in & ~all_in

    # Compact the crossing subset (rank-select; scatters run ~1 elem/cycle
    # on TPU and dominated the whole geometry phase at 100k+ triangles).
    from .geometry import _compact

    ids, _ = _compact(crossing, clip_cap)
    g = jnp.clip(ids, 0, T - 1)
    sub = _clip_triangles_full(clip[g], ids >= 0)

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=clip.dtype), (T, 3, 3))
    return ClippedTris(
        clip=jnp.concatenate([clip, sub.clip], axis=0),
        orig=jnp.concatenate([jnp.arange(T, dtype=jnp.int32), g[sub.orig]], axis=0),
        bary=jnp.concatenate([eye3, sub.bary], axis=0),
        valid=jnp.concatenate([tri_valid & all_in, sub.valid], axis=0),
    )


def _clip_triangles_full(clip: jnp.ndarray, tri_valid: jnp.ndarray) -> ClippedTris:
    """Full Sutherland-Hodgman against w >= eps and w - z >= 0, 3x expansion.
    Used on the compacted crossing subset only."""
    T = clip.shape[0]
    # 5-slot polygon buffers (3 verts + up to 2 plane intersections over 2 planes
    # never exceeds 5 simultaneously live vertices).
    verts = jnp.concatenate([clip, jnp.zeros((T, 2, 4), clip.dtype)], axis=1)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=clip.dtype), (T, 3, 3))
    bary = jnp.concatenate([eye3, jnp.zeros((T, 2, 3), clip.dtype)], axis=1)
    count = jnp.where(tri_valid, 3, 0).astype(jnp.int32)

    verts, bary, count = _clip_one_plane(verts, bary, count, lambda v: v[..., 3] - W_EPS)
    verts, bary, count = _clip_one_plane(verts, bary, count, lambda v: v[..., 3] - v[..., 2])

    # Fan-triangulate: (0, k+1, k+2) for k in 0..2.
    outs_v, outs_o, outs_b, outs_m = [], [], [], []
    orig_ids = jnp.arange(T, dtype=jnp.int32)
    for k in range(3):
        ok = count >= (k + 3)
        tri_v = jnp.stack([verts[:, 0], verts[:, k + 1], verts[:, k + 2]], axis=1)
        tri_b = jnp.stack([bary[:, 0], bary[:, k + 1], bary[:, k + 2]], axis=1)
        outs_v.append(tri_v)
        outs_b.append(tri_b)
        outs_o.append(orig_ids)
        outs_m.append(ok)

    return ClippedTris(
        clip=jnp.concatenate(outs_v, axis=0),
        orig=jnp.concatenate(outs_o, axis=0),
        bary=jnp.concatenate(outs_b, axis=0),
        valid=jnp.concatenate(outs_m, axis=0),
    )
