"""GPU skinning: 4-weight linear blend skinning over the megabuffer.

Reference: rend3-routine/src/skinning.rs + shaders/src/skinning.wgsl — per
skeleton, read source position/normal/tangent ranges, blend by 4 joint
matrices, write into the skeleton-owned override ranges. On TPU all skeletons
are processed as one batched gather + (V, 4, 3x4) weighted matrix apply.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SkinInputs", "build_skin_inputs", "apply_skinning"]


class SkinInputs(NamedTuple):
    """Flat per-vertex skinning work list across all skeletons."""

    src_ids: jnp.ndarray      # (V,) source vertex index (position arena)
    src_ids_n: jnp.ndarray    # (V,) normal arena source (-1 none)
    src_ids_t: jnp.ndarray    # (V,) tangent arena source (-1 none)
    dst_ids: jnp.ndarray      # (V,) destination (override range)
    dst_ids_n: jnp.ndarray    # (V,)
    dst_ids_t: jnp.ndarray    # (V,)
    joint_ids: jnp.ndarray    # (V, 4) into the stacked joint matrix array
    joint_weights: jnp.ndarray  # (V, 4)
    joint_matrices: jnp.ndarray  # (J, 4, 4)


def build_skin_inputs(skeleton_mgr, mesh_mgr) -> Optional[SkinInputs]:
    """Host-side: assemble the flat work list. Returns None when no skeletons."""
    if not skeleton_mgr.data:
        return None

    src_p, src_n, src_t = [], [], []
    dst_p, dst_n, dst_t = [], [], []
    jids, jwts = [], []
    mats = []
    joint_base = 0
    for idx, rec in sorted(skeleton_mgr.data.items()):
        vc = rec.vertex_count
        mesh = mesh_mgr.data[rec.mesh_idx]
        jr = mesh.joints_range
        ar = np.arange(vc)

        def rng(d, name, default=-1):
            r = d.get(name)
            return (r[0] + ar) if r is not None else np.full(vc, default, np.int64)

        src_p.append(rng(rec.source_ranges, "position"))
        src_n.append(rng(rec.source_ranges, "normal"))
        src_t.append(rng(rec.source_ranges, "tangent"))
        dst_p.append(rng(rec.override_ranges, "position"))
        dst_n.append(rng(rec.override_ranges, "normal"))
        dst_t.append(rng(rec.override_ranges, "tangent"))
        jids.append(mesh_mgr._joint_indices[jr[0] : jr[0] + vc] + joint_base)
        jwts.append(mesh_mgr._joint_weights[jr[0] : jr[0] + vc])
        mats.append(rec.joint_matrices)
        joint_base += len(rec.joint_matrices)

    return SkinInputs(
        src_ids=jnp.asarray(np.concatenate(src_p), jnp.int32),
        src_ids_n=jnp.asarray(np.concatenate(src_n), jnp.int32),
        src_ids_t=jnp.asarray(np.concatenate(src_t), jnp.int32),
        dst_ids=jnp.asarray(np.concatenate(dst_p), jnp.int32),
        dst_ids_n=jnp.asarray(np.concatenate(dst_n), jnp.int32),
        dst_ids_t=jnp.asarray(np.concatenate(dst_t), jnp.int32),
        joint_ids=jnp.asarray(np.concatenate(jids), jnp.int32),
        joint_weights=jnp.asarray(np.concatenate(jwts), jnp.float32),
        joint_matrices=jnp.asarray(np.concatenate(mats), jnp.float32),
    )


@jax.jit
def apply_skinning(geo, si: SkinInputs):
    """Blend and scatter skinned vertices into the override ranges.

    reference math: skinning.wgsl:36-95 — pos' = sum_k w_k * (M_k @ pos),
    normals/tangents with the 3x3 part (no inverse-transpose, matching the
    reference which uses the plain matrix)."""
    M = si.joint_matrices[si.joint_ids]          # (V, 4, 3or4, 4) -> (V,4,4,4)
    w = si.joint_weights                          # (V, 4)
    blended = (M * w[:, :, None, None]).sum(axis=1)  # (V, 4, 4)

    src_pos = geo.position[jnp.clip(si.src_ids, 0, geo.position.shape[0] - 1)]
    new_pos = jnp.einsum("vab,vb->va", blended[:, :3, :3], src_pos) + blended[:, :3, 3]
    position = geo.position.at[si.dst_ids].set(new_pos, mode="drop")

    def skin_dir(arena, src, dst):
        v = arena[jnp.clip(src, 0, arena.shape[0] - 1)]
        nv = jnp.einsum("vab,vb->va", blended[:, :3, :3], v)
        ok = (src >= 0) & (dst >= 0)
        return arena.at[jnp.where(ok, dst, arena.shape[0])].set(nv, mode="drop")

    normal = skin_dir(geo.normal, si.src_ids_n, si.dst_ids_n)
    tangent = skin_dir(geo.tangent, si.src_ids_t, si.dst_ids_t)

    return geo._replace(position=position, normal=normal, tangent=tangent)
