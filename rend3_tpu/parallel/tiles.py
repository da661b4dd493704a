"""Multi-chip screen-tile sharding.

The TPU-native "communication backend" the reference never needed
(SURVEY.md §2.9): the frame is data-parallel over screen tiles — each chip
rasterizes + shades a horizontal band of the target, with the scene state
(geometry arenas, object/material/light tables) replicated across the mesh.
Shadow views are round-robined across chips and exchanged with an
all_gather over ICI so every chip sees the full atlas before shading.

Built on `jax.sharding.Mesh` + `shard_map`; XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import blit as blit_ops
from ..ops import raster as raster_ops
from ..ops import shade as shade_ops
from ..ops import transform as transform_ops

__all__ = ["make_tiled_frame_program", "device_mesh"]


def device_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("tiles",))


def make_tiled_frame_program(
    mesh: Mesh,
    width: int,
    height: int,
    *,
    samples: int = 1,
    front_cw: bool = True,
    shadow_plan: Tuple = (),
    atlas_extent: Tuple[int, int] = (32, 32),
):
    """Build a jitted multi-chip frame program.

    Every input is replicated; the output image is sharded by rows. Each
    shadow-plan entry is rendered by `plan_index % n_devices` only, then the
    atlas is psum-combined over ICI (each chip contributes a disjoint region).
    """
    n = mesh.devices.size
    assert height % n == 0, f"height {height} must divide by device count {n}"
    tile_h = height // n
    sample_offsets = raster_ops.MSAA4_OFFSETS if samples == 4 else raster_ops.CENTER_OFFSET
    aw, ah = atlas_extent

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=P("tiles"),
        check_vma=False,
    )
    def tiled_frame(
        geo_pos,
        geo_nrm,
        geo_tan,
        geo_uv0,
        geo_uv1,
        geo_col,
        tri_vlocal,
        tri_obj,
        transforms,
        visible,
        bases,
        material_slots,
        mat_tables,
        light_arrays,
        cam_mats,
    ):
        from ..core.framestate import GeometryArrays

        geo = GeometryArrays(geo_pos, geo_nrm, geo_tan, geo_uv0, geo_uv1, geo_col)
        mat_data, mat_flags, mat_tex = mat_tables
        dir_lights, point_lights = light_arrays
        view, proj, uniforms = cam_mats
        materials = shade_ops.PbrMaterialTable(mat_data, mat_flags, mat_tex)

        tile_idx = jax.lax.axis_index("tiles")
        row0 = tile_idx * tile_h

        # ---- shadow views: round-robin across chips, exchange via psum ----
        shadow_atlas = jnp.zeros((ah, aw), jnp.float32)
        for k, (li, (ox, oy), size) in enumerate(shadow_plan):
            svp = dir_lights.view_proj[k]
            _, smvp = transform_ops.object_uniforms(transforms, svp, jnp.eye(4))
            svalid = (tri_obj >= 0) & visible[jnp.maximum(tri_obj, 0)]
            sclip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], smvp)
            sclipped = transform_ops.clip_triangles(sclip, svalid)
            svis = raster_ops.rasterize(
                sclipped.clip, sclipped.valid, size, size,
                cull_mode=raster_ops.CullMode.FRONT, front_is_cw=front_cw,
                sample_offsets=raster_ops.CENTER_OFFSET,
            )
            mine = (k % n) == tile_idx
            contribution = jnp.where(mine, svis.depth[0], 0.0)
            shadow_atlas = jax.lax.dynamic_update_slice(shadow_atlas, contribution, (oy, ox))
        if shadow_plan:
            # Disjoint per-chip contributions -> sum == gather over ICI.
            shadow_atlas = jax.lax.psum(shadow_atlas, "tiles")

        # ---- main pass over this chip's row band ----
        mv, mvp = transform_ops.object_uniforms(transforms, view, proj)
        valid = (tri_obj >= 0) & visible[jnp.maximum(tri_obj, 0)]
        clip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], mvp)
        clipped = transform_ops.clip_triangles(clip, valid)
        vis = raster_ops.rasterize(
            clipped.clip, clipped.valid, width, height,
            cull_mode=raster_ops.CullMode.BACK, front_is_cw=front_cw,
            sample_offsets=sample_offsets,
            origin=(0, row0), tile=(width, tile_h),
        )
        img = shade_ops.shade_deferred(
            vis, clipped, tri_vlocal, tri_obj, geo, bases, mv, material_slots,
            materials, dir_lights, point_lights, shadow_atlas, uniforms,
            width, height, sample_offsets, origin=(0, row0),
        )
        img = blit_ops.f16_roundtrip(img)
        resolved = blit_ops.resolve_samples(img)
        return blit_ops.hdr_to_srgb_u8(resolved)

    return jax.jit(tiled_frame)
