"""Per-stage device profile of the bench scene's deferred frame.

Replicates routine/base.py's deferred program stage by stage, materializing
intermediates between stages and timing each with devbench.time_op (the only
honest timing through the axon tunnel). Prints a stage ledger.

Usage: python tools/profile_stages.py [n_buildings] [width height]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_buildings = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    from bench import build_city_scene
    from rend3_tpu.testing import TestRunner
    from rend3_tpu.routine.base import (
        BaseRenderGraphSettings,
        FrameRenderTarget,
        _round_up,
        _tile_cap_for,
    )
    from rend3_tpu.types import Camera, Perspective, Handedness
    from rend3_tpu.utils import math as m3
    from rend3_tpu.utils.devbench import time_op
    from rend3_tpu.ops import deferred as def_ops
    from rend3_tpu.ops import geometry as geom_ops
    from rend3_tpu.ops import lighting as light_ops
    from rend3_tpu.ops import raster as raster_ops
    from rend3_tpu.ops import shade as shade_ops
    from rend3_tpu.ops import shadow as shadow_ops
    from rend3_tpu.ops import transform as transform_ops

    runner = TestRunner()
    keep = build_city_scene(runner, n_buildings=n_buildings)
    runner.set_camera_data(
        Camera(
            projection=Perspective(vfov=60.0, near=0.1),
            view=m3.look_at_lh([40.0, 30.0, -60.0], [0.0, 5.0, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    r = runner.renderer
    r.set_aspect_ratio(width / height)
    r.swap_instruction_buffers()
    eval_output = r.evaluate_instructions()
    program, args = runner.base_graph.build_frame_callable(
        eval_output, FrameRenderTarget(width, height, 1),
        BaseRenderGraphSettings(ambient_color=(0.08, 0.08, 0.1, 1.0)),
    )
    (
        geo, tri_vlocal, tri_obj, _bv, _bo, transforms, visible, shadow_visible,
        bases, material_slots, mat_data, mat_flags, mat_tex, dir_lights,
        point_lights, uniforms, view, proj, clear_color, _tex, _cube, _sky, _pm,
        _cutout_tri, _extra_mats, _smaps, _smaps_pre,
    ) = args
    materials = shade_ops.PbrMaterialTable(mat_data, mat_flags, mat_tex)
    front_cw = r.handedness == Handedness.LEFT
    plan = eval_output.shadow_plan
    print(f"tris={tri_vlocal.shape[0]} objs={transforms.shape[0]} plan={plan}", flush=True)

    wp = _round_up(width, def_ops.DTILE_W)
    hp = _round_up(height, def_ops.DTILE_H)
    n_tiles_d = (wp // def_ops.DTILE_W) * (hp // def_ops.DTILE_H)
    ledger = {}

    tri_gid = transform_ops.tri_global_ids(tri_vlocal, tri_obj, bases[:, 0], geo.position.shape[0])
    tri_pos = jax.jit(lambda p: p[tri_gid])(geo.position)

    # --- stage 1: uniforms + gather + clip ---
    def s1(transforms, tri_pos):
        mv, mvp = transform_ops.object_uniforms(transforms, view, proj)
        clip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], mvp, tri_pos=tri_pos)
        clipped = transform_ops.clip_triangles(clip, (tri_obj >= 0) & visible[jnp.maximum(tri_obj, 0)])
        return clipped, mv

    ledger["1 xform+clip"] = time_op(s1, transforms, tri_pos, name="1 xform+clip")
    clipped, mv = jax.jit(s1)(transforms, tri_pos)
    jax.block_until_ready(clipped.clip)

    # --- stage 2: cull_and_setup ---
    def s2(clip, valid):
        return geom_ops.cull_and_setup(clip, valid, width, height,
                                       cull_mode=raster_ops.CullMode.BACK,
                                       front_is_cw=front_cw, subpixel=True)

    ledger["2 cull+setup"] = time_op(s2, clipped.clip, clipped.valid, name="2 cull+setup")
    tris = jax.jit(s2)(clipped.clip, clipped.valid)
    print("   survivors:", int(tris.count), "of", clipped.clip.shape[0], flush=True)

    # --- stage 3: attribute planes ---
    def s3(tris, clip, bary, mv):
        return def_ops.attribute_planes(tris, clip, bary, clipped.orig, tri_vlocal,
                                        tri_obj, bases, geo, mv, material_slots, width, height)

    ledger["3 planes"] = time_op(s3, tris, clipped.clip, clipped.bary, mv, name="3 planes")
    planes = jax.jit(s3)(tris, clipped.clip, clipped.bary, mv)

    tile_cap = _tile_cap_for(clipped.clip.shape[0], n_tiles_d)
    print("   tile_cap:", tile_cap, "n_tiles:", n_tiles_d, flush=True)

    # --- stage 4: binning ---
    def s4(tris):
        return geom_ops.bin_triangles(tris, wp, hp, tile_cap=tile_cap,
                                      tile_h=def_ops.DTILE_H, tile_w=def_ops.DTILE_W)

    ledger["4 binning"] = time_op(s4, tris, name="4 binning")
    binned = jax.jit(s4)(tris)
    print("   overflow:", int(binned.overflow), "max tile count:", int(binned.counts.max()), flush=True)

    # --- stage 5: raster_resolve ---
    def s5(tris, planes, binned):
        return def_ops.raster_resolve(tris, planes, binned, wp, hp, interpret=False)[0]

    ledger["5 raster_resolve"] = time_op(s5, tris, planes, binned, name="5 raster_resolve")
    gbuf_p = jax.jit(s5)(tris, planes, binned)

    # --- stage 6: shadow resolve, split into sub-stages ---
    from rend3_tpu.routine.base import _round_up as _ru

    def s6a(gp):
        """World reconstruction + light-space coords."""
        den = gp[def_ops.G_DEN]
        invden = jnp.where(jnp.abs(den) < 1e-30, 1.0, 1.0 / den)
        vp_img = gp[def_ops.G_VP: def_ops.G_VP + 3] * invden[None]
        hitp = gp[def_ops.G_HIT] > 0.0
        iv = uniforms.inv_view
        world = jnp.einsum("ab,bhw->ahw", iv[:3, :3], vp_img) + iv[:3, 3][:, None, None]
        world4 = jnp.concatenate([world, jnp.ones((1, hp, wp))], axis=0)
        outs = []
        for k, (li, (ox, oy), size) in enumerate(plan):
            svp = dir_lights.view_proj[k]
            ndc = jnp.einsum("ab,bhw->ahw", svp, world4)
            ndcw = jnp.where(ndc[3] == 0.0, 1.0, ndc[3])
            ndc_xyz = ndc[:3] / ndcw[None]
            sx = (ndc_xyz[0] * 0.5 + 0.5) * size
            sy = (0.5 - ndc_xyz[1] * 0.5) * size
            outs.append((sx, sy, ndc_xyz[2]))
        return outs, hitp

    ledger["6a shadow coords"] = time_op(lambda gp: s6a(gp)[0], gbuf_p.data, name="6a shadow coords")
    coords_out, hitp = jax.jit(s6a)(gbuf_p.data)

    def s6b(transforms, tri_pos):
        """Shadow geometry + depth-map raster per light."""
        maps = []
        for k, (li, (ox, oy), size) in enumerate(plan):
            svp = dir_lights.view_proj[k]
            _, smvp = transform_ops.object_uniforms(transforms, svp, jnp.eye(4))
            svalid = (tri_obj >= 0) & shadow_visible[k][jnp.maximum(tri_obj, 0)]
            sclip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], smvp, tri_pos=tri_pos)
            sclipped = transform_ops.clip_triangles(sclip, svalid)
            stris = geom_ops.cull_and_setup(sclipped.clip, sclipped.valid, size, size,
                                            cull_mode=raster_ops.CullMode.FRONT,
                                            front_is_cw=front_cw, subpixel=True)
            swp, shp = _ru(size, def_ops.DTILE_W), _ru(size, def_ops.DTILE_H)
            nts = (swp // def_ops.DTILE_W) * (shp // def_ops.DTILE_H)
            sbinned = geom_ops.bin_triangles(
                stris, swp, shp, tile_cap=_tile_cap_for(sclipped.clip.shape[0], nts),
                tile_h=def_ops.DTILE_H, tile_w=def_ops.DTILE_W)
            maps.append(def_ops.raster_depth(stris, sbinned, swp, shp)[0][:size, :size])
        return maps

    ledger["6b shadow raster"] = time_op(lambda t, tp: s6b(t, tp)[0], transforms, tri_pos, name="6b shadow raster")
    smaps = jax.jit(s6b)(transforms, tri_pos)

    def s6c(smap0, hitp):
        outs = []
        for k, (li, (ox, oy), size) in enumerate(plan):
            sx, sy, ref = coords_out[k]
            occ, _ov = shadow_ops.sample_shadow_map(smap0, sx, sy, hitp)
            outs.append(shadow_ops.pcf5_from_occlusion(occ, sx, sy, ref))
        return jnp.stack(outs)

    ledger["6c shadow sample"] = time_op(s6c, smaps[0], hitp, name="6c shadow sample")
    shadow_values_p = jax.jit(s6c)(smaps[0], hitp)
    shadow_values = shadow_values_p[:, :height, :width]
    L = dir_lights.mask.shape[0]
    shadow_values = jnp.concatenate([
        shadow_values, jnp.ones((L - shadow_values.shape[0], height, width))], 0) \
        if shadow_values.shape[0] < L else shadow_values

    # --- stage 7: lighting ---
    background = jnp.broadcast_to(clear_color, (height, width, 4))

    def s7(gdata, shadow_values):
        gbuf = def_ops.GBuffer(data=gdata[:, :height, :width])
        atlas = jnp.zeros(eval_output.shadow_atlas_extent[::-1], jnp.float32)
        return light_ops.light_gbuffer(gbuf, materials, dir_lights, point_lights,
                                       atlas, uniforms, background,
                                       textures=None, shadow_values=shadow_values)

    ledger["7 lighting"] = time_op(s7, gbuf_p.data, shadow_values, name="7 lighting")

    # --- whole frame for comparison ---
    ledger["whole frame"] = time_op(program.__wrapped__, *args, iters=4, name="whole frame")

    print("\n==== stage ledger (ms) ====")
    tot = 0.0
    for k, v in ledger.items():
        print(f"  {k:20s} {v:8.2f}")
        if not k.startswith("whole"):
            tot += v
    print(f"  {'sum of stages':20s} {tot:8.2f}")


if __name__ == "__main__":
    main()
