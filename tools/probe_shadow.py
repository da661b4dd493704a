"""Probe the shadow-resolve workload on the bench scene: caster counts,
per-tile group-list stats, row-cull density, and kernel time vs N_OFF."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_buildings = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    width, height = 1920, 1080

    from bench import build_city_scene
    from rend3_tpu.testing import TestRunner
    from rend3_tpu.routine.base import BaseRenderGraphSettings, FrameRenderTarget, _round_up
    from rend3_tpu.types import Camera, Perspective, Handedness
    from rend3_tpu.utils import math as m3
    from rend3_tpu.utils.devbench import time_op
    from rend3_tpu.ops import deferred as def_ops
    from rend3_tpu.ops import geometry as geom_ops
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
        eval_output, FrameRenderTarget(width, height, 1), BaseRenderGraphSettings()
    )
    (
        geo, tri_vlocal, tri_obj, _bv, _bo, transforms, visible, shadow_visible,
        bases, material_slots, mat_data, mat_flags, mat_tex, dir_lights,
        point_lights, uniforms, view, proj, clear_color, _tex, _cube, _sky, _pm,
    ) = args
    front_cw = r.handedness == Handedness.LEFT
    plan = eval_output.shadow_plan
    wp = _round_up(width, def_ops.DTILE_W)
    hp = _round_up(height, def_ops.DTILE_H)

    # Build the G-buffer to get sx, sy, hitp.
    @jax.jit
    def front(transforms):
        mv, mvp = transform_ops.object_uniforms(transforms, view, proj)
        valid = (tri_obj >= 0) & visible[jnp.maximum(tri_obj, 0)]
        clip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], mvp)
        clipped = transform_ops.clip_triangles(clip, valid)
        tris = geom_ops.cull_and_setup(clipped.clip, clipped.valid, width, height,
                                       cull_mode=raster_ops.CullMode.BACK,
                                       front_is_cw=front_cw, subpixel=True)
        planes = def_ops.attribute_planes(tris, clipped.clip, clipped.bary, clipped.orig,
                                          tri_vlocal, tri_obj, bases, geo, mv, material_slots,
                                          width, height)
        from rend3_tpu.routine.base import _tile_cap_for
        n_tiles_d = (wp // def_ops.DTILE_W) * (hp // def_ops.DTILE_H)
        binned = geom_ops.bin_triangles(tris, wp, hp,
                                        tile_cap=_tile_cap_for(clipped.clip.shape[0], n_tiles_d),
                                        tile_h=def_ops.DTILE_H, tile_w=def_ops.DTILE_W)
        gbuf_p = def_ops.raster_resolve(tris, planes, binned, wp, hp, interpret=False)[0]
        return gbuf_p

    gbuf_p = front(transforms)
    gp = gbuf_p.data
    den = gp[def_ops.G_DEN]
    invden = jnp.where(jnp.abs(den) < 1e-30, 1.0, 1.0 / den)
    vp_img = gp[def_ops.G_VP: def_ops.G_VP + 3] * invden[None]
    hitp = gp[def_ops.G_HIT] > 0.0
    iv = uniforms.inv_view
    world = jnp.einsum("ab,bhw->ahw", iv[:3, :3], vp_img) + iv[:3, 3][:, None, None]
    world4 = jnp.concatenate([world, jnp.ones((1, hp, wp))], axis=0)

    k, (li, (ox, oy), size) = 0, plan[0]
    svp = dir_lights.view_proj[k]
    ndc = jnp.einsum("ab,bhw->ahw", svp, world4)
    ndcw = jnp.where(ndc[3] == 0.0, 1.0, ndc[3])
    ndc_xyz = ndc[:3] / ndcw[None]
    sx = (ndc_xyz[0] * 0.5 + 0.5) * size
    sy = (0.5 - ndc_xyz[1] * 0.5) * size

    _, smvp = transform_ops.object_uniforms(transforms, svp, jnp.eye(4))
    svalid = (tri_obj >= 0) & shadow_visible[k][jnp.maximum(tri_obj, 0)]
    sclip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], smvp)
    sclipped = transform_ops.clip_triangles(sclip, svalid)
    stris = jax.jit(lambda c, v: geom_ops.cull_and_setup(
        c, v, size, size, cull_mode=raster_ops.CullMode.FRONT,
        front_is_cw=front_cw, subpixel=True))(sclipped.clip, sclipped.valid)
    print("shadow casters:", int(stris.count), "of", sclipped.clip.shape[0], flush=True)

    cap = min(stris.setup.shape[0], -(-2048 // 8) * 8)
    counts, row_bits, bset, coords, overflow = jax.jit(
        lambda s, bb: shadow_ops._build_tile_lists(
            stris._replace(setup=s, bbox=bb), sx, sy, hitp, wp, hp, size,
            lt=32, cap=cap, row_cull=True),
    )(stris.setup, stris.bbox)
    counts = np.asarray(counts)
    rb = np.asarray(row_bits)
    print("per-tile caster counts: mean %.0f p50 %.0f p90 %.0f max %d, overflow %d"
          % (counts.mean(), np.percentile(counts, 50), np.percentile(counts, 90),
             counts.max(), int(overflow)), flush=True)
    # Row-cull density: fraction of (group,row) pairs live among used groups.
    ngroups = np.maximum(counts // 8, 1)
    livebits = np.zeros(())
    tot = 0.0
    live = 0.0
    for t in range(rb.shape[0]):
        g = int(ngroups[t])
        bits = rb[t, :g]
        live += sum(bin(int(b) & 0xFFFFFFFF).count("1") for b in bits)
        tot += g * 32
    print("row-cull live fraction: %.3f (of %d group-rows)" % (live / max(tot, 1), int(tot)), flush=True)

    # Kernel time at N_OFF=12 (full) via time_op on shadow_occlusion_lt.
    def s_occ(setup, bbox):
        st = stris._replace(setup=setup, bbox=bbox)
        occ, _ = shadow_ops.shadow_occlusion_lt(st, sx, sy, hitp, wp, hp, size)
        return occ

    from rend3_tpu.utils.devbench import time_op
    t_full = time_op(s_occ, stris.setup, stris.bbox, iters=4, name="occlusion_lt full")

    # And the list-build prepass alone.
    def s_lists(setup, bbox):
        st = stris._replace(setup=setup, bbox=bbox)
        return shadow_ops._build_tile_lists(st, sx, sy, hitp, wp, hp, size, lt=32, cap=cap, row_cull=True)[:3]

    t_lists = time_op(s_lists, stris.setup, stris.bbox, iters=4, name="tile-list build")
    print(f"kernel-only estimate: {t_full - t_lists:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
