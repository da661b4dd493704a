"""Microbench: raster_resolve / raster_depth sensitivity to tile_cap.

Usage: python tools/probe_raster.py [n_buildings]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


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
        bases, material_slots, *_rest,
    ) = args
    front_cw = r.handedness == Handedness.LEFT
    wp, hp = _round_up(width, 128), _round_up(height, 32)

    tri_gid = transform_ops.tri_global_ids(tri_vlocal, tri_obj, bases[:, 0], geo.position.shape[0])
    tri_pos = jax.jit(lambda p: p[tri_gid])(geo.position)
    view, proj = args[16], args[17]

    @jax.jit
    def prep(transforms, tri_pos):
        mv, mvp = transform_ops.object_uniforms(transforms, view, proj)
        clip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], mvp, tri_pos=tri_pos)
        clipped = transform_ops.clip_triangles(clip, (tri_obj >= 0) & visible[jnp.maximum(tri_obj, 0)])
        tris = geom_ops.cull_and_setup(clipped.clip, clipped.valid, width, height,
                                       cull_mode=raster_ops.CullMode.BACK,
                                       front_is_cw=front_cw, subpixel=True, cap=65536)
        planes = def_ops.attribute_planes(tris, clipped.clip, clipped.bary, clipped.orig,
                                          tri_vlocal, tri_obj, bases, geo, mv, material_slots,
                                          width, height)
        return tris, planes

    tris, planes = prep(transforms, tri_pos)
    jax.block_until_ready(planes)

    for cap in (512, 1024, 2048):
        binned = jax.jit(lambda t: geom_ops.bin_triangles(
            t, wp, hp, tile_cap=cap, tile_h=def_ops.DTILE_H, tile_w=def_ops.DTILE_W))(tris)
        print(f"cap={cap} overflow={int(binned.overflow)} max_count={int(binned.counts.max())} "
              f"total_pairs={int(binned.counts.sum())}", flush=True)
        time_op(lambda t, p, b: def_ops.raster_resolve(t, p, b, wp, hp),
                tris, planes, binned, name=f"  raster_resolve cap={cap}")
        time_op(lambda t, b: def_ops.raster_depth(t, b, wp, hp),
                tris, binned, name=f"  raster_depth   cap={cap}")

    # planes timing after the einsum rewrite
    time_op(lambda t, tp: prep(t, tp)[1], transforms, tri_pos, name="prep(incl planes)")


def probe_gather():
    """Split raster_resolve into gather vs kernel at each cap."""
    import numpy as np
    sys.argv = [sys.argv[0]] + sys.argv[2:]
    n_buildings = 600
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
    from rend3_tpu.ops import transform as transform_ops
    import jax, jax.numpy as jnp

    runner = TestRunner()
    keep = build_city_scene(runner, n_buildings=n_buildings)
    runner.set_camera_data(Camera(projection=Perspective(vfov=60.0, near=0.1),
        view=m3.look_at_lh([40.0, 30.0, -60.0], [0.0, 5.0, 0.0], [0.0, 1.0, 0.0])))
    r = runner.renderer
    r.set_aspect_ratio(width / height)
    r.swap_instruction_buffers()
    eval_output = r.evaluate_instructions()
    program, args = runner.base_graph.build_frame_callable(
        eval_output, FrameRenderTarget(width, height, 1), BaseRenderGraphSettings())
    (geo, tri_vlocal, tri_obj, _bv, _bo, transforms, visible, shadow_visible,
     bases, material_slots, *_rest) = args
    front_cw = r.handedness == Handedness.LEFT
    wp, hp = _round_up(width, 128), _round_up(height, 32)
    view, proj = args[16], args[17]
    tri_gid = transform_ops.tri_global_ids(tri_vlocal, tri_obj, bases[:, 0], geo.position.shape[0])
    tri_pos = jax.jit(lambda p: p[tri_gid])(geo.position)

    @jax.jit
    def prep(transforms, tri_pos):
        mv, mvp = transform_ops.object_uniforms(transforms, view, proj)
        clip = transform_ops.gather_tri_clip(geo.position, tri_vlocal, tri_obj, bases[:, 0], mvp, tri_pos=tri_pos)
        clipped = transform_ops.clip_triangles(clip, (tri_obj >= 0) & visible[jnp.maximum(tri_obj, 0)])
        tris = geom_ops.cull_and_setup(clipped.clip, clipped.valid, width, height,
                                       cull_mode=raster_ops.CullMode.BACK,
                                       front_is_cw=front_cw, subpixel=True, cap=65536)
        planes = def_ops.attribute_planes(tris, clipped.clip, clipped.bary, clipped.orig,
                                          tri_vlocal, tri_obj, bases, geo, mv, material_slots,
                                          width, height)
        return tris, planes

    tris, planes = prep(transforms, tri_pos)
    for cap in (512, 2048):
        binned = jax.jit(lambda t: geom_ops.bin_triangles(
            t, wp, hp, tile_cap=cap, tile_h=def_ops.DTILE_H, tile_w=def_ops.DTILE_W))(tris)
        gi = jnp.clip(binned.ids, 0, tris.setup.shape[0] - 1)
        time_op(lambda s, p, g: (s[g], p[g]), tris.setup, planes, gi, name=f"gather cap={cap}")
    print("done", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "gather":
        probe_gather()
    else:
        main()
