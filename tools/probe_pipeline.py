"""Standalone piecewise timing of the deferred raster pipeline stages on the
bench scene's main pass: cull_and_setup -> attribute_planes -> bin_triangles
-> pack_raster -> raster_resolve_packed, each jitted separately with inputs
materialized, so per-stage cost is isolated from XLA's whole-frame fusion.

Usage: python tools/probe_pipeline.py [n_buildings]
"""

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
    from rend3_tpu.routine.base import _round_up, _tile_cap_for
    from rend3_tpu.types import Camera, Perspective
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

    g = runner.base_graph
    om = r.object_manager
    cam = r.camera
    opaque, _blend = om.build_tri_tables(r.mesh_manager)
    tcap = 1
    while tcap < len(opaque):
        tcap *= 2
    tri_vlocal = np.zeros((tcap, 3), np.int32)
    tri_obj = np.full(tcap, -1, np.int32)
    tri_vlocal[: len(opaque)] = opaque[:, :3]
    tri_obj[: len(opaque)] = opaque[:, 3]
    ocap = om.cap
    visible = om.enabled & cam.world_frustum.contains_spheres(om.world_spheres)
    geo = r.mesh_manager.evaluate()
    transforms = jnp.asarray(om.transforms)
    bases = jnp.asarray(om.bases)
    mslots = jnp.asarray(om.material_slots)
    view = jnp.asarray(cam.view)
    proj = jnp.asarray(cam.proj)
    tv = jnp.asarray(tri_vlocal)
    to = jnp.asarray(tri_obj)
    vis = jnp.asarray(visible)

    main_cap = 65536
    tmul = 4
    wp = _round_up(width, def_ops.DTILE_W)
    hp = _round_up(height, def_ops.DTILE_H)
    n_tiles_d = (wp // def_ops.DTILE_W) * (hp // def_ops.DTILE_H)

    @jax.jit
    def do_clip(geo, tv, to, transforms, vis, view, proj):
        mv, mvp = transform_ops.object_uniforms(transforms, view, proj)
        valid = (to >= 0) & vis[jnp.maximum(to, 0)]
        clip = transform_ops.gather_tri_clip(geo.position, tv, to, bases[:, 0], mvp)
        return transform_ops.clip_triangles(clip, valid), mv

    clipped, mv = jax.block_until_ready(do_clip(geo, tv, to, transforms, vis, view, proj))
    print("clip table:", clipped.clip.shape, flush=True)
    time_op(do_clip, geo, tv, to, transforms, vis, view, proj, iters=8, name="clip+gather")

    @jax.jit
    def do_cull(clipped):
        return geom_ops.cull_and_setup(
            clipped.clip, clipped.valid, width, height,
            cull_mode=raster_ops.CullMode.BACK, front_is_cw=True,
            subpixel=True, cap=main_cap,
        )

    t = jax.block_until_ready(do_cull(clipped))
    print("survivors:", int(t.count), flush=True)
    time_op(do_cull, clipped, iters=8, name="cull_and_setup")

    @jax.jit
    def do_planes(t, clipped, geo, mv, mslots):
        return def_ops.attribute_planes(
            t, clipped.clip, clipped.bary, clipped.orig,
            tv, to, bases, geo, mv, mslots, width, height,
        )

    p = jax.block_until_ready(do_planes(t, clipped, geo, mv, mslots))
    time_op(do_planes, t, clipped, geo, mv, mslots, iters=8, name="attribute_planes")

    tile_cap = min(main_cap, _tile_cap_for(main_cap, n_tiles_d) * tmul)

    @jax.jit
    def do_bin(t):
        return geom_ops.bin_triangles(
            t, wp, hp, tile_cap=tile_cap,
            tile_h=def_ops.DTILE_H, tile_w=def_ops.DTILE_W,
        )

    b = jax.block_until_ready(do_bin(t))
    print("bin need:", int(b.need), "overflow:", int(b.overflow), flush=True)
    time_op(do_bin, t, iters=8, name="bin_triangles")

    @jax.jit
    def do_pack(t, p, b):
        return def_ops.pack_raster(t, p, b, wp, hp, flat_mult=tmul)

    pk = jax.block_until_ready(do_pack(t, p, b))
    print("flat need:", int(pk.flat.need), "S:", pk.S, flush=True)
    time_op(do_pack, t, p, b, iters=8, name="pack_raster(formula cap)")

    @jax.jit
    def do_raster(pk):
        return def_ops.raster_resolve_packed(pk, wp, hp)

    jax.block_until_ready(do_raster(pk))
    time_op(do_raster, pk, iters=8, name="raster_resolve_packed(formula cap)")

    # Packed with the ADAPTIVE cap (real need): how much of the launch cost
    # is the capacity-proportional step budget?
    need = int(pk.flat.need)
    flc = 2048
    while flc < need * 5 // 4:
        flc *= 2

    @jax.jit
    def do_pack_tight(t, p, b):
        return def_ops.pack_raster(t, p, b, wp, hp, flat_mult=tmul, flat_cap=flc)

    pk2 = jax.block_until_ready(do_pack_tight(t, p, b))
    print("tight cap:", flc, "S:", pk2.S, "overflow:", int(pk2.flat.overflow), flush=True)
    time_op(do_pack_tight, t, p, b, iters=8, name=f"pack_raster(cap={flc})")

    @jax.jit
    def do_raster_tight(pk2):
        return def_ops.raster_resolve_packed(pk2, wp, hp)

    jax.block_until_ready(do_raster_tight(pk2))
    time_op(do_raster_tight, pk2, iters=8, name=f"raster_resolve_packed(cap={flc})")


if __name__ == "__main__":
    main()
