"""50k-object host-path micro-benchmark.

The reference's one published number is a 50k-object scene whose CPU
render-loop cost dropped 16 ms -> 1.75 ms in v0.2.0
(/root/reference/CHANGELOG.md:117-119 — the headline was de-pythonizing the
per-frame object loop). This tool measures the equivalent host-side work per
frame in rend3-tpu: instruction swap + evaluate_instructions + the
build_frame_callable host assembly (frustum masks, blend sort, table
caching, program lookup), with the device program NOT dispatched.

Run on the CPU platform so the number is pure host work:
    JAX_PLATFORMS=cpu python tools/bench_host.py [n_objects]
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    n_objects = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

    import jax

    jax.config.update("jax_platforms", "cpu")

    from rend3_tpu.testing import TestRunner
    from rend3_tpu.routine.base import BaseRenderGraphSettings, FrameRenderTarget
    from rend3_tpu.types import (
        Camera, Handedness, MeshBuilder, Object, Perspective, StaticMeshKind,
    )
    from rend3_tpu.utils import math as m3

    runner = TestRunner()
    r = runner.renderer
    keep = []

    t0 = time.perf_counter()
    mats = [runner.add_lit_material([0.5, 0.5 + 0.1 * i, 0.5, 1.0]) for i in range(4)]
    keep += mats
    # One shared mesh (the reference benchmark draws many instances of
    # simple meshes): a unit cube.
    p = np.array(
        [[-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
         [-1, 1, -1], [1, 1, -1], [1, -1, -1], [-1, -1, -1]], np.float32)
    idx = np.array([0, 1, 2, 2, 3, 0, 4, 5, 6, 6, 7, 4,
                    1, 6, 5, 5, 2, 1, 0, 3, 4, 4, 7, 0,
                    3, 2, 5, 5, 4, 3, 0, 7, 6, 6, 1, 0], np.uint32)
    mesh_h = runner.add_mesh(MeshBuilder(p, Handedness.LEFT).with_indices(idx).build())
    keep.append(mesh_h)
    side = int(np.ceil(n_objects ** (1 / 3)))
    for i in range(n_objects):
        x, y, z = (i % side, (i // side) % side, i // (side * side))
        t = m3.translation([x * 2.0, y * 2.0, z * 2.0]) @ m3.scale(0.4)
        keep.append(r.add_object(Object(
            mesh_kind=StaticMeshKind(mesh_h), material=mats[i % 4], transform=t)))
    add_s = time.perf_counter() - t0
    print(f"added {n_objects} objects in {add_s:.2f}s "
          f"({1e6 * add_s / n_objects:.1f} us/object)")

    keep.append(runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32)))
    runner.set_camera_data(Camera(
        projection=Perspective(vfov=60.0, near=0.1),
        view=m3.look_at_lh([40.0, 30.0, -60.0], [side * 1.0, side * 1.0, side * 1.0],
                           [0.0, 1.0, 0.0]),
    ))
    r.set_aspect_ratio(16 / 9)

    t0 = time.perf_counter()
    r.swap_instruction_buffers()
    eval_output = r.evaluate_instructions()
    print(f"first evaluate_instructions: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    target = FrameRenderTarget(1920, 1080, 1)
    settings = BaseRenderGraphSettings()
    graph = runner.base_graph

    # First build pays triangle tables + device uploads + jit trace; the
    # measured loop is the steady-state per-frame host path.
    t0 = time.perf_counter()
    graph.build_frame_callable(eval_output, target, settings)
    print(f"first build_frame_callable: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    iters = 20
    ts = []
    prof = None
    if "--profile" in sys.argv:
        import cProfile

        prof = cProfile.Profile()
    for _ in range(iters):
        t0 = time.perf_counter()
        if prof is not None:
            prof.enable()
        r.swap_instruction_buffers()
        eval_output = r.evaluate_instructions()
        graph.build_frame_callable(eval_output, target, settings)
        if prof is not None:
            prof.disable()
        ts.append(time.perf_counter() - t0)
    if prof is not None:
        import pstats

        pstats.Stats(prof).sort_stats("cumulative").print_stats(30)
    ms = np.asarray(ts) * 1e3
    print(f"steady-state host loop over {n_objects} objects: "
          f"min {ms.min():.2f} ms  median {np.median(ms):.2f} ms  max {ms.max():.2f} ms")
    print(f"reference baseline: 1.75 ms CPU loop at 50k objects "
          f"(CHANGELOG.md:117-119, unspecified hardware)")
    del keep


if __name__ == "__main__":
    main()
