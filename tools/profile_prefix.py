"""Fused-prefix timing of the bench frame program.

Times the SAME jitted frame program truncated after successive stages
(geom -> gbuf -> shadow -> light -> full); consecutive differences localize
cost inside the fused program, which per-stage timing (profile_stages.py)
cannot do when XLA schedules/rematerializes differently in the full frame.

Usage: python tools/profile_prefix.py [n_buildings] [width height]
"""

import sys

sys.path.insert(0, ".")


def main():
    n_buildings = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    from bench import build_city_scene
    from rend3_tpu.testing import TestRunner
    from rend3_tpu.routine import base as base_mod
    from rend3_tpu.routine.base import BaseRenderGraphSettings, FrameRenderTarget
    from rend3_tpu.types import Camera, Perspective
    from rend3_tpu.utils import math as m3
    from rend3_tpu.utils.devbench import time_op

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
    settings = BaseRenderGraphSettings(ambient_color=(0.08, 0.08, 0.1, 1.0))
    target = FrameRenderTarget(width, height, 1)

    # Settle adaptive survivor caps AND the carried visibility mask: frame 1
    # runs unoccluded (no carried mask) and inflates every cap ~6x; frame 2
    # runs occluded and triggers the survivor-cap shrink; frame 3 renders the
    # lean steady-state program the bench actually times.
    for i in range(3):
        runner.base_graph.render_frame(eval_output, target, settings)
        print(f"settle {i}: caps:", runner.base_graph._caps,
              "stats:", runner.base_graph.last_stats, flush=True)

    # "smaps" is band-only now (single-chip shadow maps come from the cached
    # shadow program and arrive as args); "shadow" times the PCF resolve.
    stages = ("clip", "gbuf", "cutout", "blendraster", "shadow", "light", None)
    if len(sys.argv) > 4:
        stages = tuple(s if s != "None" else None for s in sys.argv[4].split(","))

    from rend3_tpu.ops import shade as shade_mod

    ledger = {}
    prev = 0.0
    for stage in stages:
        if stage in ("shadepixdata", "shadedir"):
            # Bisect _shade_pixels inside the opaque lighting prefix.
            base_mod._DEBUG_STOP_AFTER = "lightopaque"
            shade_mod._DEBUG_STOP = {"shadepixdata": "pixdata", "shadedir": "dir"}[stage]
        else:
            base_mod._DEBUG_STOP_AFTER = stage
            shade_mod._DEBUG_STOP = None
        runner.base_graph._program_cache.clear()
        program, args = runner.base_graph.build_frame_callable(eval_output, target, settings)
        ms = time_op(program.__wrapped__, *args, iters=4, name=f"prefix {stage}")
        ledger[str(stage)] = (ms, ms - prev)
        prev = ms
    base_mod._DEBUG_STOP_AFTER = None
    shade_mod._DEBUG_STOP = None

    print("\n==== fused prefix ledger (ms, delta) ====")
    for k, (ms, d) in ledger.items():
        print(f"  {k:8s} {ms:8.2f}  (+{d:.2f})")


if __name__ == "__main__":
    main()
