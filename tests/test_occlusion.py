"""Two-phase Hi-Z occlusion culling: fewer survivors, identical image.

Reference: rend3-routine/src/base.rs:155-172 + shaders cull.wgsl:243-262.
"""

import numpy as np

from rend3_tpu.testing import FrameRenderSettings, TestRunner
from rend3_tpu.types import Camera, Orthographic
from rend3_tpu.utils import math as m3


def _build(runner):
    keep = []
    keep.append(runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32)))
    wall = runner.add_lit_material([0.6, 0.6, 0.6, 1.0])
    keep.append(wall)
    # Big wall close to the camera hides everything behind it (rotated to
    # face the camera at -z; the default plane faces +z and would backface
    # cull).
    keep.append(
        runner.plane(wall, m3.translation([0.0, 0.0, 0.5]) @ m3.rotation_y(np.pi) @ m3.scale(2.0))
    )
    hidden = runner.add_lit_material([0.8, 0.2, 0.2, 1.0])
    keep.append(hidden)
    for i in range(4):
        for j in range(4):
            keep.append(
                runner.cube(
                    hidden,
                    m3.translation([(i - 1.5) * 0.5, (j - 1.5) * 0.5, 2.0]) @ m3.scale(0.2),
                )
            )
    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([4.0, 4.0, 8.0], np.float32)),
            view=m3.look_at_lh([0.0, 0.0, -2.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    return keep


def test_occlusion_culls_hidden_and_keeps_image():
    runner = TestRunner()
    keep = _build(runner)
    settings = FrameRenderSettings(size=128)

    runner.base_graph.occlusion_culling = False
    img_off = runner.render_frame(settings)
    s_off = runner.base_graph.last_stats["main_survivors"]

    runner.base_graph.occlusion_culling = True
    runner.base_graph._prev_visible_mask = None
    img_on1 = runner.render_frame(settings)   # frame 1: all-ones predicted mask
    img_on2 = runner.render_frame(settings)   # frame 2: carried mask
    st = runner.base_graph.last_stats
    s_on2 = st["main_survivors"] + st["resid_survivors"]

    assert s_off > 0
    # Frame 1 predicts everything (reference two-phase semantics: the
    # benefit starts once a carried mask exists). By frame 2 the wall hides
    # all 16 cubes: total rastered triangles must drop.
    assert s_on2 < s_off, (s_on2, s_off)
    # Culling must be image-neutral on every frame.
    np.testing.assert_array_equal(img_on1, img_off)
    np.testing.assert_array_equal(img_on2, img_off)
    del keep
