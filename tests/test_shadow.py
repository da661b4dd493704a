"""Shadow golden tests (reference: rend3-test/tests/shadow.rs): lit plane,
then a cube casting a shadow onto it. 256px, reference threshold P50<=0.04."""

import numpy as np

from rend3_tpu.testing import FrameRenderSettings, TestRunner, Threshold
from rend3_tpu.types import Camera, Orthographic
from rend3_tpu.utils import math as m3


def test_shadows():
    runner = TestRunner()
    light = runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32))
    mat1 = runner.add_lit_material([0.25, 0.5, 0.75, 1.0])
    plane = runner.plane(mat1, m3.rotation_x(-np.pi / 2))

    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([2.5, 2.5, 5.0], np.float32)),
            view=m3.look_at_lh([0.0, 1.0, -1.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    runner.render_and_compare(
        FrameRenderSettings(size=256), "shadow/plane.png",
        # Reference gate: FLIP P50 <= 0.04 (rend3-test/tests/shadow.rs:33).
        Threshold(mae=0.02, ssim=0.95, flip_percentiles=((50.0, 0.04),)),
    )

    mat2 = runner.add_lit_material([0.75, 0.5, 0.25, 1.0])
    cube = runner.cube(mat2, m3.translation([0.25, 0.25, -0.25]) @ m3.scale(0.25))
    runner.render_and_compare(
        FrameRenderSettings(size=256), "shadow/cube.png",
        Threshold(mae=0.02, ssim=0.95, flip_percentiles=((50.0, 0.04),)),
    )
