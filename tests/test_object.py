"""Object lifecycle golden tests (reference: rend3-test/tests/object.rs):
duplicate-object handle retention semantics and multi-frame adds across
buffer growth."""

import numpy as np

from rend3_tpu.testing import FrameRenderSettings, TestRunner, Threshold
from rend3_tpu.types import Camera, RawProjection
from rend3_tpu.utils import math as m3

THRESH = Threshold(mae=0.004, ssim=0.98)


def test_duplicate_object_retain():
    runner = TestRunner()
    runner.set_camera_data(Camera(projection=RawProjection(np.eye(4)), view=np.eye(4)))

    mat = runner.add_unlit_material([1.0, 1.0, 1.0, 1.0])
    object1 = runner.plane(mat, m3.translation([-0.5, 0.0, 0.0]) @ m3.scale([-0.25, 0.25, 0.25]))

    runner.render_and_compare(FrameRenderSettings(), "object/duplicate-object-retain-left.png", THRESH)

    object2 = runner.renderer.duplicate_object(
        object1, transform=m3.translation([0.5, 0.0, 0.0]) @ m3.scale([-0.25, 0.25, 0.25])
    )
    del object1

    runner.render_and_compare(FrameRenderSettings(), "object/duplicate-object-retain-right.png", THRESH)


def test_multi_frame_add():
    runner = TestRunner()
    mat = runner.add_unlit_material([1.0, 1.0, 1.0, 1.0])
    base = m3.translation([0.5, 0.5, 0.0]) @ m3.scale([0.5, 1.0, 1.0])
    runner.set_camera_data(
        Camera(projection=RawProjection(m3.orthographic_lh(0.0, 2.0, 16.0, 0.0, 0.0, 1.0)), view=np.eye(4))
    )
    count = 16  # FreelistDerivedBuffer::STARTING_SIZE in the reference
    planes = []
    for x in range(2):
        for y in range(count):
            planes.append(runner.plane(mat, m3.translation([x, y, 0.0]) @ base))
        runner.render_and_compare(FrameRenderSettings(), f"object/multi-frame-add-{x}.png", THRESH)
