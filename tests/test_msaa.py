"""MSAA golden tests (reference: rend3-test/tests/msaa.rs): a 4-sample
triangle and a 64x64 grid of shrinking planes exercising sample coverage at
both 1 and 4 samples."""

import numpy as np
import pytest

from rend3_tpu.testing import FrameRenderSettings, TestRunner, Threshold
from rend3_tpu.types import Camera, Handedness, MeshBuilder, Object, RawProjection, StaticMeshKind
from rend3_tpu.utils import math as m3


def test_msaa_triangle():
    runner = TestRunner()
    mesh = MeshBuilder(
        np.array([[0.5, -0.5, 0.0], [-0.5, -0.5, 0.0], [0.0, 0.5, 0.0]], np.float32), Handedness.LEFT
    ).build()
    mesh_hdl = runner.add_mesh(mesh)
    mat = runner.add_unlit_material([0.25, 0.5, 0.75, 1.0])
    obj = runner.add_object(Object(mesh_kind=StaticMeshKind(mesh_hdl), material=mat))
    runner.set_camera_data(Camera(projection=RawProjection(np.eye(4)), view=np.eye(4)))
    runner.render_and_compare(
        FrameRenderSettings(samples=4), "msaa/four.png", Threshold(mae=0.004, ssim=0.98)
    )


@pytest.mark.parametrize("samples", [1, 4])
def test_sample_coverage(samples):
    runner = TestRunner()
    mat = runner.add_unlit_material([1.0, 1.0, 1.0, 1.0])
    base = m3.translation([0.5, 0.5, 0.0]) @ m3.scale([0.5, 0.5, 1.0])
    objs = []
    for x in range(64):
        for y in range(64):
            t = (
                m3.translation([x, y, 0.0])
                @ m3.scale([1.0 - x / 63.0, 1.0 - y / 63.0, 1.0])
                @ base
            )
            objs.append(runner.plane(mat, t))
    runner.set_camera_data(
        Camera(projection=RawProjection(m3.orthographic_lh(0.0, 64.0, 64.0, 0.0, 0.0, 1.0)), view=np.eye(4))
    )
    runner.render_and_compare(
        FrameRenderSettings(samples=samples),
        f"msaa/sample-coverage-{samples}.png",
        Threshold(mae=0.01, ssim=0.93),
    )
