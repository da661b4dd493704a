"""Golden tests against the reference's simple suite
(reference: rend3-test/tests/simple.rs) — empty scene, triangle
winding/handedness matrix, 6-axis coordinate-space cameras. Goldens are the
wgpu reference renders."""

import numpy as np
import pytest

from rend3_tpu.testing import FrameRenderSettings, TestRunner, Threshold
from rend3_tpu.types import Camera, Handedness, MeshBuilder, Object, RawProjection, StaticMeshKind


def test_empty():
    runner = TestRunner()
    runner.set_camera_data(Camera(projection=RawProjection(np.eye(4)), view=np.eye(4)))
    runner.render_and_compare(FrameRenderSettings(), "simple/empty.png", Threshold(mae=0.001, ssim=0.999))


@pytest.mark.parametrize(
    "handedness,winding_cw,visible",
    [
        (Handedness.LEFT, True, True),
        (Handedness.LEFT, False, False),
        (Handedness.RIGHT, True, False),
        (Handedness.RIGHT, False, True),
    ],
)
def test_triangle(handedness, winding_cw, visible):
    runner = TestRunner(handedness=handedness)

    if winding_cw:
        verts = [[0.5, -0.5, 0.0], [-0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]
        mesh_handedness = Handedness.LEFT
    else:
        verts = [[0.5, -0.5, 0.0], [0.0, 0.5, 0.0], [-0.5, -0.5, 0.0]]
        mesh_handedness = Handedness.RIGHT

    mesh = MeshBuilder(np.array(verts, np.float32), mesh_handedness).build()
    mesh_hdl = runner.add_mesh(mesh)
    mat_hdl = runner.add_unlit_material([0.25, 0.5, 0.75, 1.0])
    obj_hdl = runner.add_object(Object(mesh_kind=StaticMeshKind(mesh_hdl), material=mat_hdl, transform=np.eye(4)))
    runner.set_camera_data(Camera(projection=RawProjection(np.eye(4)), view=np.eye(4)))

    golden = "simple/triangle.png" if visible else "simple/triangle-backface.png"
    runner.render_and_compare(FrameRenderSettings(), golden, Threshold(mae=0.004, ssim=0.98))


def test_coordinate_space():
    # reference: simple.rs coordinate_space — six triangles, one per axis
    # direction, each visible only from its matching camera.
    X, Y, Z = np.eye(3, dtype=np.float32)
    tests = [
        ("NegZ", X, Y, -Z),
        ("Z", -X, Y, Z),
        ("NegY", X, -Z, -Y),
        ("Y", X, Z, Y),
        ("NegX", -Z, Y, -X),
        ("X", Z, Y, X),
    ]
    runner = TestRunner(handedness=Handedness.LEFT)
    objects = []
    for _name, right, up, cam_vec in tests:
        mesh = MeshBuilder(
            np.stack([
                0.5 * right + -0.5 * up,
                -0.5 * right + -0.5 * up,
                0.0 * right + 0.5 * up,
            ]),
            Handedness.LEFT,
        ).build()
        neg = (cam_vec < 0).any()
        color = cam_vec * -0.25 if neg else cam_vec
        mat = runner.add_unlit_material(np.append(color, 1.0))
        objects.append(runner.add_object(Object(mesh_kind=StaticMeshKind(runner.add_mesh(mesh)), material=mat)))

    import rend3_tpu.utils.math as m3

    for name, right, up, cam_vec in tests:
        view = m3.look_at_lh(cam_vec, np.zeros(3), up)
        runner.set_camera_data(Camera(projection=RawProjection(np.eye(4)), view=view))
        runner.render_and_compare(
            FrameRenderSettings(), f"simple/coordinate-space-{name}.png", Threshold(mae=0.004, ssim=0.98)
        )
