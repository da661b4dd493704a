"""Cube without the framework (reference: examples/src/cube_no_framework/mod.rs):
the same lit cube as examples/cube.py, but driving the raw renderer API
directly — create the Renderer, build the base graph, push instructions,
swap + evaluate, render — exactly the sequence an integrating application
performs without `rend3_tpu.framework`."""

import sys

import numpy as np

sys.path.insert(0, ".")

from examples.cube import CUBE_INDICES, CUBE_POSITIONS
from rend3_tpu.core.renderer import Renderer
from rend3_tpu.routine.base import (
    BaseRenderGraph,
    BaseRenderGraphSettings,
    FrameRenderTarget,
)
from rend3_tpu.routine.pbr.material import AlbedoComponent, PbrMaterial
from rend3_tpu.types import (
    Camera,
    DirectionalLight,
    Handedness,
    MeshBuilder,
    Object,
    Perspective,
    StaticMeshKind,
)
from rend3_tpu.utils import math as m3


def main(width=1280, height=720, out="cube_no_framework.png"):
    # cube_no_framework/mod.rs:96-116 — create the renderer + base routines.
    renderer = Renderer(handedness=Handedness.LEFT, aspect_ratio=width / height)
    base_graph = BaseRenderGraph(renderer)

    # mod.rs:118-143 — mesh, material, object (held alive for the render).
    mesh = MeshBuilder(CUBE_POSITIONS, Handedness.LEFT).with_indices(CUBE_INDICES).build()
    mesh_handle = renderer.add_mesh(mesh)
    material = renderer.add_material(
        PbrMaterial(albedo=AlbedoComponent.new_value([0.0, 0.5, 0.5, 1.0]))
    )
    _object = renderer.add_object(
        Object(mesh_kind=StaticMeshKind(mesh_handle), material=material, transform=np.eye(4))
    )

    # mod.rs:145-160 — camera.
    view_location = np.array([3.0, 3.0, -5.0], np.float32)
    view = m3.rotation_x(-0.55) @ m3.rotation_y(0.5) @ m3.translation(-view_location)
    renderer.set_camera_data(Camera(projection=Perspective(vfov=60.0, near=0.1), view=view))

    # mod.rs:162-172 — one directional light.
    _light = renderer.add_directional_light(
        DirectionalLight(
            color=np.ones(3, np.float32),
            intensity=10.0,
            direction=np.array([-1.0, -4.0, 2.0], np.float32),
            distance=400.0,
            resolution=2048,
        )
    )

    # mod.rs:183-196 — swap buffers, evaluate instructions, draw the frame.
    renderer.swap_instruction_buffers()
    eval_output = renderer.evaluate_instructions()
    img = base_graph.render_frame(
        eval_output,
        FrameRenderTarget(width, height, 1),
        BaseRenderGraphSettings(clear_color=(0.10, 0.05, 0.10, 1.0)),
    )

    from rend3_tpu.testing import save_png

    save_png(out, img)
    print(f"wrote {out}")
    return img


if __name__ == "__main__":
    main()
