"""Material-archetype routine registration (reference: the per-archetype
vtable, rend3/src/managers/material.rs:43-61 + ForwardRoutine<M>): a second
material class with its own shading routine draws in the same frame as
PbrMaterial; archetypes with NO registered routine don't draw (reference
semantics: no vtable entry, no pipeline)."""

import numpy as np

from rend3_tpu.routine.registry import MaterialRoutine, unlit_routine
from rend3_tpu.testing import FrameRenderSettings, TestRunner
from rend3_tpu.types import Camera, Orthographic
from rend3_tpu.types.attribute import POSITION
from rend3_tpu.types.material import Sorting
from rend3_tpu.utils import math as m3


class FlatMaterial:
    """Minimal non-PBR material: rgba data block, unlit."""

    def __init__(self, color):
        self.color = np.asarray(color, np.float32)

    @classmethod
    def required_attributes(cls):
        return (POSITION,)

    @classmethod
    def supported_attributes(cls):
        return (POSITION,)

    @classmethod
    def data_size(cls):
        return 4

    @classmethod
    def texture_count(cls):
        return 0

    def key(self):
        return 0

    def sorting(self):
        return Sorting.opaque()

    def to_textures(self):
        return []

    def to_data(self):
        return self.color

    def to_flags(self):
        return 0


def _scene(runner):
    keep = [runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32))]
    pbr = runner.add_lit_material([0.1, 0.6, 0.1, 1.0])
    keep.append(pbr)
    keep.append(runner.plane(pbr, m3.rotation_x(-np.pi / 2) @ m3.scale(3.0)))
    # sRGB-encoded output: 0.02 linear -> ~0.16 display, safely under the
    # red-mask channel ceiling (0.1 linear would encode to ~0.35).
    flat = runner.renderer.add_material(FlatMaterial([0.9, 0.02, 0.02, 1.0]))
    keep.append(flat)
    keep.append(runner.cube(flat, m3.translation([0.0, 0.5, 0.0]) @ m3.scale(0.5)))
    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([4.0, 4.0, 8.0], np.float32)),
            view=m3.look_at_lh([0.0, 1.5, -2.0], [0.0, 0.25, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    return keep


def test_registered_archetype_draws_alongside_pbr():
    runner = TestRunner()
    keep = _scene(runner)
    runner.base_graph.register_routine(unlit_routine(FlatMaterial))
    img = runner.render_frame(FrameRenderSettings(size=128))

    f = img.astype(np.float32) / 255.0
    red = (f[..., 0] > 0.6) & (f[..., 1] < 0.3) & (f[..., 2] < 0.3)
    green = (f[..., 1] > 0.15) & (f[..., 0] < f[..., 1]) & (f[..., 2] < f[..., 1])
    assert red.sum() > 50, f"FlatMaterial cube missing ({red.sum()} red px)"
    assert green.sum() > 500, f"PBR plane missing ({green.sum()} green px)"
    del keep


def test_unregistered_archetype_does_not_draw():
    runner = TestRunner()
    keep = _scene(runner)  # no register_routine
    img = runner.render_frame(FrameRenderSettings(size=128))
    f = img.astype(np.float32) / 255.0
    red = (f[..., 0] > 0.6) & (f[..., 1] < 0.3) & (f[..., 2] < 0.3)
    assert red.sum() == 0, f"unregistered archetype drew {red.sum()} px"
    del keep
