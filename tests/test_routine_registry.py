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


class FlatBlendMaterial(FlatMaterial):
    """Non-PBR alpha-blended material (sorting = REQUIREMENT)."""

    def sorting(self):
        return Sorting.blending()


def _facing_quad(r, z, s):
    """Quad at depth z facing the -z ortho camera (test_blend winding)."""
    from rend3_tpu.types import Handedness, MeshBuilder

    v = np.array([[-s, s, z], [s, s, z], [s, -s, z], [-s, -s, z]], np.float32)
    return r.add_mesh(
        MeshBuilder(v, Handedness.LEFT)
        .with_indices(np.array([0, 1, 2, 2, 3, 0], np.uint32))
        .build()
    )


def test_registered_blend_routine_composites():
    """A registered blend-mode routine's objects render through the ordered
    blend peels with the routine's own shading (ref: forward.rs:62-83 blend
    pipelines per archetype)."""
    runner = TestRunner()
    keep = [runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32))]
    pbr = runner.add_lit_material([0.1, 0.6, 0.1, 1.0])
    keep.append(pbr)
    keep.append(runner.plane(pbr, m3.rotation_x(-np.pi / 2) @ m3.scale(3.0)))
    glass = runner.renderer.add_material(FlatBlendMaterial([0.9, 0.02, 0.02, 0.5]))
    keep.append(glass)
    from rend3_tpu.types import Object, StaticMeshKind

    pane = _facing_quad(runner.renderer, 0.5, 0.8)
    keep += [pane, runner.renderer.add_object(Object(
        mesh_kind=StaticMeshKind(pane), material=glass,
        transform=m3.translation([0.0, 0.5, 0.0])))]
    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([4.0, 4.0, 8.0], np.float32)),
            view=m3.look_at_lh([0.0, 0.5, -2.0], [0.0, 0.5, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    runner.base_graph.register_routine(
        MaterialRoutine(FlatBlendMaterial, shade=unlit_routine(FlatMaterial).shade,
                        transparency="blend")
    )
    img = runner.render_frame(FrameRenderSettings(size=128))
    f = img.astype(np.float32) / 255.0
    # The half-alpha red pane over the dark background must produce reddish
    # pixels that are NOT fully saturated (blended, not overwritten).
    reddish = (f[..., 0] > 0.25) & (f[..., 0] < 0.95) & (f[..., 1] < f[..., 0])
    assert reddish.sum() > 200, f"blend routine pane missing ({reddish.sum()} px)"
    del keep


def test_registered_cutout_routine_discards():
    """A registered cutout-mode routine's objects alpha-test through the
    depth-peel loop via the routine's alpha callback (ref depth.wgsl
    discard built per archetype)."""
    runner = TestRunner()
    keep = [runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32))]
    pbr = runner.add_lit_material([0.1, 0.6, 0.1, 1.0])
    keep.append(pbr)
    keep.append(runner.plane(pbr, m3.rotation_x(-np.pi / 2) @ m3.scale(3.0)))
    cut = runner.renderer.add_material(FlatMaterial([0.9, 0.02, 0.02, 1.0]))
    keep.append(cut)
    from rend3_tpu.types import Object, StaticMeshKind

    pane = _facing_quad(runner.renderer, 0.5, 0.8)
    keep += [pane, runner.renderer.add_object(Object(
        mesh_kind=StaticMeshKind(pane), material=cut,
        transform=m3.translation([0.0, 0.5, 0.0])))]
    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([4.0, 4.0, 8.0], np.float32)),
            view=m3.look_at_lh([0.0, 0.5, -2.0], [0.0, 0.5, 0.0], [0.0, 1.0, 0.0]),
        )
    )

    # Alpha callback: discard where view-space x is on the left half.
    def alpha(pixels, mdata, mflags):
        return (pixels.view_pos[:, 0] > 0.0).astype(np.float32)

    runner.base_graph.register_routine(
        MaterialRoutine(FlatMaterial, shade=unlit_routine(FlatMaterial).shade,
                        transparency="cutout", alpha=alpha, alpha_cutoff=0.5)
    )
    img = runner.render_frame(FrameRenderSettings(size=128))
    f = img.astype(np.float32) / 255.0
    red = (f[..., 0] > 0.6) & (f[..., 1] < 0.3) & (f[..., 2] < 0.3)
    # Exactly one side of the pane survives the alpha test.
    left = red[:, :64].sum()
    right = red[:, 64:].sum()
    assert red.sum() > 100, f"cutout routine pane missing ({red.sum()} px)"
    assert min(left, right) == 0 and max(left, right) > 100, (left, right)
    del keep


def test_injected_device_pass_runs_inside_frame():
    """register_pass injects a device pass into the jitted frame (the
    reference graph's arbitrary-node seam, rend3/src/graph/node.rs:59-213):
    an on-device overlay tints a corner of the final image."""
    import jax.numpy as jnp

    runner = TestRunner()
    keep = _scene(runner)
    runner.base_graph.register_routine(unlit_routine(FlatMaterial))

    def corner_tint(img, gbuf, uniforms):
        patch = jnp.full((16, 16, 4), 255, jnp.uint8)
        return img.at[:16, :16].set(patch)

    runner.base_graph.register_pass(corner_tint)
    img = runner.render_frame(FrameRenderSettings(size=128))
    assert (img[:16, :16] == 255).all(), "injected pass did not run"
    assert not (img[32:, 32:] == 255).all()
    del keep

def test_injected_hdr_pass_runs_pre_tonemap():
    """stage='hdr' passes see the RESOLVED LINEAR image before the sRGB
    OETF (VERDICT r4 next-round #9 — tone-dependent effects need the HDR
    seam): writing a known linear value through the hook must come out as
    exactly hdr_to_srgb_u8 of that value, which a post-tonemap pass cannot
    produce (the OETF is non-linear)."""
    import jax.numpy as jnp

    from rend3_tpu.ops import blit as blit_ops

    runner = TestRunner()
    keep = _scene(runner)
    runner.base_graph.register_routine(unlit_routine(FlatMaterial))

    def hdr_patch(img, gbuf, uniforms):
        patch = jnp.full((16, 16, img.shape[-1]), 0.5, img.dtype)
        return img.at[:16, :16].set(patch)

    runner.base_graph.register_pass(hdr_patch, stage="hdr")
    img = runner.render_frame(FrameRenderSettings(size=128))
    want = np.asarray(
        blit_ops.hdr_to_srgb_u8(jnp.full((1, 1, 4), 0.5, jnp.float32))
    )[0, 0]
    np.testing.assert_array_equal(img[:16, :16], np.broadcast_to(want, (16, 16, 4)))
    assert not (img[32:, 32:, :3] == want[:3]).all()
    del keep
