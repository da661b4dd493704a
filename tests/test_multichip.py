"""Multi-chip screen-tile sharding tests (rend3_tpu/parallel/tiles.py).

Runs on the 8 virtual CPU devices created by conftest.py. Validates that the
shard_map frame program (row-sharded image, replicated scene, psum shadow
exchange) produces the same image regardless of device count, and matches the
single-chip frame program.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _render_tiled(n_devices: int) -> np.ndarray:
    import __graft_entry__ as g
    from rend3_tpu.parallel.tiles import device_mesh, make_tiled_frame_program
    from rend3_tpu.routine.base import BaseRenderGraphSettings, FrameRenderTarget
    from rend3_tpu.types import Handedness

    runner = g._build_scene(64)
    r = runner.renderer
    r.swap_instruction_buffers()
    eval_output = r.evaluate_instructions()
    _, args = runner.base_graph.build_frame_callable(
        eval_output, FrameRenderTarget(64, 64, 1), BaseRenderGraphSettings()
    )
    (
        geo, tri_vlocal, tri_obj, _bv, _bo, transforms, visible, _sv, bases,
        material_slots, mat_data, mat_flags, mat_tex, dir_lights, point_lights,
        uniforms, view, proj, _clear, _tex, _cube, _sky, _pmask,
    ) = args

    mesh = device_mesh(n_devices)
    program = make_tiled_frame_program(
        mesh, 64, 64, samples=1,
        front_cw=r.handedness == Handedness.LEFT,
        shadow_plan=eval_output.shadow_plan,
        atlas_extent=eval_output.shadow_atlas_extent,
    )
    img = program(
        geo.position, geo.normal, geo.tangent, geo.uv0, geo.uv1, geo.color0,
        tri_vlocal, tri_obj, transforms, visible, bases, material_slots,
        (mat_data, mat_flags, mat_tex), (dir_lights, point_lights),
        (view, proj, uniforms),
    )
    return np.asarray(jax.device_get(img))


@pytest.mark.multichip
def test_tiled_matches_single_device():
    """8-device sharded render is bit-identical to the 1-device render of the
    same program: the row sharding + psum shadow exchange must be lossless."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    img8 = _render_tiled(8)
    img1 = _render_tiled(1)
    assert img8.shape == (64, 64, 4)
    assert img8[..., :3].max() > 0, "empty render"
    np.testing.assert_array_equal(img8, img1)


@pytest.mark.multichip
def test_tiled_matches_single_chip_frame_program():
    """Sharded render matches the full single-chip frame program (same scene)
    to high structural similarity — the paths differ only in raster backend."""
    import __graft_entry__ as g
    from rend3_tpu.testing import FrameRenderSettings
    from rend3_tpu.utils.compare import compare_images

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    img8 = _render_tiled(8)

    runner = g._build_scene(64)
    single = runner.render_frame(FrameRenderSettings(size=64))
    stats = compare_images(img8[..., :3], single[..., :3])
    assert stats["ssim"] >= 0.98, stats
    assert stats["mae"] <= 0.02, stats
