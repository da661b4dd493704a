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
