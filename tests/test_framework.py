"""Framework-layer tests: AssetLoader (assets.rs parity), first-person walk
controls (scene_viewer mod.rs camera parity), and the overlay hook in the
frame loop."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "examples")

from rend3_tpu.framework.assets import (
    AssetFileError,
    AssetLoader,
    AssetNetworkError,
    AssetPath,
)
from rend3_tpu.framework.camera import FirstPersonControls
from rend3_tpu.utils import math as m3


# -- AssetLoader (rend3-framework/src/assets.rs:23-64) -------------------------


def test_asset_loader_path_resolution(tmp_path):
    loader = AssetLoader(str(tmp_path))
    # Internal joins the base (assets.rs:31); External is verbatim (:32).
    assert loader.get_asset_path("a/b.bin") == os.path.join(str(tmp_path), "a/b.bin")
    assert loader.get_asset_path(AssetPath.external_("/abs/c.bin")) == "/abs/c.bin"
    url = AssetLoader("http://localhost:8000/resources/")
    assert url.get_asset_path("skybox.ktx2") == "http://localhost:8000/resources/skybox.ktx2"


def test_asset_loader_file_fetch(tmp_path):
    p = tmp_path / "scene.bin"
    p.write_bytes(b"\x01\x02\x03")
    loader = AssetLoader(str(tmp_path))
    assert loader.get_asset("scene.bin") == b"\x01\x02\x03"
    with pytest.raises(AssetFileError):
        loader.get_asset("missing.bin")


def test_asset_loader_data_uri_and_network_gate():
    loader = AssetLoader("")
    assert loader.get_asset(AssetPath.external_("data:application/octet-stream;base64,AQID")) == b"\x01\x02\x03"
    with pytest.raises(AssetNetworkError):
        loader.get_asset(AssetPath.external_("https://example.com/a.bin"))


# -- FirstPersonControls (examples/src/scene_viewer/mod.rs:545-643) ------------


def test_controls_view_matches_euler_composition():
    c = FirstPersonControls(location=np.array([1.0, 2.0, 3.0], np.float32), pitch=0.3, yaw=-0.7)
    expect = m3.rotation_x(-0.3) @ m3.rotation_y(0.7) @ m3.translation(np.array([-1.0, -2.0, -3.0], np.float32))
    np.testing.assert_allclose(c.view_matrix(), expect, atol=1e-6)


def test_controls_forward_motion_and_run():
    c = FirstPersonControls(location=np.zeros(3, np.float32), walk_speed=10.0, run_speed=50.0)
    c.key("w")
    c.update(0.1)
    # forward at pitch=yaw=0 is -Z row convention: rotation is identity, so
    # forward = -(+Z) ... mod.rs:596 forward = -rotation.z_axis.
    np.testing.assert_allclose(c.location, [0.0, 0.0, -1.0], atol=1e-6)
    c.key("shift")
    c.update(0.1)
    np.testing.assert_allclose(c.location, [0.0, 0.0, -6.0], atol=1e-5)


def test_controls_mouse_look_clamps_and_wraps():
    c = FirstPersonControls()
    c.mouse(0.0, -10000.0)  # pitch up beyond the clamp
    assert c.pitch == pytest.approx(math.pi / 2 - 1e-4)
    c.mouse(-1000.0 * math.tau + 500.0, 0.0)  # yaw wraps into [0, tau)
    assert 0.0 <= c.yaw < math.tau


def test_walk_script_steps_and_commands():
    c = FirstPersonControls(location=np.zeros(3, np.float32), walk_speed=6.0)
    steps = list(c.run_script("w,w,yaw:90,dt:0.5,w"))
    assert len(steps) == 3  # movement frames only; commands are free
    # Two forward steps at dt=1/60 along -Z, then a 90° yaw turn and one
    # dt=0.5 step along the rotated forward (-X for yaw=+90° in this euler).
    assert c.location[2] == pytest.approx(-2 * 6.0 / 60.0, abs=1e-5)
    assert c.location[0] == pytest.approx(-3.0, abs=1e-4)


# -- overlay hook in the frame loop -------------------------------------------


def test_framework_overlay_composites():
    from rend3_tpu import framework
    from rend3_tpu.overlay import PaintJob

    class App(framework.App):
        def clear_color(self):
            return (0.0, 0.0, 0.0, 1.0)

        def overlay_jobs(self, ctx):
            v = np.array([[2, 2], [30, 2], [30, 30], [2, 30]], np.float32)
            c = np.full((4, 4), 255, np.uint8)
            return [PaintJob(vertices=v, colors=c, indices=np.array([[0, 1, 2], [0, 2, 3]], np.uint32))]

    img = framework.render_single_frame(App(), 64, 64)
    assert img[10, 10, :3].min() == 255  # overlay quad drawn
    assert img[50, 50, :3].max() == 0    # outside stays clear color
