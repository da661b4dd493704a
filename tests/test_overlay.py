"""2D overlay (egui-equivalent) routine: ordered alpha compositing of
screen-space UI meshes. Reference: rend3-egui/src/lib.rs:16-175."""

import numpy as np

from rend3_tpu.overlay import OverlayRoutine, PaintJob


def _frame(h=64, w=128, val=40):
    return np.full((h, w, 3), val, np.uint8)


def test_overlay_solid_triangle_and_order():
    o = OverlayRoutine()
    # opaque red triangle then half-transparent blue quad over part of it
    red = PaintJob(
        vertices=np.array([[8, 8], [40, 8], [8, 40]], np.float32),
        colors=np.tile(np.array([255, 0, 0, 255], np.uint8), (3, 1)),
        indices=np.array([[0, 1, 2]], np.uint32),
    )
    blue = PaintJob(
        vertices=np.array([[8, 8], [24, 8], [24, 24], [8, 24]], np.float32),
        colors=np.tile(np.array([0, 0, 255, 128], np.uint8), (4, 1)),
        indices=np.array([[0, 1, 2], [2, 3, 0]], np.uint32),
    )
    out = o.render(_frame(), [red, blue])
    assert out.shape == (64, 128, 3)
    # deep inside the red tri but outside the quad
    np.testing.assert_array_equal(out[30, 10], [255, 0, 0])
    # inside both: blue over red at ~0.5 alpha
    px = out[12, 12].astype(int)
    a = 128 / 255
    want = np.array([255 * (1 - a), 0, 255 * a])
    assert np.abs(px - want).max() <= 2, (px, want)
    # untouched background
    np.testing.assert_array_equal(out[60, 120], [40, 40, 40])


def test_overlay_textured_quad_and_clip():
    o = OverlayRoutine()
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[:, :4] = [0, 255, 0, 255]     # left half green
    tex[:, 4:] = [255, 255, 0, 255]   # right half yellow
    tid = o.add_texture(tex)
    quad = PaintJob(
        vertices=np.array([[16, 16], [48, 16], [48, 48], [16, 48]], np.float32),
        colors=np.tile(np.array([255, 255, 255, 255], np.uint8), (4, 1)),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        indices=np.array([[0, 1, 2], [2, 3, 0]], np.uint32),
        texture=tid,
        clip_rect=(16, 16, 48, 40),
    )
    out = o.render(_frame(), [quad])
    np.testing.assert_array_equal(out[20, 20], [0, 255, 0])     # left half
    np.testing.assert_array_equal(out[20, 44], [255, 255, 0])   # right half
    np.testing.assert_array_equal(out[44, 20], [40, 40, 40])    # clipped away


def test_overlay_large_panel_full_image_path():
    o = OverlayRoutine()
    panel = PaintJob(
        vertices=np.array([[0, 0], [128, 0], [128, 64], [0, 64]], np.float32),
        colors=np.tile(np.array([10, 20, 30, 255], np.uint8), (4, 1)),
        indices=np.array([[0, 1, 2], [2, 3, 0]], np.uint32),
    )
    out = o.render(_frame(), [panel])
    np.testing.assert_array_equal(out[32, 64], [10, 20, 30])
    np.testing.assert_array_equal(out[0, 0], [10, 20, 30])

def test_device_pass_matches_host_compositor():
    """The baked on-device overlay (bake -> P + (1-A)*dst, composited
    INSIDE the frame program via register_pass) must reproduce the host
    compositor's result: premultiplied-over algebra makes the flattened
    form exact up to one extra float rounding (VERDICT r4 next-round #8;
    reference draws egui in the renderpass, rend3-egui/src/lib.rs:52-94)."""
    import jax.numpy as jnp

    o = OverlayRoutine()
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[:, :4] = [0, 255, 0, 200]
    tex[:, 4:] = [255, 255, 0, 90]
    tid = o.add_texture(tex)
    jobs = [
        PaintJob(  # translucent panel
            vertices=np.array([[4, 4], [100, 4], [100, 60], [4, 60]], np.float32),
            colors=np.tile(np.array([30, 30, 40, 180], np.uint8), (4, 1)),
            indices=np.array([[0, 1, 2], [2, 3, 0]], np.uint32),
        ),
        PaintJob(  # textured, semi-transparent, over the panel
            vertices=np.array([[16, 8], [80, 8], [80, 40], [16, 40]], np.float32),
            colors=np.tile(np.array([255, 200, 255, 255], np.uint8), (4, 1)),
            uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
            indices=np.array([[0, 1, 2], [2, 3, 0]], np.uint32),
            texture=tid,
        ),
    ]
    rng = np.random.default_rng(11)
    frame = rng.integers(0, 255, size=(64, 128, 4), dtype=np.uint8)
    want = o.render(frame[..., :3], jobs)

    dev = o.device_pass(jobs, 128, 64)
    got = np.asarray(dev(jnp.asarray(frame), None, None, jnp.int32(0)))
    assert got.shape == (64, 128, 4)
    np.testing.assert_array_equal(got[..., 3], frame[..., 3])
    diff = got[..., :3].astype(int) - want.astype(int)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()

    # Band form: rows [32:64) composited with row0=32 must equal the same
    # rows of the full composite (multi-chip bands are offset slices).
    got_band = np.asarray(dev(jnp.asarray(frame[32:]), None, None, jnp.int32(32)))
    np.testing.assert_array_equal(got_band, got[32:])
