"""Cutout (alpha-test) rendering via the deferred depth-peel loop.

Reference: rend3-routine/shaders/src/depth.wgsl:105-124 (templated discard)
and opaque.wgsl:231 — fragments of a CUTOUT-transparency material whose
albedo alpha is below the cutoff are discarded, revealing whatever is
behind them.
"""

import numpy as np
import pytest

from rend3_tpu.routine.pbr.material import AlbedoComponent, PbrMaterial, SampleType, Transparency
from rend3_tpu.testing import FrameRenderSettings, TestRunner
from rend3_tpu.types import (
    Camera,
    Handedness,
    MeshBuilder,
    MipmapCount,
    Object,
    Orthographic,
    StaticMeshKind,
    Texture,
    TextureFormat,
)
from rend3_tpu.utils import math as m3

SIZE = 64  # render target and texture edge (1:1 texel:pixel)


def _quad(r, z, s=1.0):
    # this winding faces the camera at -z; +z = farther (ortho along +z)
    v = np.array(
        [[-s, s, z], [s, s, z], [s, -s, z], [-s, -s, z]], np.float32
    )
    mesh = (
        MeshBuilder(v, Handedness.LEFT)
        .with_vertex_uv0(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
        .with_indices(np.array([0, 1, 2, 2, 3, 0], np.uint32))
        .build()
    )
    return r.add_mesh(mesh)


def _alpha_tex(r, alpha_mask, rgb):
    """RGBA8 texture: rgb everywhere, alpha 255 where alpha_mask else 0."""
    img = np.zeros((SIZE, SIZE, 4), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = rgb
    img[..., 3] = np.where(alpha_mask, 255, 0)
    return r.add_texture_2d(
        Texture(label="a", data=img, format=TextureFormat.RGBA8_UNORM_SRGB, mip_count=MipmapCount.ONE)
    )


def _cutout_mat(r, tex):
    return r.add_material(
        PbrMaterial(
            albedo=AlbedoComponent.new_texture(tex),
            unlit=True,
            sample_type=SampleType.NEAREST,
            transparency=Transparency.cutout_at(0.5),
        )
    )


def _scene(runner, layers):
    """layers: list of (z, alpha_mask or None, rgb). None mask = opaque."""
    r = runner.renderer
    keep = []
    for z, mask, rgb in layers:
        mesh = _quad(r, z)
        if mask is None:
            img = np.zeros((SIZE, SIZE, 4), np.uint8)
            img[..., 0], img[..., 1], img[..., 2] = rgb
            img[..., 3] = 255
            tex = r.add_texture_2d(
                Texture(label="o", data=img, format=TextureFormat.RGBA8_UNORM_SRGB, mip_count=MipmapCount.ONE)
            )
            mat = r.add_material(
                PbrMaterial(albedo=AlbedoComponent.new_texture(tex), unlit=True, sample_type=SampleType.NEAREST)
            )
        else:
            tex = _alpha_tex(r, mask, rgb)
            mat = _cutout_mat(r, tex)
        keep.append((mesh, mat))
        keep.append(
            r.add_object(
                Object(mesh_kind=StaticMeshKind(mesh), material=mat, transform=np.eye(4, dtype=np.float32))
            )
        )
    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([2.0, 2.0, 8.0], np.float32)),
            view=m3.look_at_lh([0.0, 0.0, -2.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    return keep


def _checker(block=8, phase=0):
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    return ((xx // block + yy // block + phase) % 2) == 0


def _render(layers):
    runner = TestRunner()
    keep = _scene(runner, layers)
    img = runner.render_frame(FrameRenderSettings(size=SIZE))
    del keep
    return img


RED = (255, 40, 40)
GREEN = (40, 255, 40)
BLUE = (40, 40, 255)


def test_cutout_full_discard_and_full_keep():
    bg_only = _render([(1.0, None, GREEN)])
    assert (bg_only[..., 1] > 30).any()  # the scene must actually render
    all_out = _render([(0.5, np.zeros((SIZE, SIZE), bool), RED), (1.0, None, GREEN)])
    np.testing.assert_array_equal(all_out, bg_only)

    opaque = _render([(0.5, None, RED), (1.0, None, GREEN)])
    all_in = _render([(0.5, np.ones((SIZE, SIZE), bool), RED), (1.0, None, GREEN)])
    np.testing.assert_array_equal(all_in, opaque)


def test_cutout_checker_composites_background():
    c = _checker()
    got = _render([(0.5, c, RED), (1.0, None, GREEN)])
    quad = _render([(0.5, None, RED), (1.0, None, GREEN)])
    bg = _render([(1.0, None, GREEN)])
    assert (bg[..., 1] > 30).any() and (quad[..., 0] > 30).any()  # non-vacuous
    want = np.where(c[..., None], quad, bg)
    np.testing.assert_array_equal(got, want)


def test_cutout_two_stacked_layers_peel():
    c0 = _checker(phase=0)
    c1 = _checker(phase=1)
    got = _render([(0.4, c0, RED), (0.7, c1, BLUE), (1.0, None, GREEN)])
    red = _render([(0.4, None, RED), (1.0, None, GREEN)])
    blue = _render([(0.7, None, BLUE), (1.0, None, GREEN)])
    bg = _render([(1.0, None, GREEN)])
    assert (red[..., 0] > 30).any() and (blue[..., 2] > 30).any()  # non-vacuous
    want = np.where(c0[..., None], red, np.where(c1[..., None], blue, bg))
    np.testing.assert_array_equal(got, want)
