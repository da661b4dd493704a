"""Alpha-blended transparents: deferred depth-peel compositing vs the
forward sequential-scan oracle.

Reference: rend3-routine/src/forward.rs ALPHA_BLENDING pipeline +
batching.rs back-to-front distance sort. The deferred path composites
front-to-back with the under operator (exact per-pixel depth order); for
non-intersecting sorted layers it must match the ordered scan exactly.
"""

import os

import numpy as np

from rend3_tpu.routine.pbr.material import AlbedoComponent, PbrMaterial, Transparency
from rend3_tpu.testing import FrameRenderSettings, TestRunner
from rend3_tpu.types import Camera, Handedness, MeshBuilder, Object, Orthographic, StaticMeshKind
from rend3_tpu.utils import math as m3


def _quad(r, z, s):
    # this winding faces the camera at -z; +z = farther (ortho along +z)
    v = np.array([[-s, s, z], [s, s, z], [s, -s, z], [-s, -s, z]], np.float32)
    mesh = (
        MeshBuilder(v, Handedness.LEFT)
        .with_vertex_uv0(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
        .with_indices(np.array([0, 1, 2, 2, 3, 0], np.uint32))
        .build()
    )
    return r.add_mesh(mesh)


def _build(runner):
    r = runner.renderer
    keep = []
    layers = [
        (0.4, 1.0, (1.0, 0.1, 0.1, 0.5)),
        (0.6, 0.6, (0.1, 1.0, 0.1, 0.4)),
        (0.8, 0.35, (0.1, 0.1, 1.0, 0.7)),
    ]
    for z, s, rgba in layers:
        mesh = _quad(r, z, s)
        mat = r.add_material(
            PbrMaterial(
                albedo=AlbedoComponent.new_value(np.array(rgba, np.float32)),
                unlit=True,
                transparency=Transparency.blend(),
            )
        )
        keep.append((mesh, mat))
        keep.append(
            r.add_object(
                Object(mesh_kind=StaticMeshKind(mesh), material=mat, transform=np.eye(4, dtype=np.float32))
            )
        )
    # an opaque backstop behind everything, covering the lower half
    solid = r.add_material(
        PbrMaterial(albedo=AlbedoComponent.new_value(np.array([0.8, 0.8, 0.2, 1.0], np.float32)), unlit=True)
    )
    mesh = _quad(r, 0.95, 0.8)
    keep.append((mesh, solid))
    keep.append(
        r.add_object(
            Object(
                mesh_kind=StaticMeshKind(mesh),
                material=solid,
                transform=m3.translation([0.0, -0.8, 0.0]),
            )
        )
    )
    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([2.0, 2.0, 8.0], np.float32)),
            view=m3.look_at_lh([0.0, 0.0, -2.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    return keep


def _render(backend=None):
    old = os.environ.get("REND3_TPU_RASTER")
    try:
        if backend is not None:
            os.environ["REND3_TPU_RASTER"] = backend
        runner = TestRunner()
        keep = _build(runner)
        img = runner.render_frame(FrameRenderSettings(size=64))
        stats = runner.base_graph.last_stats
        del keep
        return img, stats
    finally:
        if old is None:
            os.environ.pop("REND3_TPU_RASTER", None)
        else:
            os.environ["REND3_TPU_RASTER"] = old


def test_blend_peeling_matches_scan_oracle():
    got, _ = _render()                 # deferred: depth-peeled compositing
    want, _ = _render("reference")     # forward: ordered full-image scan
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"
    # the scene must actually have visible blended content
    assert (got[:, :, 0] > 10).any() and (got[:, :, 2] > 10).any()


def test_sparse_blend_shading_matches_dense():
    """Sparse blend shading (compacted pseudo-image lighting + scatter-back,
    routine/base.py blend_px) must reproduce the dense full-resolution peel
    shading exactly: every downstream op is per-pixel and uv derivatives are
    gathered from the full-res image."""
    # Dense: default cap (65536) >= the 64x64 target's pixel count.
    dense, _ = _render()

    runner = TestRunner()
    keep = _build(runner)
    # Force the sparse path: cap below the 64x64 pixel count (4096 < 8192
    # after padding) but above the scene's real blend coverage.
    runner.base_graph._caps["blend_px"] = 4096
    sparse = runner.render_frame(FrameRenderSettings(size=64))
    assert runner.base_graph._caps["blend_px"] == 4096, (
        "cap grew past the pixel count: the sparse path was not exercised"
    )
    del keep
    assert np.array_equal(sparse, dense), (
        f"sparse blend shading diverged: max u8 diff "
        f"{np.abs(sparse.astype(int) - dense.astype(int)).max()}"
    )
