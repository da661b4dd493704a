"""Unit tests for host-side subsystems (reference analogs: shadow_alloc.rs
quadtree tests, buffer.rs resize tests, shader.rs preprocessor tests)."""

import numpy as np
import jax.numpy as jnp

from rend3_tpu.core.managers.alloc import HandleAllocator, RangeAllocator
from rend3_tpu.core.managers.directional import allocate_shadow_atlas
from rend3_tpu.ops.geometry import _compact, _compact_rows
from rend3_tpu.utils.math import BoundingSphere, Frustum, perspective_infinite_reverse_lh
from rend3_tpu.types import Camera, Handedness, MeshBuilder


def test_shadow_atlas_single():
    (dims, maps) = allocate_shadow_atlas([(0, 256)], 8192)
    assert dims == (256, 256)
    assert maps[0].offset == (0, 0) and maps[0].size == 256


def test_shadow_atlas_quadtree_packing():
    # One 512 + four 256 lights pack into 512x1024 or 1024x512 (second root).
    maps_in = [(0, 512), (1, 256), (2, 256), (3, 256), (4, 256)]
    (w, h), maps = allocate_shadow_atlas(maps_in, 8192)
    assert w * h >= 512 * 512 + 4 * 256 * 256
    # No overlaps:
    rects = [(m.offset[0], m.offset[1], m.size) for m in maps]
    for i, (x0, y0, s0) in enumerate(rects):
        assert x0 + s0 <= w and y0 + s0 <= h
        for j, (x1, y1, s1) in enumerate(rects):
            if i == j:
                continue
            assert x0 + s0 <= x1 or x1 + s1 <= x0 or y0 + s0 <= y1 or y1 + s1 <= y0
    assert len(maps) == 5


def test_shadow_atlas_multiple_roots():
    # Nine equal maps need three roots -> grid growth.
    (w, h), maps = allocate_shadow_atlas([(i, 128) for i in range(9)], 8192)
    assert len(maps) == 9
    assert w % 128 == 0 and h % 128 == 0


def test_range_allocator():
    ra = RangeAllocator(100)
    a = ra.allocate(40)
    b = ra.allocate(40)
    assert ra.allocate(40) is None
    ra.free(a, 40)
    c = ra.allocate(30)
    assert c == 0
    ra.grow(200)
    assert ra.allocate(100) is not None
    assert ra.used() == 170


def test_native_range_allocator_matches():
    from rend3_tpu.native import NativeRangeAllocator

    ra = NativeRangeAllocator(100)
    a = ra.allocate(40)
    b = ra.allocate(40)
    assert ra.allocate(40) is None
    ra.free(a, 40)
    assert ra.allocate(30) == 0
    ra.grow(200)
    assert ra.allocate(100) is not None
    assert ra.used() == 170


def test_handle_allocator_delayed_reclaim():
    ha = HandleAllocator("object", delayed_reclaim=True)
    a = ha.allocate()
    ha.deallocate(a)
    b = ha.allocate()
    assert b != a  # not reclaimed yet (one-frame delay)
    ha.reclaim()
    c = ha.allocate()
    assert c == a


def test_compact_matches_numpy():
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(1000) < 0.3)
    ids, count = _compact(mask, 512)
    ref = np.nonzero(np.asarray(mask))[0]
    assert int(count) == len(ref)
    np.testing.assert_array_equal(np.asarray(ids[: len(ref)]), ref)
    assert (np.asarray(ids[len(ref):]) == -1).all()


def test_compact_rows_matches_numpy():
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.random((7, 300)) < 0.2)
    ids, counts = _compact_rows(mask, 128)
    m = np.asarray(mask)
    for r in range(7):
        ref = np.nonzero(m[r])[0]
        assert int(counts[r]) == len(ref)
        np.testing.assert_array_equal(np.asarray(ids[r, : len(ref)]), ref)


def test_frustum_sphere():
    proj = perspective_infinite_reverse_lh(np.deg2rad(60.0), 1.0, 0.1)
    f = Frustum.from_matrix(proj)
    assert f.contains_sphere(BoundingSphere([0, 0, 5], 1.0))       # in front
    assert not f.contains_sphere(BoundingSphere([0, 0, -5], 1.0))  # behind
    assert not f.contains_sphere(BoundingSphere([50, 0, 5], 1.0))  # far left
    assert f.contains_sphere(BoundingSphere([0, 0, 0], 0.2))       # near-straddling


def test_mesh_builder_normals_handedness():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    m_l = MeshBuilder(pos.copy(), Handedness.LEFT).build()
    m_r = MeshBuilder(pos.copy(), Handedness.RIGHT).build()
    nl = m_l.attributes["normal"]
    nr = m_r.attributes["normal"]
    np.testing.assert_allclose(nl, -nr, atol=1e-6)
    np.testing.assert_allclose(np.abs(nl[0]), [0, 0, 1], atol=1e-6)


def test_mesh_validation():
    import pytest
    from rend3_tpu.types import MeshValidationError

    pos = np.zeros((3, 3), np.float32)
    with pytest.raises(MeshValidationError):
        MeshBuilder(pos, Handedness.LEFT).with_indices(np.array([0, 1, 5], np.uint32)).build()
    with pytest.raises(MeshValidationError):
        MeshBuilder(pos, Handedness.LEFT).with_indices(np.array([0, 1], np.uint32)).build()


def test_handle_drop_enqueues_delete():
    from rend3_tpu.core.renderer import Renderer
    from rend3_tpu.core.instruction import InstructionKind

    r = Renderer()
    mesh = MeshBuilder(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32), Handedness.LEFT).build()
    h = r.add_mesh(mesh)
    idx = h.idx
    clone = h.clone()
    del h
    r.swap_instruction_buffers()
    assert not any(i.kind == InstructionKind.DELETE_MESH for i in r.instructions.drain())
    del clone
    r.swap_instruction_buffers()
    drained = r.instructions.drain()
    assert any(i.kind == InstructionKind.DELETE_MESH and i.payload.idx == idx for i in drained)
