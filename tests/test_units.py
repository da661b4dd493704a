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


def test_texture_from_texture_mip_view():
    """reference: rend3/src/renderer/mod.rs:203 + managers/texture.rs:198-242."""
    import numpy as np
    from rend3_tpu.core.renderer import Renderer
    from rend3_tpu.types import Handedness, MipmapCount, Texture, TextureFormat
    from rend3_tpu.types.texture import TextureFromTexture

    r = Renderer(handedness=Handedness.LEFT)
    img = (np.random.default_rng(0).uniform(0, 255, (16, 16, 4))).astype(np.uint8)
    src = r.add_texture_2d(
        Texture(label="src", data=img, format=TextureFormat.RGBA8_UNORM, mip_count=MipmapCount.MAXIMUM)
    )
    view = r.add_texture_2d_from_texture(
        TextureFromTexture(label="v", src=src, start_mip=1, mip_count=2)
    )
    r.swap_instruction_buffers()
    r.evaluate_instructions()
    src_t = r.d2_texture_manager.data[src.idx]
    view_t = r.d2_texture_manager.data[view.idx]
    assert len(src_t.mips) == 5
    assert len(view_t.mips) == 2
    np.testing.assert_array_equal(view_t.mips[0], src_t.mips[1])
    np.testing.assert_array_equal(view_t.mips[1], src_t.mips[2])


def test_set_skeleton_joint_transforms_composes_inverse_bind():
    """reference: rend3/src/renderer/mod.rs:314-323."""
    import numpy as np
    from rend3_tpu.core.renderer import Renderer
    from rend3_tpu.types import Handedness, Mesh, MeshBuilder, Skeleton

    r = Renderer(handedness=Handedness.LEFT)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    mesh = (
        MeshBuilder(verts, Handedness.LEFT)
        .with_indices(np.array([0, 1, 2], np.uint32))
        .with_vertex_joint_indices(np.zeros((3, 4), np.uint16))
        .with_vertex_joint_weights(np.array([[1, 0, 0, 0]] * 3, np.float32))
        .build()
    )
    mh = r.add_mesh(mesh)
    sk = r.add_skeleton(Skeleton(joint_matrices=[np.eye(4)], mesh=mh))
    g = np.eye(4); g[0, 3] = 2.0
    ib = np.eye(4); ib[1, 3] = -1.0
    r.set_skeleton_joint_transforms(sk, [g], [ib])
    r.swap_instruction_buffers()
    r.evaluate_instructions()
    got = r.skeleton_manager.data[sk.idx].joint_matrices[0]
    np.testing.assert_allclose(got, g @ ib, atol=1e-6)


def test_cube_texture_mip_chain():
    import numpy as np
    from rend3_tpu.core.managers.texture import TextureManager
    from rend3_tpu.types import MipmapCount, Texture, TextureFormat

    m = TextureManager(kind="cube")
    data = np.random.default_rng(1).uniform(0, 1, (6, 8, 8, 4)).astype(np.float32)
    m.add(0, Texture(label="c", data=data, format=TextureFormat.RGBA32_FLOAT, mip_count=MipmapCount.MAXIMUM))
    t = m.data[0]
    assert len(t.mips) == 4
    assert t.mips[1].shape == (6, 4, 4, 4)
    np.testing.assert_allclose(
        t.mips[1][2], data[2].reshape(4, 2, 4, 2, 4).mean(axis=(1, 3)), atol=1e-6
    )


def test_flip_metric_sanity():
    """FLIP perceptual metric (utils/flip.py; reference harness uses nv-flip,
    rend3-test/src/runner.rs:244)."""
    import numpy as np
    from rend3_tpu.utils.flip import flip, flip_mean

    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    assert flip_mean(img, img) < 1e-6
    # small perturbation -> small error; gross difference -> larger error
    small = np.clip(img.astype(int) + rng.integers(-6, 7, img.shape), 0, 255).astype(np.uint8)
    gross = (255 - img).astype(np.uint8)
    e_small = flip_mean(img, small)
    e_gross = flip_mean(img, gross)
    assert 0.0 < e_small < e_gross <= 1.0
    m = flip(img, gross)
    assert m.shape == (64, 64) and m.min() >= 0.0 and m.max() <= 1.0


def test_multiple_material_archetypes_per_frame():
    """Archetype-generic storage (reference material.rs:78-101): objects of
    an archetype with no installed routine are skipped, not an error."""
    import numpy as np
    from rend3_tpu.testing import FrameRenderSettings, TestRunner
    from rend3_tpu.types import Camera, Orthographic
    from rend3_tpu.utils import math as m3
    from rend3_tpu.types.material import Sorting
    from rend3_tpu.types.attribute import POSITION

    class FlatMaterial:
        @classmethod
        def required_attributes(cls):
            return [POSITION]

        @classmethod
        def supported_attributes(cls):
            return [POSITION]

        @classmethod
        def data_size(cls):
            return 4

        @classmethod
        def texture_count(cls):
            return 1

        def key(self):
            return 0

        def sorting(self):
            return Sorting.opaque()

        def to_textures(self):
            return [None]

        def to_data(self):
            return np.zeros(4, np.float32)

        def to_flags(self):
            return 0

    runner = TestRunner()
    pbr_mat = runner.add_lit_material([0.9, 0.2, 0.2, 1.0])
    flat = runner.renderer.add_material(FlatMaterial())
    keep = [
        runner.plane(pbr_mat, m3.translation([-0.5, 0.0, 1.0]) @ m3.rotation_y(np.pi) @ m3.scale(0.4)),
        runner.plane(flat, m3.translation([0.5, 0.0, 1.0]) @ m3.rotation_y(np.pi) @ m3.scale(0.4)),
        runner.add_directional_light(np.array([0.0, 0.0, 1.0], np.float32)),
    ]
    runner.set_camera_data(
        Camera(
            projection=Orthographic(size=np.array([2.0, 2.0, 8.0], np.float32)),
            view=m3.look_at_lh([0.0, 0.0, -2.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        )
    )
    img = runner.render_frame(FrameRenderSettings(size=64))
    left = img[:, :32, 0]
    right = img[:, 32:, 0]
    assert (left > 30).any(), "PBR-archetype object must render"
    assert not (right > 30).any(), "routine-less archetype object must be skipped"
    del keep


def test_incremental_atlas_adds_and_removes():
    """Texture adds scatter into the resident atlas instead of a full
    rebuild (reference: managers/texture.rs slot updates)."""
    import numpy as np
    from rend3_tpu.core.managers.texture import TextureManager
    from rend3_tpu.ops import texture as tex_ops
    from rend3_tpu.types import MipmapCount, Texture, TextureFormat

    rng = np.random.default_rng(5)
    m = TextureManager(kind="d2")

    def tex(i):
        return Texture(label=str(i), data=(rng.uniform(0, 255, (16, 16, 4))).astype(np.uint8),
                       format=TextureFormat.RGBA8_UNORM, mip_count=1)

    m.add(0, tex(0))
    dev1 = m.evaluate()
    m.add(1, tex(1))
    m.add(2, tex(2))
    dev2 = m.evaluate()
    # all three textures sample back their own texel values
    for idx in (0, 1, 2):
        r = np.asarray(dev2.rects)[idx + 1, 0]
        x, y, w, h = map(int, r)
        got = np.asarray(dev2.atlas)[y : y + h, x : x + w]
        np.testing.assert_allclose(got, m.data[idx].mips[0], atol=1e-6)
    # slot 0's rect did not move (no repack happened)
    np.testing.assert_array_equal(np.asarray(dev1.rects)[1, 0], np.asarray(dev2.rects)[1, 0])

    m.remove(1)
    dev3 = m.evaluate()
    assert np.asarray(dev3.rects)[2, 0].max() == 0.0  # cleared
    assert int(np.asarray(dev3.mip_counts)[2]) == 0


def test_mesh_sparse_range_update():
    """write_range scatters only the dirty slots into the device arenas
    (reference: util/scatter_copy.rs)."""
    import numpy as np
    from rend3_tpu.core.managers.mesh import MeshManager
    from rend3_tpu.types import Handedness, MeshBuilder

    mm = MeshManager()
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    mesh = (
        MeshBuilder(v, Handedness.LEFT).with_indices(np.array([0, 1, 2], np.uint32)).build()
    )
    mm.add(0, mesh)
    geo1 = mm.evaluate()
    start, count = mm.data[0].attr_ranges["position"]
    new_pos = np.array([[5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
    mm.write_range("position", start, new_pos)
    geo2 = mm.evaluate()
    np.testing.assert_allclose(np.asarray(geo2.position)[start : start + 3], new_pos, atol=0)
    # untouched arenas are the SAME device buffers (no re-upload)
    assert geo2.normal is geo1.normal


def test_bc_and_container_decode():
    """KTX2/DDS parse + BC1/BC3/BC5 decode (rend3-gltf/src/lib.rs:1185-1627)."""
    import struct
    import numpy as np
    from rend3_tpu.gltf.compressed import decode_bc, decode_dds, decode_ktx2

    # BC1 solid-color block: c0=c1=red565, all indices 0
    red565 = (31 << 11)
    blk = struct.pack("<HHI", red565, red565, 0)
    img = decode_bc("bc1", blk, 4, 4)
    assert img.shape == (4, 4, 4)
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0, 255])

    # BC3: full alpha (a0=255 > a1=0, indices 0), green color block
    g565 = 63 << 5
    blk3 = bytes([255, 0, 0, 0, 0, 0, 0, 0]) + struct.pack("<HHI", g565, g565, 0)
    img3 = decode_bc("bc3", blk3, 4, 4)
    np.testing.assert_array_equal(img3[2, 2], [0, 255, 0, 255])

    # BC5 two-channel
    blk5 = bytes([200, 0, 0, 0, 0, 0, 0, 0]) + bytes([100, 0, 0, 0, 0, 0, 0, 0])
    img5 = decode_bc("bc5", blk5, 4, 4)
    np.testing.assert_array_equal(img5[1, 1], [200, 100, 0, 255])

    # KTX2 container around an uncompressed RGBA8 4x4
    payload = np.arange(4 * 4 * 4, dtype=np.uint8).tobytes()
    hdr = b"\xabKTX 20\xbb\r\n\x1a\n" + struct.pack(
        "<9I", 37, 1, 4, 4, 0, 0, 1, 1, 0
    ) + b"\x00" * (80 - 12 - 36)
    lvl = struct.pack("<3Q", 128, len(payload), len(payload))
    data = hdr + lvl + b"\x00" * (128 - len(hdr) - len(lvl)) + payload
    img_k, srgb = decode_ktx2(data)
    assert not srgb and img_k.shape == (4, 4, 4)
    np.testing.assert_array_equal(img_k.reshape(-1), np.arange(64, dtype=np.uint8))

    # DDS DXT1 container
    dds = b"DDS " + b"\x00" * 8 + struct.pack("<2I", 4, 4) + b"\x00" * 64 + b"DXT1" + b"\x00" * 40 + blk
    img_d, _ = decode_dds(dds)
    np.testing.assert_array_equal(img_d[3, 3], [255, 0, 0, 255])

def test_bc7_bc6h_decode():
    """BC7 / BC6H decode + Zstd-supercompressed KTX2 (rend3-gltf maps these
    formats at lib.rs:1185-1627; real Bistro-class ktx2 assets use BC7).

    The BC7 vector is a hand-packed mode-5 block (6 mode bits, rotation 0,
    equal 7-bit RGB endpoints + equal 8-bit alpha endpoints, all indices 0)
    whose exact decode is endpoint dequantization: v8 = (v7<<1)|(v7>>6)."""
    import struct
    import numpy as np
    from rend3_tpu.gltf.compressed import decode_bc, decode_ktx2

    def pack_bits(fields):
        """fields: list of (value, nbits) packed LSB-first into 16 bytes."""
        v = 0
        off = 0
        for val, n in fields:
            v |= (val & ((1 << n) - 1)) << off
            off += n
        assert off <= 128
        return v.to_bytes(16, "little")

    blk7 = pack_bits([
        (0b100000, 6),   # mode 5 (bit index 5 set)
        (0, 2),          # rotation
        (0x7F, 7), (0x7F, 7),   # R0, R1
        (0x40, 7), (0x40, 7),   # G0, G1
        (0x00, 7), (0x00, 7),   # B0, B1
        (0xAA, 8), (0xAA, 8),   # A0, A1
        # color (31) + alpha (31) index bits: all zero
    ])
    img7 = decode_bc("bc7", blk7, 4, 4)
    assert img7.shape == (4, 4, 4)
    expected = [0xFF, (0x40 << 1) | (0x40 >> 6), 0, 0xAA]
    np.testing.assert_array_equal(img7, np.broadcast_to(expected, (4, 4, 4)))

    # BC6H mode 11 (5-bit mode code 00011): 10-bit endpoints, no delta.
    # E0=E1=0x3FF unquantizes to 0xFFFF -> half 0x7BFF (65504.0) -> LDR white.
    blk6 = pack_bits([
        (0b00011, 5),
        (0x3FF, 10), (0x3FF, 10), (0x3FF, 10),  # R0 G0 B0
        (0x3FF, 10), (0x3FF, 10), (0x3FF, 10),  # R1 G1 B1
    ])
    img6 = decode_bc("bc6h", blk6, 4, 4)
    np.testing.assert_array_equal(img6, np.broadcast_to([255, 255, 255, 255], (4, 4, 4)))
    img6z = decode_bc("bc6h", pack_bits([(0b00011, 5)]), 4, 4)
    np.testing.assert_array_equal(img6z[..., :3], np.zeros((4, 4, 3), np.uint8))

    # Zstd-supercompressed KTX2 wrapping the BC7 block (vkFormat 145).
    import zstandard

    comp = zstandard.ZstdCompressor().compress(blk7)
    hdr = b"\xabKTX 20\xbb\r\n\x1a\n" + struct.pack(
        "<9I", 145, 1, 4, 4, 0, 0, 1, 1, 2
    ) + b"\x00" * (80 - 12 - 36)
    lvl = struct.pack("<3Q", 128, len(comp), len(blk7))
    data = hdr + lvl + b"\x00" * (128 - 80 - len(lvl)) + comp
    img_k, srgb = decode_ktx2(data)
    assert not srgb
    np.testing.assert_array_equal(img_k, img7)


def test_sample_cube_grid_matches_scalar_sampler():
    """The MXU skybox path (texture.sample_cube_grid over the padded face
    grid) must reproduce sample_cube's clamped bilinear fetches; lerp
    summation order may differ by float rounding only."""
    from rend3_tpu.ops import texture as tex_ops

    rng = np.random.default_rng(3)

    class _Tex:
        def __init__(self, mip):
            self.mips = [mip]

    e = 16
    cube = tex_ops.build_cube_array(
        {0: _Tex(rng.random((6, e, e, 4)).astype(np.float32))}
    )
    # Directions covering all faces, edges and corners.
    dirs = rng.normal(size=(2048, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs_j = jnp.asarray(dirs.reshape(-1, 3))

    want = np.asarray(tex_ops.sample_cube(cube, 1, dirs_j))
    # 2048 = (32, 64)? needs W % 128 == 0 and H % 32 == 0 -> use (32, 128).
    dirs_pad = jnp.concatenate(
        [dirs_j, jnp.broadcast_to(dirs_j[:1], (4096 - 2048, 3))], axis=0
    )
    got_list, _ovf, _q = tex_ops.sample_cube_grid(
        cube, 1, [dirs_pad], (32, 128), None, interpret=True
    )
    got = np.asarray(got_list[0])[:2048]
    # The grid store is bf16-at-rest in production (TEX_DOT_DTYPE, same as
    # the 2D atlas) — tolerance follows the dot dtype like test_mxu_gather.
    tol = 1e-5 if tex_ops.TEX_DOT_DTYPE == jnp.float32 else 6e-3
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
