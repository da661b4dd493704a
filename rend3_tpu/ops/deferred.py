"""Fused raster + G-buffer resolve, and per-triangle attribute planes.

Per-pixel attribute gathers are catastrophically slow on TPU (~5 ms per
row-gather at 1080p, ~22 ms per scalar gather), so the visibility buffer is
never "looked up": instead every surviving triangle gets *screen-space
interpolation planes* for each vertex attribute (attr/w and 1/w are linear in
screen space), and one Pallas kernel per (32, 128) tile both rasterizes its
binned triangle list AND accumulates the winning triangle's plane
coefficients per pixel (selected with a tiny one-hot matmul on the MXU).
The output G-buffer is then lit by a purely elementwise pass
(ops/lighting.py) — zero per-pixel gathers in the whole hot path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .geometry import (
    S_EA,
    S_EB,
    S_EC,
    S_ID,
    S_TL,
    S_TL1,
    S_TL2,
    S_ZA,
    S_ZB,
    S_ZC,
    SETUP_W,
    BinnedTris,
    TriSetup,
)

__all__ = [
    "DTILE_H",
    "DTILE_W",
    "PLANES_W",
    "GB_CH",
    "GBuffer",
    "attribute_planes",
    "raster_resolve",
]

# Deferred path uses taller tiles: fewer grid steps, better VPU utilization.
DTILE_H = 32
DTILE_W = 128
GROUP = 8  # triangles processed per vectorized inner step

# Plane-table lanes (PLANES_W per surviving triangle).
PLANES_W = 64
P_DEN = 0    # 3: 1/w plane
P_VP = 3     # 9: view-space position (3 ch x 3 coefs)
P_NRM = 12   # 9
P_TAN = 21   # 9
P_UV0 = 30   # 6
P_UV1 = 36   # 6
P_COL = 42   # 12
P_MAT = 54   # 1: material slot as float value
# 55..63 pad

# G-buffer channels.
GB_CH = 25
G_DEPTH = 0
G_DEN = 1
G_VP = 2     # 3
G_NRM = 5    # 3
G_TAN = 8    # 3
G_UV0 = 11   # 2
G_UV1 = 13   # 2
G_COL = 15   # 4
G_MAT = 19
G_HIT = 20
G_DUV = 21   # 4: du/dx, dv/dx, du/dy, dv/dy — ANALYTIC screen-space uv
#              derivatives from the quotient rule on the uv0/den planes
#              (both linear in screen space), computed in the raster
#              finalize. Unlike image-space finite differences these are
#              per-pixel exact and band-invariant: a row-band render of the
#              target produces bit-identical values to the full-target
#              render (multi-chip exactness contract, parallel/tiles.py).
#              Stored POST-divide (true uv units per pixel) — consumers
#              must NOT divide by G_DEN.


class GBuffer(NamedTuple):
    """Raw (numerator-space) G-buffer: (CH, H, W) float32."""

    data: jnp.ndarray

    @property
    def depth(self):
        return self.data[G_DEPTH]

    @property
    def hit(self):
        return self.data[G_HIT] > 0.0


def attribute_planes(
    tris: TriSetup,
    ctri_clip: jnp.ndarray,    # (Tc, 3, 4)
    ctri_bary: jnp.ndarray,    # (Tc, 3, 3)
    ctri_orig: jnp.ndarray,    # (Tc,)
    tri_vlocal: jnp.ndarray,
    tri_obj: jnp.ndarray,
    bases: jnp.ndarray,
    geo,
    model_view: jnp.ndarray,   # (O, 4, 4)
    obj_material: jnp.ndarray,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Build the (V, PLANES_W) plane table for the surviving triangles.

    All gathers here are over the *compacted survivor list* (a few thousand
    rows), not pixels. Matches the vertex-stage math of opaque.wgsl vs_main:
    view_position, per-corner-normalized view-space normals/tangents with
    inverse-scale-squared correction, uv/color passthrough.
    """
    V = tris.setup.shape[0]
    src = tris.src
    c = ctri_clip[src]        # (V, 3, 4)
    b = ctri_bary[src]        # (V, 3, 3)
    o = ctri_orig[src]        # (V,)

    # Apply the orientation swap (corners 1<->2) used by the edge setup
    # (static slice-stacks; fancy indexing lowers to scalar gathers).
    def _swap12(a):
        return jnp.where(
            tris.flip[:, None, None],
            jnp.stack([a[:, 0], a[:, 2], a[:, 1]], axis=1),
            a,
        )

    c = _swap12(c)
    b = _swap12(b)

    inv_w = 1.0 / jnp.where(c[..., 3] == 0.0, 1.0, c[..., 3])   # (V, 3)
    x = (c[..., 0] * inv_w * 0.5 + 0.5) * width
    y = (0.5 - c[..., 1] * inv_w * 0.5) * height

    # Oriented edge coefficients + area (same formulas as cull_and_setup).
    xn = jnp.roll(x, -1, axis=1)
    yn = jnp.roll(y, -1, axis=1)
    ea = -(yn - y)
    eb = xn - x
    ec = (yn - y) * x - (xn - x) * y
    area = (x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0]) - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0])
    inv_area = 1.0 / jnp.where(area == 0.0, 1.0, area)

    def _opp(a):  # static column rotation [1, 2, 0]
        return jnp.stack([a[:, 1], a[:, 2], a[:, 0]], axis=1)

    # lambda_j(p) = (oa_j*px + ob_j*py + oc_j) * inv_area
    oa = _opp(ea) * inv_area[:, None]  # (V, 3)
    ob = _opp(eb) * inv_area[:, None]
    oc = _opp(ec) * inv_area[:, None]

    # Corner attribute values (clipped corners = bary blend of source corners).
    obj = jnp.maximum(tri_obj[o], 0)
    vloc = tri_vlocal[o]                       # (V, 3)
    bs = bases[obj]                            # (V, n_attrs)

    # All the tiny batched contractions below are written as broadcast
    # multiply-reduce, NOT einsum: a batched (3,3)@(3,C) einsum lowers to a
    # catastrophically padded MXU op that XLA then recomputes per consumer
    # fusion (~1-2 ms each at 64k survivors; this function has ~30 of them).
    def gattr(arena, ai, default):
        base = bs[:, ai]
        has = base >= 0
        ids = jnp.clip(vloc + base[:, None], 0, arena.shape[0] - 1)
        vals = arena[ids]                      # (V, 3src, C)
        vals = jnp.where(has[:, None, None], vals, jnp.asarray(default, jnp.float32))
        # per-CLIPPED-corner values: sum_k b[v,j,k] * vals[v,k,c]
        return (b[:, :, :, None] * vals[:, None, :, :]).sum(axis=2)

    def mv3_apply(x):  # sum_b mv3[v,a,b] * x[v,j,b] -> (V, j, a)
        return (mv3[:, None, :, :] * x[:, :, None, :]).sum(axis=-1)

    mv = model_view[obj]
    mv3 = mv[:, :3, :3]
    pos_c = gattr(geo.position, 0, jnp.zeros(3))              # (V, 3, 3)
    vp_c = mv3_apply(pos_c) + mv[:, None, :3, 3]

    inv_scale_sq = 1.0 / jnp.maximum((mv3 * mv3).sum(axis=1), 1e-30)  # (V, 3)
    nrm_c = mv3_apply(gattr(geo.normal, 1, jnp.zeros(3)) * inv_scale_sq[:, None, :])
    tan_c = mv3_apply(gattr(geo.tangent, 2, jnp.zeros(3)) * inv_scale_sq[:, None, :])

    def _norm(v):
        n = jnp.sqrt((v * v).sum(-1, keepdims=True))
        return v / jnp.where(n == 0.0, 1.0, n)

    nrm_c = _norm(nrm_c)
    tan_c = _norm(tan_c)
    uv0_c = gattr(geo.uv0, 3, jnp.zeros(2))
    uv1_c = gattr(geo.uv1, 4, jnp.zeros(2))
    col_c = gattr(geo.color0, 5, jnp.ones(4))

    def num_planes(vals_c):
        """vals_c: (V, 3, C) -> (V, C, 3) plane coefs of sum_j (A_j/w_j) lam_j."""
        aw = vals_c * inv_w[:, :, None]        # (V, 3, C)
        pa = (aw * oa[:, :, None]).sum(axis=1)
        pb = (aw * ob[:, :, None]).sum(axis=1)
        pc = (aw * oc[:, :, None]).sum(axis=1)
        return jnp.stack([pa, pb, pc], axis=-1)  # (V, C, 3)

    den = num_planes(jnp.ones_like(inv_w)[..., None])[:, 0]   # (V, 3)

    planes = jnp.zeros((V, PLANES_W), jnp.float32)
    planes = planes.at[:, P_DEN : P_DEN + 3].set(den)
    planes = planes.at[:, P_VP : P_VP + 9].set(num_planes(vp_c).reshape(V, 9))
    planes = planes.at[:, P_NRM : P_NRM + 9].set(num_planes(nrm_c).reshape(V, 9))
    planes = planes.at[:, P_TAN : P_TAN + 9].set(num_planes(tan_c).reshape(V, 9))
    planes = planes.at[:, P_UV0 : P_UV0 + 6].set(num_planes(uv0_c).reshape(V, 6))
    planes = planes.at[:, P_UV1 : P_UV1 + 6].set(num_planes(uv1_c).reshape(V, 6))
    planes = planes.at[:, P_COL : P_COL + 12].set(num_planes(col_c).reshape(V, 12))
    planes = planes.at[:, P_MAT].set(obj_material[obj].astype(jnp.float32))
    return planes


BAND_H = 8  # fine-raster band height: bands partition each tile's pixel rows
N_BANDS = DTILE_H // BAND_H
CHUNK = 64               # packed-list rows DMA'd per grid step
GPC = CHUNK // GROUP     # groups per chunk


def _flat_lists(tris: TriSetup, binned: BinnedTris, n_cols: int, flat_mult: int = 1, y0=0,
                cap_override: int = None):
    """Chunk-aligned per-tile lists (geometry.pack_chunks) plus the static
    capacity/chunk bounds. Capacity defaults to one chunk per tile + 2x the
    survivor table (pairs rarely exceed 2x survivors), scaled by the
    adaptive flat_mult; cap_override (the host's adaptive flat-list cap)
    replaces the formula — both the packed tables AND the kernel's step
    budget scale with it, so sizing it to the frame's real pair count (via
    FlatChunks.need) is a first-order perf lever."""
    from .geometry import pack_chunks

    nT, K = binned.ids.shape
    T = tris.setup.shape[0]
    if cap_override is not None:
        cap_total = max(CHUNK, -(-int(cap_override) // CHUNK) * CHUNK)
    else:
        cap_total = -(-(nT * CHUNK + 2 * T * flat_mult) // CHUNK) * CHUNK
    max_chunks = max(1, -(-K // CHUNK))
    flat = pack_chunks(tris, binned, N_BANDS, BAND_H, n_cols, CHUNK, cap_total, max_chunks, y0=y0)
    return flat, cap_total, max_chunks


def _step_tables(flat, n_tiles: int, cap_total: int, phases: int):
    """1D work queue for the chunked raster kernels: one grid step per
    occupied (tile, phase, chunk) plus a finalize step per tile. Returns
    (step_tile, step_kind, step_chunk, n_steps_static). kind: 0..phases-1 =
    that phase's chunk, `phases` = finalize, phases+1 = padding no-op.

    The raster grids iterate real work only — a 2D (tile, max_chunks) grid
    pays the Mosaic step overhead for every skipped slot, which made kernel
    time capacity-proportional."""
    from .geometry import _rank_of

    nc = flat.n_chunks
    per_tile = phases * nc + 1  # chunkless (empty) tiles: finalize only
    tile_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(per_tile)[:-1].astype(jnp.int32)]
    )
    total = tile_start[-1] + per_tile[-1]
    S = phases * (cap_total // CHUNK) + n_tiles + 1
    s = jnp.arange(S, dtype=jnp.int32)
    tile = _rank_of(tile_start, S, n_tiles)
    local = s - tile_start[tile]
    nct = nc[tile]
    phase = jnp.minimum(local // jnp.maximum(nct, 1), phases)  # 0..phases-1, then final
    chunk = local - phase * nct
    kind = jnp.where(local >= phases * nct, phases, phase)
    chunk = jnp.where(kind >= phases, 0, chunk)
    pad = s >= total
    step_tile = jnp.where(pad, n_tiles - 1, tile).astype(jnp.int32)
    step_kind = jnp.where(pad, phases + 1, kind).astype(jnp.int32)
    step_chunk = jnp.where(pad, 0, chunk).astype(jnp.int32)
    return step_tile, step_kind, step_chunk, S


class PackedRaster(NamedTuple):
    """Chunk-packed launch tables for the raster kernels, shared by every
    launch over the same geometry (depth peels, MSAA samples): the flat
    per-tile lists, gathered setup/plane rows, and the 1D step queue. The
    packing XLA pre-pass (gathers over cap_total rows + searchsorted step
    derivation) is a real per-launch cost — build once, launch many."""

    flat: "FlatChunks"
    bset: jnp.ndarray              # (cap_total, SETUP_W)
    bplanes: jnp.ndarray           # (cap_total, PLANES_W) or None (depth-only)
    st: jnp.ndarray                # step -> tile
    sk: jnp.ndarray                # step -> kind
    sc: jnp.ndarray                # step -> chunk
    S: int                         # static step count
    y0: object                     # absolute first row (traced for bands)


def pack_raster(
    tris: TriSetup,
    planes,                        # (V, PLANES_W) or None for depth-only
    binned: BinnedTris,
    width: int,
    height: int,
    *,
    flat_mult: int = 1,
    flat_cap: int = None,
    y0=0,
) -> PackedRaster:
    n_cols = width // DTILE_W
    n_tiles = (height // DTILE_H) * n_cols
    flat, cap_total, _MC = _flat_lists(
        tris, binned, n_cols, flat_mult, y0=y0, cap_override=flat_cap
    )
    gi = jnp.clip(flat.ids, 0, tris.setup.shape[0] - 1)
    bset = tris.setup[gi]
    bplanes = planes[gi] if planes is not None else None
    phases = 1 if planes is None else 2
    st, sk, sc, S = _step_tables(flat, n_tiles, cap_total, phases=phases)
    # Materialize the packed tables once: XLA otherwise re-derives parts of
    # the pack/step chain inside each consumer fusion of the big frame
    # program (in-frame stage cost measured 2-3x the standalone op).
    if bplanes is None:
        flat, bset, st, sk, sc = jax.lax.optimization_barrier(
            (flat, bset, st, sk, sc)
        )
    else:
        flat, bset, bplanes, st, sk, sc = jax.lax.optimization_barrier(
            (flat, bset, bplanes, st, sk, sc)
        )
    return PackedRaster(flat=flat, bset=bset, bplanes=bplanes, st=st, sk=sk, sc=sc, S=S, y0=y0)


def raster_depth_packed(
    pk: PackedRaster,
    width: int,
    height: int,
    *,
    interpret: bool = False,
    sofs: Tuple[float, float] = (0.5, 0.5),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    depth = _depth_launch(
        pk.flat, pk.bset, pk.st, pk.sk, pk.sc, pk.S, width, height, interpret, pk.y0, sofs
    )
    return depth, pk.flat.overflow


def raster_depth(
    tris: TriSetup,
    binned: BinnedTris,
    width: int,
    height: int,
    *,
    interpret: bool = False,
    flat_mult: int = 1,
    y0=0,
    sofs: Tuple[float, float] = (0.5, 0.5),
    flat_cap: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-only raster over chunk-packed per-tile lists: ((H, W) f32,
    overflow counter).

    The grid is a 1D work queue of occupied (tile, chunk) steps (see
    _step_tables): each step DMAs one (CHUNK, SETUP_W) slice of the flat
    setup table and each 8-triangle group is tested only against the
    (8, 128)-pixel bands its band mask covers — bandwidth, compute AND grid
    overhead all scale with the scene's real triangle-tile pairs. Used for
    the Hi-Z predicted-depth prepass (reference: two-phase culling,
    base.rs:155-172) and shadow maps.

    y0: optional traced absolute row of the target's first row (multi-chip
    band rendering); pixel coordinates are y0 + local, added as integers so
    band renders are bit-identical to the single-chip full-target raster."""
    pk = pack_raster(
        tris, None, binned, width, height, flat_mult=flat_mult, flat_cap=flat_cap, y0=y0
    )
    return raster_depth_packed(pk, width, height, interpret=interpret, sofs=sofs)


def _depth_launch(flat, bset, st, sk, sc, S, width, height, interpret, y0=0, sofs=(0.5, 0.5)):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = height // DTILE_H
    n_cols = width // DTILE_W
    n_tiles = n_rows * n_cols
    npb = BAND_H * DTILE_W
    y0arr = jnp.full((1,), y0, jnp.int32)

    def kernel(y0_ref, st_ref, sk_ref, sc_ref, cb_ref, nc_ref, meta_ref, bset_ref, out_ref, depth_ref):
        s = pl.program_id(0)
        i = st_ref[s]
        kind = sk_ref[s]
        chunk = sc_ref[s]
        gbase = (cb_ref[i] + chunk) * GPC
        row = i // n_cols
        col = i - row * n_cols
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, npb), 1)
        pxf = (lane % DTILE_W).astype(jnp.float32) + (col * DTILE_W).astype(jnp.float32) + float(sofs[0])
        py0 = (lane // DTILE_W + row * DTILE_H + y0_ref[0]).astype(jnp.float32) + float(sofs[1])

        @pl.when((kind == 0) & (chunk == 0))
        def _init():
            depth_ref[...] = jnp.zeros((N_BANDS, npb), jnp.float32)

        @pl.when(kind == 0)
        def _chunk():
            for g in range(GPC):
                meta = meta_ref[gbase + g]
                bmask = meta >> 4
                gvalid = meta & 15

                @pl.when(gvalid > 0)
                def _grp(g=g, bmask=bmask, gvalid=gvalid):
                    blk = bset_ref[pl.ds(g * GROUP, GROUP), :]

                    def cf(k):
                        return blk[:, k : k + 1]              # (GROUP, 1)

                    valid = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0) < gvalid
                    for b in range(N_BANDS):
                        @pl.when(((bmask >> b) & 1) != 0)
                        def _band(b=b):
                            pyf = py0 + float(b * BAND_H)
                            e0 = cf(S_EA) * pxf + cf(S_EB) * pyf + cf(S_EC)
                            e1 = cf(S_EA + 1) * pxf + cf(S_EB + 1) * pyf + cf(S_EC + 1)
                            e2 = cf(S_EA + 2) * pxf + cf(S_EB + 2) * pyf + cf(S_EC + 2)
                            c0 = (e0 > 0.0) | ((e0 == 0.0) & (cf(S_TL) > 0.0))
                            c1 = (e1 > 0.0) | ((e1 == 0.0) & (cf(S_TL1) > 0.0))
                            c2 = (e2 > 0.0) | ((e2 == 0.0) & (cf(S_TL2) > 0.0))
                            z = cf(S_ZA) * pxf + cf(S_ZB) * pyf + cf(S_ZC)
                            cov = c0 & c1 & c2 & (z >= 0.0) & (z <= 1.0) & valid
                            zb = jnp.where(cov, z, 0.0).max(axis=0, keepdims=True)
                            d = depth_ref[b : b + 1, :]
                            depth_ref[b : b + 1, :] = jnp.maximum(d, zb)

        @pl.when(kind == 1)
        def _final():
            # Chunkless (empty) tiles have no kind-0 init step: write the
            # cleared block directly instead of reading garbage scratch.
            @pl.when(nc_ref[i] == 0)
            def _empty():
                out_ref[0] = jnp.zeros((DTILE_H, DTILE_W), jnp.float32)

            @pl.when(nc_ref[i] > 0)
            def _occupied():
                out_ref[0] = depth_ref[...].reshape(DTILE_H, DTILE_W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,  # y0, step_tile, step_kind, step_chunk, chunk_base, n_chunks, meta
        grid=(S,),
        in_specs=[
            pl.BlockSpec(
                (CHUNK, SETUP_W),
                lambda s, y0r, st, sk, sc, cb, nc, mt: (cb[st[s]] + sc[s], 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, DTILE_H, DTILE_W), lambda s, y0r, st, sk, sc, cb, nc, mt: (st[s], 0, 0)),
        scratch_shapes=[pltpu.VMEM((N_BANDS, npb), jnp.float32)],
    )
    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, DTILE_H, DTILE_W), jnp.float32),
        interpret=interpret,
    )(y0arr, st, sk, sc, flat.chunk_base, flat.n_chunks, flat.group_meta, bset)
    return tiles.reshape(n_rows, n_cols, DTILE_H, DTILE_W).transpose(0, 2, 1, 3).reshape(height, width)


def raster_resolve(
    tris: TriSetup,
    planes: jnp.ndarray,
    binned: BinnedTris,
    width: int,
    height: int,
    *,
    bound: jnp.ndarray = None,  # optional (H, W) exclusive reverse-Z upper bound
    interpret: bool = False,
    flat_mult: int = 1,
    y0=0,
    sofs: Tuple[float, float] = (0.5, 0.5),  # in-pixel sample position (MSAA)
    flat_cap: int = None,
) -> Tuple[GBuffer, jnp.ndarray]:
    """The fused raster + resolve Pallas kernel over chunk-packed per-tile
    lists.

    The grid is a 1D work queue of occupied steps (_step_tables) with two
    phases per tile plus finalize. Phase A (kind 0): grouped vectorized
    edge/depth tests against each band the group's band mask covers update
    the per-band depth/winner scratch. Phase B (kind 1, same chunks again):
    groups containing final winners select their 64 plane coefficients per
    pixel with an (8 x 64)^T @ (8 x 1024) one-hot matmul on the MXU into
    the per-band coef scratch. Finalize (kind 2): evaluate all attribute
    planes once per pixel and write the tile's G-buffer block.
    Output: ((GB_CH, H, W) numerator-space G-buffer, overflow counter).
    """
    pk = pack_raster(
        tris, planes, binned, width, height, flat_mult=flat_mult, flat_cap=flat_cap, y0=y0
    )
    return raster_resolve_packed(pk, width, height, bound=bound, interpret=interpret, sofs=sofs)


def raster_resolve_packed(
    pk: PackedRaster,
    width: int,
    height: int,
    *,
    bound: jnp.ndarray = None,
    interpret: bool = False,
    sofs: Tuple[float, float] = (0.5, 0.5),
    count_floor: jnp.ndarray = None,
    count_strict: bool = False,
):
    """Launch the fused raster+resolve kernel over pre-packed tables (see
    pack_raster): depth peels and MSAA samples re-launch with a different
    bound / sofs without re-paying the packing pre-pass.

    count_floor: optional (H, W) reverse-Z depth floor. When given, the
    kernel ALSO counts, per pixel, every covered fragment at z >= floor
    (z > floor when count_strict) — the exact per-pixel depth-peel layer
    count in one pass (pass the opaque depth, -1.0 where no opaque hit).
    Capacity-INDEPENDENT, so the adaptive peel controllers converge
    one-shot instead of probing one layer past capacity per recompile
    (which oscillated at capacity == true depth). Returns
    (GBuffer, overflow, counts (H, W) f32) — or (GBuffer, overflow)
    without count_floor."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = height // DTILE_H
    n_cols = width // DTILE_W
    n_tiles = n_rows * n_cols
    flat, bset, bplanes = pk.flat, pk.bset, pk.bplanes
    st, sk, sc, S, y0 = pk.st, pk.sk, pk.sc, pk.S, pk.y0
    y0arr = jnp.full((1,), y0, jnp.int32)

    npb = BAND_H * DTILE_W

    def tile_layout(img):
        return (
            img.reshape(n_rows, N_BANDS, BAND_H, n_cols, DTILE_W)
            .transpose(0, 3, 1, 2, 4)
            .reshape(n_tiles, N_BANDS, npb)
        )

    if bound is not None:
        # Depth-peeling support (cutout): per-pixel exclusive upper bound,
        # pre-flattened to the kernel's (tile, band, band-pixels) layout.
        bound_t = tile_layout(bound)
    if count_floor is not None:
        floor_t = tile_layout(count_floor)

    def kernel(y0_ref, st_ref, sk_ref, sc_ref, cb_ref, nc_ref, meta_ref, bset_ref, bpl_ref, *rest):
        rest = list(rest)
        bnd_ref = rest.pop(0) if bound is not None else None
        flr_ref = rest.pop(0) if count_floor is not None else None
        if count_floor is not None:
            out_ref, cnt_out_ref, depth_ref, win_ref, coef_ref, cnt_ref = rest
        else:
            out_ref, depth_ref, win_ref, coef_ref = rest
            cnt_out_ref = cnt_ref = None
        s = pl.program_id(0)
        i = st_ref[s]
        kind = sk_ref[s]
        chunk = sc_ref[s]
        gbase = (cb_ref[i] + chunk) * GPC
        row = i // n_cols
        col = i - row * n_cols
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, npb), 1)
        pxf = (lane % DTILE_W).astype(jnp.float32) + (col * DTILE_W).astype(jnp.float32) + float(sofs[0])
        py0 = (lane // DTILE_W + row * DTILE_H + y0_ref[0]).astype(jnp.float32) + float(sofs[1])

        @pl.when((kind == 0) & (chunk == 0))
        def _init():
            depth_ref[...] = jnp.zeros((N_BANDS, npb), jnp.float32)
            win_ref[...] = jnp.full((N_BANDS, npb), -1, jnp.int32)
            coef_ref[...] = jnp.zeros((N_BANDS, PLANES_W, npb), jnp.float32)
            if cnt_ref is not None:
                cnt_ref[...] = jnp.zeros((N_BANDS, npb), jnp.float32)

        @pl.when(kind == 0)
        def _phase_a():
            for g in range(GPC):
                meta = meta_ref[gbase + g]
                bmask = meta >> 4
                gvalid = meta & 15

                @pl.when(gvalid > 0)
                def _grp(g=g, bmask=bmask, gvalid=gvalid):
                    blk = bset_ref[pl.ds(g * GROUP, GROUP), :]

                    def cf(k):
                        return blk[:, k : k + 1]

                    valid = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0) < gvalid
                    entry_base = chunk * CHUNK + g * GROUP    # offset in tile segment
                    for b in range(N_BANDS):
                        @pl.when(((bmask >> b) & 1) != 0)
                        def _band(b=b):
                            pyf = py0 + float(b * BAND_H)
                            e0 = cf(S_EA) * pxf + cf(S_EB) * pyf + cf(S_EC)
                            e1 = cf(S_EA + 1) * pxf + cf(S_EB + 1) * pyf + cf(S_EC + 1)
                            e2 = cf(S_EA + 2) * pxf + cf(S_EB + 2) * pyf + cf(S_EC + 2)
                            c0 = (e0 > 0.0) | ((e0 == 0.0) & (cf(S_TL) > 0.0))
                            c1 = (e1 > 0.0) | ((e1 == 0.0) & (cf(S_TL1) > 0.0))
                            c2 = (e2 > 0.0) | ((e2 == 0.0) & (cf(S_TL2) > 0.0))
                            z = cf(S_ZA) * pxf + cf(S_ZB) * pyf + cf(S_ZC)
                            cov = c0 & c1 & c2 & (z >= 0.0) & (z <= 1.0) & valid
                            if cnt_ref is not None:
                                flr = flr_ref[0][b : b + 1, :]
                                above = (z > flr) if count_strict else (z >= flr)
                                cnt_ref[b : b + 1, :] = cnt_ref[b : b + 1, :] + (
                                    cov & above
                                ).astype(jnp.float32).sum(axis=0, keepdims=True)
                            if bound is not None:
                                cov = cov & (z < bnd_ref[0][b : b + 1, :])
                            zm = jnp.where(cov, z, -1.0)              # (GROUP, npb)

                            # last-wins argmax within the group
                            best_z = zm.max(axis=0, keepdims=True)    # (1, npb)
                            gidx = jax.lax.broadcasted_iota(jnp.int32, zm.shape, 0)
                            best_local = jnp.where(zm == best_z, gidx, -1).max(axis=0, keepdims=True)
                            d = depth_ref[b : b + 1, :]
                            w = win_ref[b : b + 1, :]
                            upd = (best_z >= d) & (best_z > -1.0)
                            depth_ref[b : b + 1, :] = jnp.where(upd, best_z, d)
                            win_ref[b : b + 1, :] = jnp.where(upd, entry_base + best_local, w)

        @pl.when(kind == 1)
        def _phase_b():
            for g in range(GPC):
                meta = meta_ref[gbase + g]
                bmask = meta >> 4
                gvalid = meta & 15

                @pl.when(gvalid > 0)
                def _grp(g=g, bmask=bmask):
                    base = chunk * CHUNK + g * GROUP
                    blkp = bpl_ref[pl.ds(g * GROUP, GROUP), :]  # (GROUP, PLANES_W)
                    for b in range(N_BANDS):
                        @pl.when(((bmask >> b) & 1) != 0)
                        def _band(b=b):
                            w = win_ref[b : b + 1, :]             # (1, npb)
                            in_group = (w >= base) & (w < base + GROUP)

                            @pl.when(jnp.any(in_group))
                            def _sel():
                                ids8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0) + base
                                sel = (w == ids8).astype(jnp.float32)  # (GROUP, npb)
                                contrib = jax.lax.dot_general(
                                    blkp, sel,
                                    dimension_numbers=(((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )                                      # (PLANES_W, npb)
                                coef_ref[b] = coef_ref[b] + contrib

        @pl.when((kind == 2) & (nc_ref[i] == 0))
        def _final_empty():
            # Chunkless tile: the cleared G-buffer block (depth 0, no hit,
            # zero planes) — exactly what the occupied path produces from
            # zero-initialized scratch with no covering triangles.
            out_ref[0] = jnp.zeros((GB_CH, DTILE_H, DTILE_W), jnp.float32)
            if cnt_out_ref is not None:
                cnt_out_ref[0] = jnp.zeros((DTILE_H, DTILE_W), jnp.float32)

        @pl.when((kind == 2) & (nc_ref[i] > 0))
        def _final():
            for b in range(N_BANDS):
                coef = coef_ref[b]                             # (PLANES_W, npb)
                depth = depth_ref[b : b + 1, :]                # (1, npb)
                win = win_ref[b : b + 1, :]
                pyf = py0 + float(b * BAND_H)

                def plane(off):
                    return coef[off : off + 1, :] * pxf + coef[off + 1 : off + 2, :] * pyf + coef[off + 2 : off + 3, :]

                # Channel order must match G_* indices.
                chans = [depth, plane(P_DEN)]
                for k in range(3):
                    chans.append(plane(P_VP + 3 * k))
                for k in range(3):
                    chans.append(plane(P_NRM + 3 * k))
                for k in range(3):
                    chans.append(plane(P_TAN + 3 * k))
                for k in range(2):
                    chans.append(plane(P_UV0 + 3 * k))
                for k in range(2):
                    chans.append(plane(P_UV1 + 3 * k))
                for k in range(4):
                    chans.append(plane(P_COL + 3 * k))
                chans.append(coef[P_MAT : P_MAT + 1, :])
                chans.append((win >= 0).astype(jnp.float32))
                # Analytic uv screen derivatives (quotient rule): with
                # U = a_u*x + b_u*y + c_u (uv numerator plane) and
                # Dn = a_d*x + b_d*y + c_d (1/w plane), u = U/Dn and
                # du/dx = (a_u - u*a_d)/Dn. Same guard as the lighting
                # pass's inv_den so no-hit pixels stay finite.
                Dn = plane(P_DEN)
                invd = jnp.where(jnp.abs(Dn) < 1e-30, 1.0, 1.0 / Dn)
                a_d = coef[P_DEN : P_DEN + 1, :]
                b_d = coef[P_DEN + 1 : P_DEN + 2, :]
                for k in range(2):                       # du/dx, dv/dx
                    off = P_UV0 + 3 * k
                    uvv = plane(off) * invd
                    chans.append((coef[off : off + 1, :] - uvv * a_d) * invd)
                for k in range(2):                       # du/dy, dv/dy
                    off = P_UV0 + 3 * k
                    uvv = plane(off) * invd
                    chans.append((coef[off + 1 : off + 2, :] - uvv * b_d) * invd)
                while len(chans) < GB_CH:
                    chans.append(jnp.zeros((1, npb), jnp.float32))
                out = jnp.concatenate(chans, axis=0)           # (GB_CH, npb)
                out_ref[0, :, pl.ds(b * BAND_H, BAND_H), :] = out.reshape(
                    GB_CH, BAND_H, DTILE_W
                )
                if cnt_out_ref is not None:
                    cnt_out_ref[0, pl.ds(b * BAND_H, BAND_H), :] = cnt_ref[
                        b : b + 1, :
                    ].reshape(BAND_H, DTILE_W)

    in_specs = [
        pl.BlockSpec(
            (CHUNK, SETUP_W),
            lambda s, y0r, st, sk, sc, cb, nc, mt: (cb[st[s]] + sc[s], 0),
        ),
        pl.BlockSpec(
            (CHUNK, PLANES_W),
            lambda s, y0r, st, sk, sc, cb, nc, mt: (cb[st[s]] + sc[s], 0),
        ),
    ]
    inputs = [bset, bplanes]
    if bound is not None:
        in_specs.append(
            pl.BlockSpec((1, N_BANDS, npb), lambda s, y0r, st, sk, sc, cb, nc, mt: (st[s], 0, 0))
        )
        inputs.append(bound_t)
    if count_floor is not None:
        in_specs.append(
            pl.BlockSpec((1, N_BANDS, npb), lambda s, y0r, st, sk, sc, cb, nc, mt: (st[s], 0, 0))
        )
        inputs.append(floor_t)
    out_specs = pl.BlockSpec(
        (1, GB_CH, DTILE_H, DTILE_W), lambda s, y0r, st, sk, sc, cb, nc, mt: (st[s], 0, 0, 0)
    )
    out_shape = jax.ShapeDtypeStruct((n_tiles, GB_CH, DTILE_H, DTILE_W), jnp.float32)
    scratch = [
        pltpu.VMEM((N_BANDS, npb), jnp.float32),
        pltpu.VMEM((N_BANDS, npb), jnp.int32),
        pltpu.VMEM((N_BANDS, PLANES_W, npb), jnp.float32),
    ]
    if count_floor is not None:
        out_specs = (
            out_specs,
            pl.BlockSpec(
                (1, DTILE_H, DTILE_W), lambda s, y0r, st, sk, sc, cb, nc, mt: (st[s], 0, 0)
            ),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((n_tiles, DTILE_H, DTILE_W), jnp.float32),
        )
        scratch.append(pltpu.VMEM((N_BANDS, npb), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(S,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(y0arr, st, sk, sc, flat.chunk_base, flat.n_chunks, flat.group_meta, *inputs)

    if count_floor is not None:
        tiles, cnt_tiles = tiles
    data = tiles.reshape(n_rows, n_cols, GB_CH, DTILE_H, DTILE_W)
    data = data.transpose(2, 0, 3, 1, 4).reshape(GB_CH, height, width)
    if count_floor is not None:
        counts = (
            cnt_tiles.reshape(n_rows, n_cols, DTILE_H, DTILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(height, width)
        )
        return GBuffer(data=data), flat.overflow, counts
    return GBuffer(data=data), flat.overflow
