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
GB_CH = 24
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
# 21..23 pad


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


def _band_lists(tris: TriSetup, binned: BinnedTris, n_cols: int, k_total=None):
    """Refine tile lists into tightly-packed per-band lists."""
    from .geometry import pack_bands

    K = binned.ids.shape[1]
    if k_total is None:
        # A triangle is duplicated only into the (usually 1-2) bands its
        # bbox overlaps; 1.5x the tile list plus slack covers typical scenes
        # and overflow feeds the adaptive tile caps.
        k_total = -(-(K + K // 2) // GROUP) * GROUP
    return pack_bands(tris, binned, N_BANDS, BAND_H, n_cols, k_total)


def raster_depth(
    tris: TriSetup,
    binned: BinnedTris,
    width: int,
    height: int,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-only grouped raster over (8, 128)-pixel bands: ((H, W) f32,
    band-overflow counter).

    Used for the Hi-Z predicted-depth prepass (reference: two-phase culling,
    base.rs:155-172) and fast shadow-map rendering."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = height // DTILE_H
    n_cols = width // DTILE_W
    n_tiles = n_rows * n_cols
    banded = _band_lists(tris, binned, n_cols)
    Kt = banded.ids.shape[1]
    bset = tris.setup[jnp.clip(banded.ids, 0, tris.setup.shape[0] - 1)]

    npix_b = BAND_H * DTILE_W

    def kernel(counts_ref, bset_ref, depth_ref):
        i = pl.program_id(0)
        row = i // n_cols
        col = i - row * n_cols
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix_b), 1)
        pxf = (lane % DTILE_W).astype(jnp.float32) + (col * DTILE_W).astype(jnp.float32) + 0.5
        py0 = (lane // DTILE_W).astype(jnp.float32) + (row * DTILE_H).astype(jnp.float32) + 0.5

        start = 0
        for b in range(N_BANDS):
            cnt = counts_ref[i * N_BANDS + b]
            pyf = py0 + float(b * BAND_H)

            def grp(gk, depth, b=b, cnt=cnt, pyf=pyf, start=start):
                base = gk * GROUP
                blk = bset_ref[0, pl.ds(start + base, GROUP), :]

                def cf(lane_idx):
                    return blk[:, lane_idx : lane_idx + 1]       # (GROUP, 1)

                valid = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0) + base) < cnt
                e0 = cf(S_EA) * pxf + cf(S_EB) * pyf + cf(S_EC)
                e1 = cf(S_EA + 1) * pxf + cf(S_EB + 1) * pyf + cf(S_EC + 1)
                e2 = cf(S_EA + 2) * pxf + cf(S_EB + 2) * pyf + cf(S_EC + 2)
                c0 = (e0 > 0.0) | ((e0 == 0.0) & (cf(S_TL) > 0.0))
                c1 = (e1 > 0.0) | ((e1 == 0.0) & (cf(S_TL1) > 0.0))
                c2 = (e2 > 0.0) | ((e2 == 0.0) & (cf(S_TL2) > 0.0))
                z = cf(S_ZA) * pxf + cf(S_ZB) * pyf + cf(S_ZC)
                cov = c0 & c1 & c2 & (z >= 0.0) & (z <= 1.0) & valid
                return jnp.maximum(depth, jnp.where(cov, z, 0.0).max(axis=0, keepdims=True))

            depth = jax.lax.fori_loop(
                0, pl.cdiv(cnt, GROUP), grp, jnp.zeros((1, npix_b), jnp.float32)
            )
            depth_ref[0, pl.ds(b * BAND_H, BAND_H), :] = depth.reshape(BAND_H, DTILE_W)
            start = start + cnt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, Kt, SETUP_W), lambda i, c: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, DTILE_H, DTILE_W), lambda i, c: (i, 0, 0)),
    )
    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, DTILE_H, DTILE_W), jnp.float32),
        interpret=interpret,
    )(banded.counts.reshape(-1), bset)
    depth = tiles.reshape(n_rows, n_cols, DTILE_H, DTILE_W).transpose(0, 2, 1, 3).reshape(height, width)
    return depth, banded.overflow


def raster_resolve(
    tris: TriSetup,
    planes: jnp.ndarray,    # (V, PLANES_W)
    binned: BinnedTris,
    width: int,
    height: int,
    *,
    interpret: bool = False,
) -> Tuple[GBuffer, jnp.ndarray]:
    """The fused raster + resolve Pallas kernel over (32, 128) tiles split
    into exact (8, 128) bands.

    Per band: pass 1 does grouped (8 triangles at a time) vectorized
    edge/depth tests -> winner index per pixel; pass 2 selects, for groups
    containing winners, the winner's 64 plane coefficients per pixel with an
    (8 x 64)^T @ (8 x 1024) one-hot matmul on the MXU, then evaluates all
    attribute planes once per pixel. Banding keeps the per-step work and DMA
    proportional to the triangles that can actually touch the band's pixel
    rows. Output: ((GB_CH, H, W) numerator-space G-buffer, band overflow).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = height // DTILE_H
    n_cols = width // DTILE_W
    n_tiles = n_rows * n_cols
    banded = _band_lists(tris, binned, n_cols)
    Kt = banded.ids.shape[1]

    gi = jnp.clip(banded.ids, 0, tris.setup.shape[0] - 1)
    bset = tris.setup[gi]      # (nT, Kt, SETUP_W)
    bplanes = planes[gi]       # (nT, Kt, PLANES_W)

    npix_b = BAND_H * DTILE_W

    def kernel(counts_ref, bset_ref, bpl_ref, out_ref, coef_ref):
        i = pl.program_id(0)
        row = i // n_cols
        col = i - row * n_cols
        ybase = (row * DTILE_H).astype(jnp.float32)
        xbase = (col * DTILE_W).astype(jnp.float32)
        # Flat pixel layout: tris along sublanes, pixels along lanes — all
        # per-triangle coefficient broadcasts are native sublane broadcasts.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix_b), 1)
        pxf = (lane % DTILE_W).astype(jnp.float32) + xbase + 0.5
        py0 = (lane // DTILE_W).astype(jnp.float32) + ybase + 0.5

        start = 0
        for b in range(N_BANDS):
            cnt = counts_ref[i * N_BANDS + b]
            pyf = py0 + float(b * BAND_H)
            ngroups = pl.cdiv(cnt, GROUP)

            # ---- pass 1: visibility ----
            def grp_body(gk, carry, b=b, cnt=cnt, pyf=pyf, start=start):
                depth, win = carry                               # (1, npix_b)
                base = gk * GROUP
                blk = bset_ref[0, pl.ds(start + base, GROUP), :]  # (GROUP, SETUP_W)

                def cf(lane_idx):
                    return blk[:, lane_idx : lane_idx + 1]       # (GROUP, 1)

                valid = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0) + base) < cnt
                e0 = cf(S_EA) * pxf + cf(S_EB) * pyf + cf(S_EC)  # (GROUP, npix_b)
                e1 = cf(S_EA + 1) * pxf + cf(S_EB + 1) * pyf + cf(S_EC + 1)
                e2 = cf(S_EA + 2) * pxf + cf(S_EB + 2) * pyf + cf(S_EC + 2)
                c0 = (e0 > 0.0) | ((e0 == 0.0) & (cf(S_TL) > 0.0))
                c1 = (e1 > 0.0) | ((e1 == 0.0) & (cf(S_TL1) > 0.0))
                c2 = (e2 > 0.0) | ((e2 == 0.0) & (cf(S_TL2) > 0.0))
                z = cf(S_ZA) * pxf + cf(S_ZB) * pyf + cf(S_ZC)
                cov = c0 & c1 & c2 & (z >= 0.0) & (z <= 1.0) & valid
                zm = jnp.where(cov, z, -1.0)                     # (GROUP, npix_b)

                # last-wins argmax within the group
                best_z = zm.max(axis=0, keepdims=True)           # (1, npix_b)
                gidx = jax.lax.broadcasted_iota(jnp.int32, zm.shape, 0)
                best_local = jnp.where(zm == best_z, gidx, -1).max(axis=0, keepdims=True)
                upd = (best_z >= depth) & (best_z > -1.0)
                return (
                    jnp.where(upd, best_z, depth),
                    jnp.where(upd, base + best_local, win),
                )

            d0 = jnp.zeros((1, npix_b), jnp.float32)
            w0 = jnp.full((1, npix_b), -1, jnp.int32)
            depth, win = jax.lax.fori_loop(0, ngroups, grp_body, (d0, w0))

            # ---- pass 2: accumulate the winner's plane row per pixel ----
            # Accumulates into a VMEM scratch with predicated (pl.when)
            # writes: a (PLANES_W, npix) fori-loop carry routed through
            # lax.cond costs a full-buffer copy per group.
            coef_ref[...] = jnp.zeros((PLANES_W, npix_b), jnp.float32)

            def grp2_body(gk, carry, b=b, win=win, start=start):
                base = gk * GROUP
                in_group = (win >= base) & (win < base + GROUP)

                @pl.when(jnp.any(in_group))
                def _():
                    ids = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0) + base
                    sel = (win == ids).astype(jnp.float32)         # (GROUP, npix_b)
                    blkp = bpl_ref[0, pl.ds(start + base, GROUP), :]  # (GROUP, PLANES_W)
                    contrib = jax.lax.dot_general(
                        blkp, sel,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                              # (PLANES_W, npix_b)
                    coef_ref[...] = coef_ref[...] + contrib

                return carry

            jax.lax.fori_loop(0, ngroups, grp2_body, 0)
            coef = coef_ref[...]                                   # (PLANES_W, npix_b)

            # ---- final: evaluate all planes once per pixel ----

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
            while len(chans) < GB_CH:
                chans.append(jnp.zeros((1, npix_b), jnp.float32))
            out = jnp.concatenate(chans, axis=0)                   # (GB_CH, npix_b)
            out_ref[0, :, pl.ds(b * BAND_H, BAND_H), :] = out.reshape(
                GB_CH, BAND_H, DTILE_W
            )
            start = start + cnt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, Kt, SETUP_W), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, Kt, PLANES_W), lambda i, c: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, GB_CH, DTILE_H, DTILE_W), lambda i, c: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((PLANES_W, BAND_H * DTILE_W), jnp.float32)],
    )

    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, GB_CH, DTILE_H, DTILE_W), jnp.float32),
        interpret=interpret,
    )(banded.counts.reshape(-1), bset, bplanes)

    data = tiles.reshape(n_rows, n_cols, GB_CH, DTILE_H, DTILE_W)
    data = data.transpose(2, 0, 3, 1, 4).reshape(GB_CH, height, width)
    return GBuffer(data=data), banded.overflow
