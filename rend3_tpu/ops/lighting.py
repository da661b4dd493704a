"""Deferred lighting over the G-buffer.

Pure image-space pass: perspective divide of the numerator G-buffer, material
table lookup via one-hot matmul on the MXU (per-pixel gathers are ~20x
slower than a one-hot contraction on TPU), uv gradients read straight from
the G-buffer's analytic-derivative channels (deferred.G_DUV — exact,
per-pixel, band-invariant), then the exact opaque.wgsl lighting math shared
with the forward path (_shade_pixels)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import deferred as D
from .shade import DirLightArrays, FrameUniformsArrays, PbrMaterialTable, PointLightArrays, _shade_pixels

__all__ = ["light_gbuffer", "apply_material_routines"]


def _onehot_lookup(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """idx (N,) int32, table (M, D) -> (N, D) via MXU one-hot contraction."""
    M = table.shape[0]
    oh = jax.nn.one_hot(idx, M, dtype=jnp.float32)
    return jax.lax.dot_general(
        oh, table.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _onehot_lookup_p(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """PLANAR one-hot lookup: idx (N,), table (M, D) -> (D, N).

    The one-hot rides (M, N) and the result keeps the pixel axis in the
    128-lane minor dimension — the N-major variant materializes (N, D)
    buffers whose D channels pad to 128 lanes (~4-32x HBM waste at 2M
    pixels; the dominant r4 lighting-stage cost)."""
    M = table.shape[0]
    oh = jax.nn.one_hot(idx, M, dtype=jnp.float32, axis=0)  # (M, N)
    return jax.lax.dot_general(
        table.astype(jnp.float32), oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def light_gbuffer(
    gbuf: D.GBuffer,
    materials: PbrMaterialTable,
    dir_lights: DirLightArrays,
    point_lights: PointLightArrays,
    shadow_atlas: jnp.ndarray,
    uniforms: FrameUniformsArrays,
    background: jnp.ndarray,        # (H, W, 4)
    textures=None,
    shadow_values=None,             # optional (L, H, W) precomputed factors
    active_tex_slots=None,          # static slot tuple -> use the MXU sampler
    tex_pair_cap: int = 16,
    interpret: bool = False,
    debug_stop_tex: bool = False,   # profiling: return after texture sampling
    tex_queue_cap: int = None,      # adaptive sampler step-queue size
):
    """Returns (H, W, 4) linear HDR, or (img, tex_pair_overflow, qtotal)
    when the MXU texture sampler is active (active_tex_slots is not
    None)."""
    CH, H, W = gbuf.data.shape
    N = H * W
    g = gbuf.data.reshape(CH, N)

    hit = g[D.G_HIT] > 0.0
    den = g[D.G_DEN]
    inv_den = jnp.where(jnp.abs(den) < 1e-30, 1.0, 1.0 / den)

    # Planar end-to-end: the G-buffer is already channels-first and
    # _shade_pixels consumes channels-first rows; no (N, C) transpose ever
    # materializes (each one costs a padded 128-lane copy at 2M pixels).
    def ch(off, n):
        return g[off : off + n] * inv_den[None]  # (n, N)

    view_pos = ch(D.G_VP, 3)
    nrm = ch(D.G_NRM, 3)
    tan = ch(D.G_TAN, 3)
    uv0 = ch(D.G_UV0, 2)
    vcol = ch(D.G_COL, 4)

    midx = jnp.round(g[D.G_MAT]).astype(jnp.int32)
    midx = jnp.clip(midx, 0, materials.data.shape[0] - 1)
    mdata = _onehot_lookup_p(midx, materials.data)  # (D, N)
    mflags = jnp.round(_onehot_lookup_p(midx, materials.flags[:, None].astype(jnp.float32))[0]).astype(jnp.int32)

    duv = None
    mtex = None
    tex_samples = None
    tex_overflow = jnp.int32(0)
    tex_qtotal = jnp.int32(0)
    if textures is not None:
        mtex = jnp.round(_onehot_lookup_p(midx, materials.textures.astype(jnp.float32))).astype(jnp.int32)  # (NSLOT, N)
        # Analytic per-pixel uv screen derivatives from the raster finalize
        # (deferred.G_DUV, post-divide — no inv_den here). Band-invariant:
        # sparse pseudo-image G-buffers carry their source pixels' true
        # derivatives for free (gathered with every other channel).
        duv = g[D.G_DUV : D.G_DUV + 4]  # (4, N) planar
        if active_tex_slots is not None:
            from . import texture as tex_ops
            from .shade import PBR_UVT0

            # Unrolled per-channel multiply-add, NOT einsum: a per-pixel
            # batched (3,3)@(3,) einsum lowers to a catastrophically padded
            # MXU op (~1-2 ms per 64k rows, deferred.py attribute_planes
            # notes — tens of ms at full resolution).
            u, vv = uv0[0:1], uv0[1:2]
            coords = jnp.concatenate([
                mdata[PBR_UVT0 + 0:PBR_UVT0 + 1] * u + mdata[PBR_UVT0 + 1:PBR_UVT0 + 2] * vv + mdata[PBR_UVT0 + 2:PBR_UVT0 + 3],
                mdata[PBR_UVT0 + 3:PBR_UVT0 + 4] * u + mdata[PBR_UVT0 + 4:PBR_UVT0 + 5] * vv + mdata[PBR_UVT0 + 5:PBR_UVT0 + 6],
            ])  # (2, N)
            tex_samples, tex_overflow, tex_qtotal = tex_ops.sample_textures_grid(
                textures, mtex, coords, duv, mflags, (H, W),
                tuple(active_tex_slots),
                pair_cap=tex_pair_cap, interpret=interpret, hit=hit,
                queue_cap=tex_queue_cap, planar=True,
            )
            if debug_stop_tex:
                dbg = sum(s for s in tex_samples if s is not None)
                return dbg.reshape(4, H, W), tex_overflow, tex_qtotal

    sv = shadow_values.reshape(shadow_values.shape[0], N) if shadow_values is not None else None
    out_rgb, out_a = _shade_pixels(
        mdata, mflags, mtex, textures, uv0, duv, vcol, nrm, tan, view_pos,
        dir_lights, point_lights, shadow_atlas, uniforms, shadow_values=sv,
        tex_samples=tex_samples,
    )
    rgba = jnp.concatenate([out_rgb, out_a], axis=0)  # (4, N)
    rgba = jnp.where(hit[None, :], rgba, background.reshape(N, 4).T)
    img = rgba.reshape(4, H, W).transpose(1, 2, 0)
    if active_tex_slots is not None:
        return img, tex_overflow, tex_qtotal
    return img


def apply_material_routines(
    img: jnp.ndarray,               # (H, W, 4) lit image (built-in PBR pass)
    gbuf: D.GBuffer,
    extras,                         # [(base, count, routine, data_d, flags_d)]
    dir_lights: DirLightArrays,
    point_lights: PointLightArrays,
    shadow_values,                  # (L, H, W) or None
    uniforms: FrameUniformsArrays,
) -> jnp.ndarray:
    """Shade registered non-PBR archetypes over the shared G-buffer.

    The material channel carries a global slot (PBR table first, then each
    registered archetype's table); every routine shades the pixels whose
    slot falls in its range and the results overwrite the PBR image there
    (the reference's per-archetype draw vtable, material.rs:43-61, collapsed
    into image-space passes)."""
    from ..routine.registry import GBufferPixels

    if not extras:
        return img
    CH, H, W = gbuf.data.shape
    N = H * W
    g = gbuf.data.reshape(CH, N)
    hit = g[D.G_HIT] > 0.0
    den = g[D.G_DEN]
    inv_den = jnp.where(jnp.abs(den) < 1e-30, 1.0, 1.0 / den)

    def ch(off, n):
        return (g[off : off + n] * inv_den[None]).T

    pixels = GBufferPixels(
        view_pos=ch(D.G_VP, 3),
        nrm=ch(D.G_NRM, 3),
        tan=ch(D.G_TAN, 3),
        uv0=ch(D.G_UV0, 2),
        uv1=ch(D.G_UV1, 2),
        vcol=ch(D.G_COL, 4),
        hit=hit,
    )
    sv = (
        shadow_values.reshape(shadow_values.shape[0], N)
        if shadow_values is not None
        else None
    )
    midx = jnp.round(g[D.G_MAT]).astype(jnp.int32)
    out = img.reshape(N, 4)
    for base, count, routine, data_d, flags_d in extras:
        sel = hit & (midx >= base) & (midx < base + count)
        ml = jnp.clip(midx - base, 0, count - 1)
        mdata = _onehot_lookup(ml, data_d)
        mflags = jnp.round(
            _onehot_lookup(ml, flags_d[:, None].astype(jnp.float32))[:, 0]
        ).astype(jnp.int32)
        rgba = routine.shade(
            pixels, mdata, mflags, dir_lights, point_lights, sv, uniforms
        )
        out = jnp.where(sel[:, None], rgba, out)
    return out.reshape(H, W, 4)


def cutout_alpha_pass(
    gbuf: D.GBuffer,
    materials: PbrMaterialTable,
    textures,
    active_tex_slots,
    hw,
    *,
    tex_pair_cap: int = 16,
    interpret: bool = False,
    tex_queue_cap: int = None,
    extras=(),                      # [(base, count, routine, data_d, flags_d)]
):
    """Per-pixel cutout alpha test over a (padded) G-buffer: True where the
    pixel's fragment survives (alpha >= cutoff, or the material has no
    cutoff). The deferred-path equivalent of the reference's per-fragment
    discard (depth.wgsl:105-124); used by the cutout depth-peel loop.
    `extras` lists registered cutout-mode material routines whose pixels are
    alpha-tested via the routine's own alpha callback (the reference builds
    cutout pipelines per archetype, forward.rs:62-83).
    Returns ((H, W) bool, tex pair overflow, sampler step total)."""
    from .shade import PBR_ALPHA_CUTOUT, PBR_UVT0, TEX_ALBEDO, albedo_alpha

    H, W = hw
    CH = gbuf.data.shape[0]
    N = H * W
    g = gbuf.data.reshape(CH, N)
    den = g[D.G_DEN]
    inv_den = jnp.where(jnp.abs(den) < 1e-30, 1.0, 1.0 / den)

    # Planar (channels-first) like light_gbuffer: this pass runs once per
    # cutout peel at full resolution, so N-major padding costs multiply.
    def ch(off, n):
        return g[off : off + n] * inv_den[None]  # (n, N)

    uv0 = ch(D.G_UV0, 2)
    vcol = ch(D.G_COL, 4)
    midx_raw = jnp.round(g[D.G_MAT]).astype(jnp.int32)
    midx = jnp.clip(midx_raw, 0, materials.data.shape[0] - 1)
    mdata = _onehot_lookup_p(midx, materials.data)  # (D, N)
    mflags = jnp.round(
        _onehot_lookup_p(midx, materials.flags[:, None].astype(jnp.float32))[0]
    ).astype(jnp.int32)
    cutoff = mdata[PBR_ALPHA_CUTOUT]

    tex_a = None
    overflow = jnp.int32(0)
    qtotal = jnp.int32(0)
    if textures is not None and TEX_ALBEDO in tuple(active_tex_slots):
        from . import texture as tex_ops

        mtex = jnp.round(_onehot_lookup_p(midx, materials.textures.astype(jnp.float32))).astype(jnp.int32)
        # Analytic derivatives from the G-buffer (see light_gbuffer).
        duv = g[D.G_DUV : D.G_DUV + 4]  # (4, N) planar
        # Unrolled per-channel multiply-add, NOT einsum (see light_gbuffer).
        u, vv = uv0[0:1], uv0[1:2]
        coords = jnp.concatenate([
            mdata[PBR_UVT0 + 0:PBR_UVT0 + 1] * u + mdata[PBR_UVT0 + 1:PBR_UVT0 + 2] * vv + mdata[PBR_UVT0 + 2:PBR_UVT0 + 3],
            mdata[PBR_UVT0 + 3:PBR_UVT0 + 4] * u + mdata[PBR_UVT0 + 4:PBR_UVT0 + 5] * vv + mdata[PBR_UVT0 + 5:PBR_UVT0 + 6],
        ])  # (2, N)
        samples, overflow, qtotal = tex_ops.sample_textures_grid(
            textures, mtex, coords, duv, mflags, (H, W), (TEX_ALBEDO,),
            pair_cap=tex_pair_cap, interpret=interpret,
            hit=(g[D.G_HIT] > 0.0), queue_cap=tex_queue_cap, planar=True,
        )
        tex_a = samples[TEX_ALBEDO][3]

    alpha = albedo_alpha(mdata, mflags, vcol, tex_a)
    ok = (cutoff <= 0.0) | (alpha >= cutoff)
    if extras:
        from ..routine.registry import GBufferPixels

        # Registered-routine API is N-major (public seam); convert at the
        # boundary — extras are rare and never in the canonical hot frame.
        pixels = GBufferPixels(
            view_pos=ch(D.G_VP, 3).T, nrm=ch(D.G_NRM, 3).T, tan=ch(D.G_TAN, 3).T,
            uv0=uv0.T, uv1=ch(D.G_UV1, 2).T, vcol=vcol.T, hit=g[D.G_HIT] > 0.0,
        )
        for base, count, routine, data_d, flags_d in extras:
            sel = (midx_raw >= base) & (midx_raw < base + count)
            ml = jnp.clip(midx_raw - base, 0, count - 1)
            e_data = _onehot_lookup(ml, data_d)
            e_flags = jnp.round(
                _onehot_lookup(ml, flags_d[:, None].astype(jnp.float32))[:, 0]
            ).astype(jnp.int32)
            e_alpha = routine.alpha(pixels, e_data, e_flags)
            ok = jnp.where(sel, e_alpha >= routine.alpha_cutoff, ok)
    return ok.reshape(H, W), overflow, qtotal
