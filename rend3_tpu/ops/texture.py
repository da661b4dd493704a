"""Texture atlas + filtered sampling.

The TPU replacement for bindless `binding_array` textures (reference:
rend3/src/managers/texture.rs): every 2D texture's mip pyramid is shelf-packed
into one (A, A, 4) float32 HBM atlas; a per-(texture, mip) rect table drives
gather-based bilinear/trilinear sampling with repeat addressing, emulating
`textureSampleGrad` (opaque.wgsl texture helpers).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TextureArrays", "build_texture_atlas", "build_cube_array", "sample_textures", "sample_cube"]

MAX_MIPS = 14


class TextureArrays(NamedTuple):
    atlas: jnp.ndarray       # (A_H, A_W, 4) f32 linear
    rects: jnp.ndarray       # (N+1, MAX_MIPS, 4) f32: x, y, w, h texels
    mip_counts: jnp.ndarray  # (N+1,) i32   (slot 0 = null texture)


class CubeArrays(NamedTuple):
    faces: jnp.ndarray       # (N+1, 6, E, E, 4) f32
    sizes: jnp.ndarray       # (N+1,) i32 actual face extent


def _shelf_pack(sizes):
    """Simple shelf packer; sizes: [(w, h)] -> (positions, (W, H)) pow2 square-ish."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i][1])
    total_area = sum(w * h for w, h in sizes) or 1
    side = 1
    while side * side < total_area * 1.2:
        side *= 2
    while True:
        pos = [None] * len(sizes)
        x = y = shelf_h = 0
        ok = True
        for i in order:
            w, h = sizes[i]
            if w > side:
                ok = False
                break
            if x + w > side:
                x = 0
                y += shelf_h
                shelf_h = 0
            if y + h > side:
                ok = False
                break
            pos[i] = (x, y)
            x += w
            shelf_h = max(shelf_h, h)
        if ok:
            return pos, (side, side)
        side *= 2


def build_texture_atlas(textures: Dict[int, object]) -> TextureArrays:
    """textures: manager dict idx -> InternalTexture(mips=[...])."""
    n_slots = (max(textures.keys()) + 1) if textures else 0
    entries = []  # (slot, mip, array)
    sizes = []
    for idx, t in textures.items():
        for mi, mip in enumerate(t.mips[:MAX_MIPS]):
            entries.append((idx, mi, mip))
            sizes.append((mip.shape[1], mip.shape[0]))
    if entries:
        pos, (W, H) = _shelf_pack(sizes)
    else:
        pos, (W, H) = [], (4, 4)

    atlas = np.zeros((H, W, 4), dtype=np.float32)
    rects = np.zeros((n_slots + 1, MAX_MIPS, 4), dtype=np.float32)
    mip_counts = np.zeros(n_slots + 1, dtype=np.int32)
    for (idx, mi, mip), p in zip(entries, pos):
        x, y = p
        h, w = mip.shape[0], mip.shape[1]
        atlas[y : y + h, x : x + w] = mip
        rects[idx + 1, mi] = (x, y, w, h)
        mip_counts[idx + 1] = max(mip_counts[idx + 1], mi + 1)

    return TextureArrays(
        atlas=jax.device_put(atlas),
        rects=jax.device_put(rects),
        mip_counts=jax.device_put(mip_counts),
    )


def build_cube_array(textures: Dict[int, object]) -> Optional[CubeArrays]:
    if not textures:
        return None
    n_slots = max(textures.keys()) + 1
    ext = max(t.mips[0].shape[1] for t in textures.values())
    faces = np.zeros((n_slots + 1, 6, ext, ext, 4), dtype=np.float32)
    sizes = np.zeros(n_slots + 1, dtype=np.int32)
    for idx, t in textures.items():
        f = t.mips[0]
        e = f.shape[1]
        faces[idx + 1, :, :e, :e] = f
        sizes[idx + 1] = e
    return CubeArrays(faces=jax.device_put(faces), sizes=jax.device_put(sizes))


def _bilinear_from_rect(atlas, rect, u, v):
    """Sample atlas bilinearly at repeat-addressed uv inside rect (..., 4)."""
    rx, ry, rw, rh = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]
    # repeat addressing
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    xf = uu * rw - 0.5
    yf = vv * rh - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    fx = (xf - x0)[..., None]
    fy = (yf - y0)[..., None]

    def fetch(xi, yi):
        # wrap texel coords inside the rect (repeat addressing)
        xi = jnp.where(rw > 0, jnp.remainder(xi, jnp.maximum(rw, 1.0)), 0.0)
        yi = jnp.where(rh > 0, jnp.remainder(yi, jnp.maximum(rh, 1.0)), 0.0)
        ax = jnp.clip((rx + xi).astype(jnp.int32), 0, atlas.shape[1] - 1)
        ay = jnp.clip((ry + yi).astype(jnp.int32), 0, atlas.shape[0] - 1)
        return atlas[ay, ax]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def _nearest_from_rect(atlas, rect, u, v):
    rx, ry, rw, rh = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    xi = jnp.minimum(jnp.floor(uu * rw), rw - 1)
    yi = jnp.minimum(jnp.floor(vv * rh), rh - 1)
    ax = jnp.clip((rx + xi).astype(jnp.int32), 0, atlas.shape[1] - 1)
    ay = jnp.clip((ry + yi).astype(jnp.int32), 0, atlas.shape[0] - 1)
    return atlas[ay, ax]


def sample_textures(tex: TextureArrays, slots: jnp.ndarray, uv: jnp.ndarray, duv, mflags) -> jnp.ndarray:
    """textureSampleGrad emulation.

    slots: (N,) 1-based texture ids (0 = none -> returns 1.0 like an unbound
    white texture; callers mask by `has_*`); uv: (N, 2); duv: (N, 2, 2) or
    None; mflags for the NEAREST material flag. Returns (N, 4).
    """
    from .shade import MF  # local import to avoid cycle

    s = jnp.clip(slots, 0, tex.rects.shape[0] - 1)
    nmips = jnp.maximum(tex.mip_counts[s], 1)

    if duv is not None:
        base_rect = tex.rects[s, 0]
        tw, th = base_rect[..., 2], base_rect[..., 3]
        dx = duv[:, 0] * jnp.stack([tw, th], -1)
        dy = duv[:, 1] * jnp.stack([tw, th], -1)
        rho = jnp.maximum(
            jnp.sqrt((dx * dx).sum(-1)), jnp.sqrt((dy * dy).sum(-1))
        )
        lam = jnp.log2(jnp.maximum(rho, 1e-12))
        lam = jnp.clip(lam, 0.0, (nmips - 1).astype(jnp.float32))
    else:
        lam = jnp.zeros(uv.shape[0], jnp.float32)

    l0 = jnp.floor(lam)
    lf = (lam - l0)[..., None]
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, nmips - 1)

    u, v = uv[:, 0], uv[:, 1]
    nearest = (mflags & MF.NEAREST) != 0

    r0 = tex.rects[s, l0i]
    r1 = tex.rects[s, l1i]
    c_lin = _bilinear_from_rect(tex.atlas, r0, u, v) * (1 - lf) + _bilinear_from_rect(tex.atlas, r1, u, v) * lf
    c_near = _nearest_from_rect(tex.atlas, r0, u, v)
    out = jnp.where(nearest[:, None], c_near, c_lin)
    return jnp.where((slots > 0)[:, None], out, 1.0)


def sample_cube(cube: CubeArrays, slot: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Cubemap sample with bilinear filtering, wgpu face conventions.

    dirs: (N, 3) world directions; returns (N, 4).
    Face order: +X, -X, +Y, -Y, +Z, -Z.
    """
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1), jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5))
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)

    # uc, vc per the standard cubemap layout
    uc = jnp.where(is_x, jnp.where(x > 0, -z, z), jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    vc = jnp.where(is_y, jnp.where(y > 0, z, -z), -y)

    u = 0.5 * (uc / ma + 1.0)
    v = 0.5 * (vc / ma + 1.0)

    e = cube.sizes[slot].astype(jnp.float32)
    xf = u * e - 0.5
    yf = v * e - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    fx = (xf - x0)[..., None]
    fy = (yf - y0)[..., None]

    faces = cube.faces[slot]

    def fetch(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, cube.sizes[slot] - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, cube.sizes[slot] - 1)
        return faces[face, yi, xi]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy
