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

__all__ = [
    "TextureArrays",
    "build_texture_atlas",
    "build_texture_atlas_state",
    "gutter_block",
    "ShelfState",
    "build_cube_array",
    "sample_textures",
    "sample_textures_grid",
    "sample_cube",
    "NSLOT",
]

MAX_MIPS = 14
NSLOT = 10  # material texture slots (shade.TEX_* order)

# MXU dtype for the bilinear gather's select-and-lerp matmuls. bf16 runs the
# MXU ~4x faster than f32 on v5e (measured 123.5 -> 44.9 ms on the bench
# scene's 2-slot sampler); texel values and lerp weights carry <= 8
# significant bits of perceptual content and the golden suite (mae <= 0.004)
# gates the accuracy. The earlier Mosaic "Bad lhs type" failure was the
# package-global float32 matmul-precision stamping fp32 contract precision
# onto the bf16 dot — fixed by precision=DEFAULT at the dot itself.
# Override with REND3_TPU_TEX_DOT=f32 to fall back.
import os as _os

TEX_DOT_DTYPE = jnp.float32 if _os.environ.get("REND3_TPU_TEX_DOT") == "f32" else jnp.bfloat16


class TextureArrays(NamedTuple):
    atlas: jnp.ndarray       # (A_H, A_W, 4) f32 linear
    rects: jnp.ndarray       # (N+1, MAX_MIPS, 4) f32: x, y, w, h texels
    mip_counts: jnp.ndarray  # (N+1,) i32   (slot 0 = null texture)
    # Optional mxu_gather.build_bilinear_tiles relayout of the atlas, built
    # once per atlas change by the texture manager so the frame program
    # never pays the tiling reshuffle (the atlas is static across frames).
    tiles: Optional[jnp.ndarray] = None


class CubeArrays(NamedTuple):
    faces: jnp.ndarray       # (N+1, 6, E, E, 4) f32
    sizes: jnp.ndarray       # (N+1,) i32 actual face extent
    # MXU-sampler view: every face padded with a 1-texel REPLICATED border
    # (so the bilinear taps' edge clamping becomes plain in-grid reads) and
    # stacked row-wise, (4, (N+1)*6*(E+2), E+2); pre-tiled at upload time
    # like the 2D atlas (the tiling reshuffle must not run per frame).
    grid_planes: jnp.ndarray = None
    grid_tiles: jnp.ndarray = None


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


def gutter_block(mip: np.ndarray) -> np.ndarray:
    """(h+2, w+2, 4) block: the mip surrounded by a 1-texel WRAPPED gutter
    so bilinear taps at rect edges — including the floor tap at -1 — read
    the repeat-addressed texel with plain static +0/+1 offsets. This is
    what makes the MXU sampler's contiguous 2x2 footprint exact under
    repeat."""
    h, w = mip.shape[0], mip.shape[1]
    g = np.zeros((h + 2, w + 2, 4), dtype=np.float32)
    g[1 : h + 1, 1 : w + 1] = mip
    g[0, 1 : w + 1] = mip[h - 1]
    g[h + 1, 1 : w + 1] = mip[0]
    g[:, 0] = g[:, w]
    g[:, w + 1] = g[:, 1]
    return g


class ShelfState:
    """Incremental shelf packer state (texture atlas placements)."""

    def __init__(self, side: int = 4):
        self.side = side
        self.x = 0
        self.y = 0
        self.shelf_h = 0

    def place(self, w: int, h: int):
        """(x, y) for a w x h block, or None when the atlas is full."""
        if w > self.side:
            return None
        if self.x + w > self.side:
            self.x = 0
            self.y += self.shelf_h
            self.shelf_h = 0
        if self.y + h > self.side:
            return None
        pos = (self.x, self.y)
        self.x += w
        self.shelf_h = max(self.shelf_h, h)
        return pos


def build_texture_atlas_state(textures: Dict[int, object]):
    """Full shelf pack of every texture's gutter-bordered mips. Returns
    (atlas np, rects np, mip_counts np, ShelfState) — the state lets the
    manager place LATER adds incrementally (reference: incremental slot
    updates vs full rebuilds, managers/texture.rs)."""
    n_slots = (max(textures.keys()) + 1) if textures else 0
    entries = []  # (slot, mip, array)
    sizes = []
    for idx, t in textures.items():
        for mi, mip in enumerate(t.mips[:MAX_MIPS]):
            entries.append((idx, mi, mip))
            sizes.append((mip.shape[1] + 2, mip.shape[0] + 2))
    if entries:
        pos, (W, H) = _shelf_pack(sizes)
    else:
        pos, (W, H) = [], (4, 4)

    atlas = np.zeros((H, W, 4), dtype=np.float32)
    rects = np.zeros((n_slots + 1, MAX_MIPS, 4), dtype=np.float32)
    mip_counts = np.zeros(n_slots + 1, dtype=np.int32)
    max_y = 0
    for (idx, mi, mip), p in zip(entries, pos):
        x, y = p
        h, w = mip.shape[0], mip.shape[1]
        atlas[y : y + h + 2, x : x + w + 2] = gutter_block(mip)
        rects[idx + 1, mi] = (x + 1, y + 1, w, h)
        mip_counts[idx + 1] = max(mip_counts[idx + 1], mi + 1)
        max_y = max(max_y, y + h + 2)
    # Continue incremental placement on a fresh shelf below everything the
    # full pack used (sorted-shelf rows are not resumable exactly).
    state = ShelfState(side=W)
    state.y = max_y
    return atlas, rects, mip_counts, state


def build_texture_atlas(textures: Dict[int, object]) -> TextureArrays:
    atlas, rects, mip_counts, _ = build_texture_atlas_state(textures)
    return TextureArrays(
        atlas=jax.device_put(atlas),
        rects=jax.device_put(rects),
        mip_counts=jax.device_put(mip_counts),
    )


def build_cube_array(textures: Dict[int, object]) -> Optional[CubeArrays]:
    if not textures:
        return None
    from . import mxu_gather as mg

    n_slots = max(textures.keys()) + 1
    ext = max(t.mips[0].shape[1] for t in textures.values())
    P = ext + 2
    faces = np.zeros((n_slots + 1, 6, ext, ext, 4), dtype=np.float32)
    grid = np.zeros((n_slots + 1, 6, P, P, 4), dtype=np.float32)
    sizes = np.zeros(n_slots + 1, dtype=np.int32)
    for idx, t in textures.items():
        f = t.mips[0]
        e = f.shape[1]
        faces[idx + 1, :, :e, :e] = f
        sizes[idx + 1] = e
        # Replicated 1-texel border: the scalar sampler clamps each bilinear
        # tap to [0, e-1]; with base bx/by = tap0 + 1 in [0, e] the taps stay
        # inside the padded block and read the identical clamped texels.
        g = grid[idx + 1]
        g[:, 1 : e + 1, 1 : e + 1] = f
        g[:, 0, 1 : e + 1] = f[:, 0]
        g[:, e + 1, 1 : e + 1] = f[:, e - 1]
        g[:, :, 0] = g[:, :, 1]
        g[:, :, e + 1] = g[:, :, e]
    planes = jnp.moveaxis(
        jax.device_put(grid.reshape((n_slots + 1) * 6 * P, P, 4)), -1, 0
    )
    # bf16-at-rest, like the 2D atlas (core/managers/texture.py): the gather
    # kernel casts tile rows to TEX_DOT_DTYPE before its dot anyway, so
    # pre-casting the whole store at upload halves the dominant per-step
    # tile-block DMA instead of re-casting multi-MB tiles in every frame.
    tiles = jax.jit(
        lambda p: mg.build_bilinear_tiles(p).astype(TEX_DOT_DTYPE)
    )(planes)
    return CubeArrays(
        faces=jax.device_put(faces),
        sizes=jax.device_put(sizes),
        grid_planes=planes,
        grid_tiles=tiles,
    )


def _cube_face_coords(cube: CubeArrays, slot, dirs):
    """Shared face-selection + in-face uv math of sample_cube: returns
    (face (N,) i32, xf, yf (N,) f32 unfloored texel coords)."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1), jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5))
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    uc = jnp.where(is_x, jnp.where(x > 0, -z, z), jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    vc = jnp.where(is_y, jnp.where(y > 0, z, -z), -y)
    u = 0.5 * (uc / ma + 1.0)
    v = 0.5 * (vc / ma + 1.0)
    e = cube.sizes[slot].astype(jnp.float32)
    return face, u * e - 0.5, v * e - 0.5


def sample_cube_grid(
    cube: CubeArrays,
    slot,
    dirs_list,               # list of (N, 3) direction planes (one per MSAA sample)
    hw,                      # (H, W) pixel layout of each flat N axis
    valid_list=None,         # optional list of (N,) bool: sample only these
    *,
    pair_cap: int = 16,
    interpret: bool = False,
    queue_cap: int = None,
):
    """Cubemap bilinear sampling through the MXU gather sampler.

    Replaces sample_cube's per-pixel scalar gathers (4 taps x 2M pixels
    measured ~66 ms at 1080p — the single largest stage of the r4 frame)
    with one sample_grid_bilinear launch over the pre-tiled padded face
    grid built at upload time (build_cube_array). Exact vs sample_cube up
    to bilinear-lerp summation order.

    Returns (list of (N, 4) rgba per entry, needed pair cap, step total).
    """
    from . import mxu_gather as mg

    H, W = hw
    P = int(cube.faces.shape[2]) + 2
    q_bx, q_by, q_fx, q_fy, q_wt, q_valid = [], [], [], [], [], []
    for i, dirs in enumerate(dirs_list):
        face, xf, yf = _cube_face_coords(cube, slot, dirs)
        x0 = jnp.floor(xf)
        y0 = jnp.floor(yf)
        bx = x0.astype(jnp.int32) + 1
        by = (slot * 6 + face) * P + y0.astype(jnp.int32) + 1
        v = (
            jnp.ones(xf.shape[0], bool)
            if valid_list is None or valid_list[i] is None
            else valid_list[i]
        )
        q_bx.append(bx.reshape(H, W))
        q_by.append(by.reshape(H, W))
        q_fx.append((xf - x0).reshape(H, W))
        q_fy.append((yf - y0).reshape(H, W))
        q_wt.append(jnp.ones((H, W), jnp.float32))
        q_valid.append(v.reshape(H, W))

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    out, overflow, qtotal = mg.sample_grid_bilinear(
        cube.grid_planes, cat(q_bx), cat(q_by), cat(q_fx), cat(q_fy),
        cat(q_wt), cat(q_valid),
        pair_cap=pair_cap, interpret=interpret, tiles=cube.grid_tiles,
        queue_cap=queue_cap, dot_dtype=TEX_DOT_DTYPE,
    )
    out = out.reshape(4, len(dirs_list), H, W)
    return (
        [out[:, i].reshape(4, H * W).T for i in range(len(dirs_list))],
        overflow,
        qtotal,
    )


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
    face, xf, yf = _cube_face_coords(cube, slot, dirs)
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


def sample_textures_grid(
    tex: TextureArrays,
    mtex: jnp.ndarray,        # (N, NSLOT) — or (NSLOT, N) when planar=True
    coords: jnp.ndarray,      # (N, 2) uv — or (2, N) when planar=True
    duv,                      # (N, 2, 2) uv screen gradients — or (4, N)
                              # rows [du/dx, dv/dx, du/dy, dv/dy] — or None
    mflags: jnp.ndarray,      # (N,) material flags
    hw,                       # (H, W) pixel layout of the flat N axis
    active_slots,             # static tuple of slot indices to sample
    *,
    pair_cap: int = 16,
    interpret: bool = False,
    hit: jnp.ndarray = None,  # optional (N,) bool: only sample hit pixels
    dot_dtype=None,           # MXU dtype override (default TEX_DOT_DTYPE)
    queue_cap: int = None,    # adaptive sampler step-queue size
    planar: bool = False,     # channels-first in/out (TPU lane-friendly)
):
    """Deferred-path textureSampleGrad for (H, W)-organized pixels through
    the MXU bilinear gather (mxu_gather.sample_grid_bilinear).

    All active slots' trilinear queries (2 mip levels each) are stacked
    row-wise into ONE sampler call; the mip lerp weights ride in the
    per-query weight plane so the two returned mip samples just add.
    Returns (samples, overflow, qtotal): samples is a list of NSLOT
    entries, (N, 4) — (4, N) when planar=True — for active slots and None
    for inactive ones (callers treat None as "slot never present this
    frame"); qtotal is the raw sampler step count (adaptive queue_cap
    sizing). Internals are planar either way: per-pixel rect/mip tables
    ride (rows, N) so nothing pads the 128-lane minor dimension.
    """
    from .shade import MF  # local import to avoid cycle
    from . import mxu_gather as mg

    H, W = hw
    S = tex.rects.shape[0]
    rects_flat = tex.rects.reshape(S, MAX_MIPS * 4)

    if not planar:
        N = mtex.shape[0]
        mtex = mtex.T
        coords = coords.T
        duv = None if duv is None else duv.reshape(N, 4).T
    N = H * W

    u, v = coords[0], coords[1]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    nearest = (mflags & MF.NEAREST) != 0

    q_bx, q_by, q_fx, q_fy, q_wt, q_valid = [], [], [], [], [], []
    for q in active_slots:
        slv = mtex[q]
        s = jnp.clip(slv, 0, S - 1)
        oh = jax.nn.one_hot(s, S, dtype=jnp.float32, axis=0)          # (S, N)
        rect_all = jax.lax.dot_general(
            rects_flat, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                             # (M4, N)
        nmips = jnp.maximum(
            jnp.round(
                jax.lax.dot_general(
                    tex.mip_counts.astype(jnp.float32)[None, :], oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[0]
            ),
            1.0,
        )                                                             # (N,) f32

        if duv is not None:
            tw, th = rect_all[2], rect_all[3]
            dxu, dxv = duv[0] * tw, duv[1] * th
            dyu, dyv = duv[2] * tw, duv[3] * th
            rho = jnp.maximum(
                jnp.sqrt(dxu * dxu + dxv * dxv), jnp.sqrt(dyu * dyu + dyv * dyv)
            )
            lam = jnp.clip(jnp.log2(jnp.maximum(rho, 1e-12)), 0.0, nmips - 1.0)
        else:
            lam = jnp.zeros(N, jnp.float32)

        l0 = jnp.floor(lam)
        lf = lam - l0
        l0i = l0.astype(jnp.int32)
        l1i = jnp.minimum(l0i + 1, (nmips - 1.0).astype(jnp.int32))

        def pick(li):
            out = rect_all[0:4]
            for lv in range(1, MAX_MIPS):
                out = jnp.where((li == lv)[None, :], rect_all[4 * lv : 4 * lv + 4], out)
            return out

        valid0 = (slv > 0) if hit is None else ((slv > 0) & hit)
        for k, (li, wt) in enumerate(
            (
                (l0i, jnp.where(nearest, 1.0, 1.0 - lf)),
                (l1i, jnp.where(nearest, 0.0, lf)),
            )
        ):
            r = pick(li)
            rx, ry, rw, rh = r[0], r[1], r[2], r[3]
            # linear: floor tap of uu*rw - 0.5 (may be -1 -> left gutter)
            xf = uu * rw - 0.5
            yf = vv * rh - 0.5
            x0 = jnp.floor(xf)
            y0 = jnp.floor(yf)
            fx = xf - x0
            fy = yf - y0
            # nearest: exact texel, zero fractions
            xn = jnp.minimum(jnp.floor(uu * rw), rw - 1.0)
            yn = jnp.minimum(jnp.floor(vv * rh), rh - 1.0)
            bx = jnp.where(nearest, xn, x0) + rx
            by = jnp.where(nearest, yn, y0) + ry
            fx = jnp.where(nearest, 0.0, fx)
            fy = jnp.where(nearest, 0.0, fy)
            vq = valid0 if k == 0 else (valid0 & ~nearest & (lf > 0.0))
            q_bx.append(bx.astype(jnp.int32).reshape(H, W))
            q_by.append(by.astype(jnp.int32).reshape(H, W))
            q_fx.append(fx.reshape(H, W))
            q_fy.append(fy.reshape(H, W))
            q_wt.append(wt.reshape(H, W))
            q_valid.append(vq.reshape(H, W))

    if not q_bx:
        return [None] * NSLOT, jnp.int32(0), jnp.int32(0)

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    planes = jnp.moveaxis(tex.atlas, -1, 0)  # (4, AH, AW)
    out, overflow, qtotal = mg.sample_grid_bilinear(
        planes, cat(q_bx), cat(q_by), cat(q_fx), cat(q_fy), cat(q_wt), cat(q_valid),
        pair_cap=pair_cap, interpret=interpret,
        dot_dtype=TEX_DOT_DTYPE if dot_dtype is None else dot_dtype,
        tiles=tex.tiles, queue_cap=queue_cap,
    )
    out = out.reshape(4, len(q_bx), H, W)

    samples = [None] * NSLOT
    for i, q in enumerate(active_slots):
        res = (out[:, 2 * i] + out[:, 2 * i + 1]).reshape(4, N)     # (4, N)
        res = jnp.where((mtex[q] > 0)[None, :], res, 1.0)
        samples[q] = res if planar else res.T
    return samples, overflow, qtotal
