"""2D overlay (UI) routine — the rend3-egui equivalent.

Reference: rend3-egui/src/lib.rs:16-175 (EguiRenderRoutine: screen-space
textured, vertex-colored, alpha-blended triangle meshes composited over the
rendered frame, with per-mesh clip rects and a managed UI texture set, e.g.
the egui font atlas).

TPU redesign: paint jobs arrive from the host every frame (UI meshes are
tiny and dynamic — the opposite of scene geometry), so each triangle is
rasterized into a fixed-size window around its bbox with a lax.scan and
composited in order via dynamic_update_slice; triangles larger than the
window fall back to a full-image pass (background panels — few). This keeps
the per-frame cost proportional to covered UI pixels, not the frame.
Compositing happens in display (sRGB u8) space with straight alpha, like
egui's own software blending.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["OverlayRoutine", "PaintJob"]

WIN = 128  # windowed-raster extent (px); larger triangles take the full-image path


@dataclass
class PaintJob:
    """One UI mesh (egui ClippedPrimitive equivalent)."""

    vertices: np.ndarray            # (V, 2) f32 pixel positions
    colors: np.ndarray              # (V, 4) u8 straight-alpha sRGB
    indices: np.ndarray             # (T, 3) u32
    uvs: Optional[np.ndarray] = None      # (V, 2) f32 in [0,1], or None
    texture: Optional[int] = None         # id from add_texture
    clip_rect: Optional[Tuple[float, float, float, float]] = None  # x0,y0,x1,y1


class OverlayRoutine:
    def __init__(self):
        self._textures: Dict[int, np.ndarray] = {}
        self._next = 0

    def add_texture(self, image: np.ndarray) -> int:
        """Register a UI texture ((H, W, 4) u8, e.g. the egui font atlas)."""
        tid = self._next
        self._next += 1
        self._textures[tid] = np.asarray(image, np.uint8)
        return tid

    def update_texture(self, tid: int, image: np.ndarray) -> None:
        self._textures[tid] = np.asarray(image, np.uint8)

    def remove_texture(self, tid: int) -> None:
        self._textures.pop(tid, None)

    def render(self, frame: np.ndarray, jobs: List[PaintJob]) -> np.ndarray:
        """Composite paint jobs over frame ((H, W, 3/4) u8) in order."""
        frame = np.asarray(frame)
        H, W = frame.shape[:2]
        out = self.composite(jnp.asarray(frame[..., :3].astype(np.float32)), jobs, H, W)
        res = np.asarray(jax.device_get(jnp.clip(jnp.rint(out), 0, 255))).astype(np.uint8)
        if frame.shape[-1] == 4:
            return np.concatenate([res, frame[..., 3:]], axis=-1)
        return res

    def composite(self, out, jobs: List[PaintJob], H: int, W: int):
        """Composite jobs in order over a float (H, W, 3) display-space image."""
        for job in jobs:
            out = self._render_job(out, job, H, W)
        return out

    def bake(self, jobs: List[PaintJob], width: int, height: int):
        """Flatten jobs ONCE into (P, A): P (H, W, 3) f32 premultiplied
        display-space color composited over a transparent canvas and
        A (H, W, 1) f32 total coverage, such that `P + (1 - A) * dst`
        equals compositing the jobs over dst in order (premultiplied-over
        algebra; the iterative over-black composite IS the premultiplied
        accumulation). A comes from a second composite with every vertex
        color and texture texel whitened (rgb=255, alpha kept)."""
        import dataclasses

        zeros = jnp.zeros((height, width, 3), jnp.float32)
        P = self.composite(zeros, jobs, height, width)
        white = OverlayRoutine()
        white._textures = {
            tid: np.concatenate(
                [np.full_like(t[..., :3], 255), t[..., 3:]], axis=-1
            )
            for tid, t in self._textures.items()
        }
        white._next = self._next
        wjobs = []
        for job in jobs:
            wc = np.asarray(job.colors, np.uint8).copy()
            wc[:, :3] = 255
            wjobs.append(dataclasses.replace(job, colors=wc))
        A = white.composite(zeros, wjobs, height, width)[..., :1] / 255.0
        return P, A

    def device_pass(self, jobs: List[PaintJob], width: int, height: int):
        """Bake jobs and return a device pass for
        BaseRenderGraph.register_pass: the overlay composites INSIDE the
        jitted frame program (reference draws egui in the renderpass,
        rend3-egui/src/lib.rs:52-94) instead of on the host after
        device_get. The pass takes row0 (4-parameter form) so each chip
        alpha-blits its own band's rows under multi-chip sharding. Static
        UI only — rebaking means a new closure and a frame recompile; keep
        per-frame dynamic UI on the host compositor."""
        P, A = self.bake(jobs, width, height)
        Pd = jnp.asarray(P)
        Ad = jnp.asarray(A)

        def overlay_pass(img, gbuf, uniforms, row0):
            bh = img.shape[0]
            Pb = jax.lax.dynamic_slice(Pd, (row0, 0, 0), (bh, width, 3))
            Ab = jax.lax.dynamic_slice(Ad, (row0, 0, 0), (bh, width, 1))
            rgb = img[..., :3].astype(jnp.float32)
            out = jnp.clip(jnp.rint(Pb + (1.0 - Ab) * rgb), 0, 255).astype(jnp.uint8)
            return jnp.concatenate([out, img[..., 3:]], axis=-1)

        return overlay_pass

    # -- internals ----------------------------------------------------------

    def _render_job(self, out, job: PaintJob, H: int, W: int):
        v = np.asarray(job.vertices, np.float32)
        col = np.asarray(job.colors, np.float32) / 255.0
        idx = np.asarray(job.indices, np.int64).reshape(-1, 3)
        uv = np.asarray(job.uvs, np.float32) if job.uvs is not None else None
        tex = (
            jnp.asarray(self._textures[job.texture].astype(np.float32))
            if job.texture is not None and job.texture in self._textures
            else None
        )
        clip = job.clip_rect or (0.0, 0.0, float(W), float(H))

        # Host-side split: triangles whose bbox fits the window raster there;
        # the rest (background panels) go full-image.
        p = v[idx]                                    # (T, 3, 2)
        bbmin = p.min(axis=1)
        bbmax = p.max(axis=1)
        win_w = min(WIN, W)
        win_h = min(WIN, H)
        small = ((bbmax - bbmin) < [win_w - 1, win_h - 1]).all(axis=1)

        def tri_arrays(sel):
            t = idx[sel]
            return (
                jnp.asarray(v[t]),                                    # (T, 3, 2)
                jnp.asarray(col[t]),                                  # (T, 3, 4)
                jnp.asarray(uv[t]) if uv is not None else None,       # (T, 3, 2)
            )

        if small.any():
            origin = np.clip(np.floor(bbmin[small]), 0, [W - win_w, H - win_h])
            out = _scan_windowed(
                out, *tri_arrays(small), jnp.asarray(origin.astype(np.int32)),
                tex, clip, win_h, win_w,
            )
        if (~small).any():
            out = _scan_full(out, *tri_arrays(~small), tex, clip)
        return out


def _shade(px, py, pv, pc, puv, tex, clip):
    """Coverage + color of one triangle at pixel grids px/py (2D)."""
    x0, y0 = pv[0, 0], pv[0, 1]
    x1, y1 = pv[1, 0], pv[1, 1]
    x2, y2 = pv[2, 0], pv[2, 1]
    e0 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    e1 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    e2 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    # Orientation-normalized edge tests with the wgpu top-left fill rule
    # (ops/raster._top_left) so a quad's shared diagonal never double-blends.
    sgn = jnp.where(area >= 0.0, 1.0, -1.0)

    def tl(ax_, ay_, bx_, by_):
        dxe = (bx_ - ax_) * sgn
        dye = (by_ - ay_) * sgn
        return ((dye == 0.0) & (dxe > 0.0)) | (dye < 0.0)

    def edge_in(e, ax_, ay_, bx_, by_):
        es = e * sgn
        return (es > 0.0) | ((es == 0.0) & tl(ax_, ay_, bx_, by_))

    inside = (
        edge_in(e0, x0, y0, x1, y1)
        & edge_in(e1, x1, y1, x2, y2)
        & edge_in(e2, x2, y2, x0, y0)
        & (area != 0.0)
    )
    inside &= (px >= clip[0]) & (px < clip[2]) & (py >= clip[1]) & (py < clip[3])
    inv = 1.0 / jnp.where(area == 0.0, 1.0, area)
    l0 = e1 * inv
    l1 = e2 * inv
    l2 = e0 * inv
    rgba = (
        l0[..., None] * pc[0] + l1[..., None] * pc[1] + l2[..., None] * pc[2]
    )
    if puv is not None and tex is not None:
        u = l0 * puv[0, 0] + l1 * puv[1, 0] + l2 * puv[2, 0]
        vv = l0 * puv[0, 1] + l1 * puv[1, 1] + l2 * puv[2, 1]
        th, tw = tex.shape[0], tex.shape[1]
        xi = jnp.clip((u * tw).astype(jnp.int32), 0, tw - 1)
        yi = jnp.clip((vv * th).astype(jnp.int32), 0, th - 1)
        rgba = rgba * tex[yi, xi] / 255.0
    return inside, rgba


def _scan_windowed(out, tv, tc, tuv, origins, tex, clip, win_h, win_w):
    ys = jnp.arange(win_h, dtype=jnp.float32)
    xs = jnp.arange(win_w, dtype=jnp.float32)

    def body(img, tri):
        if tuv is None:
            pv, pc, org = tri
            puv = None
        else:
            pv, pc, puv, org = tri
        win = jax.lax.dynamic_slice(img, (org[1], org[0], 0), (win_h, win_w, 3))
        py = ys[:, None] + org[1].astype(jnp.float32) + 0.5
        px = xs[None, :] + org[0].astype(jnp.float32) + 0.5
        inside, rgba = _shade(px, py, pv, pc, puv, tex, clip)
        a = jnp.where(inside, rgba[..., 3], 0.0)[..., None]
        blended = rgba[..., :3] * 255.0 * a + win * (1.0 - a)
        return jax.lax.dynamic_update_slice(img, blended, (org[1], org[0], 0)), None

    tris = (tv, tc, origins) if tuv is None else (tv, tc, tuv, origins)
    out, _ = jax.lax.scan(body, out, tris)
    return out


def _scan_full(out, tv, tc, tuv, tex, clip):
    H, W = out.shape[0], out.shape[1]
    py = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    px = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5

    def body(img, tri):
        if tuv is None:
            pv, pc = tri
            puv = None
        else:
            pv, pc, puv = tri
        inside, rgba = _shade(px, py, pv, pc, puv, tex, clip)
        a = jnp.where(inside, rgba[..., 3], 0.0)[..., None]
        return rgba[..., :3] * 255.0 * a + img * (1.0 - a), None

    tris = (tv, tc) if tuv is None else (tv, tc, tuv)
    out, _ = jax.lax.scan(body, out, tris)
    return out
