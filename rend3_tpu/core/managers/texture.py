"""TextureManager (2D and cube instances).

Reference: rend3/src/managers/texture.rs — slot vector of textures, bindless
binding array, 1-based shader indices with 0 = null. The TPU equivalent of
"bindless" is a mip-chained texture *atlas*: every 2D texture's full mip
pyramid is packed into one (A, A, 4) float32 HBM array and sampled by
gathers (ops/texture.py). Cube textures are stacked (N, 6, E, E, 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ...types.texture import Texture, TextureFormat, MipmapCount, MipmapSource

__all__ = ["TextureManager", "InternalTexture"]


def _decode_to_linear_f32(tex: Texture) -> np.ndarray:
    """Convert uploaded bytes to linear float32 RGBA (EOTF for *-Srgb)."""
    data = tex.data
    if data.dtype == np.uint8:
        f = data.astype(np.float32) / 255.0
    else:
        f = data.astype(np.float32)
    if f.shape[-1] == 3:
        f = np.concatenate([f, np.ones(f.shape[:-1] + (1,), np.float32)], axis=-1)
    if tex.format.bgra:
        f = f[..., [2, 1, 0, 3]]
    if tex.format.srgb:
        rgb = f[..., :3]
        rgb = np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
        f = np.concatenate([rgb, f[..., 3:]], axis=-1)
    return f.astype(np.float32)


def _mip_chain(img: np.ndarray, levels: int) -> List[np.ndarray]:
    """2x2 box-filter mip chain (reference: rend3/shaders/mipmap.wgsl)."""
    mips = [img]
    cur = img
    for _ in range(1, levels):
        h, w = cur.shape[0], cur.shape[1]
        nh, nw = max(1, h // 2), max(1, w // 2)
        c = cur[: nh * 2, : nw * 2]
        cur = c.reshape(nh, 2, nw, 2, 4).mean(axis=(1, 3))
        mips.append(cur.astype(np.float32))
    return mips


@dataclass
class InternalTexture:
    size: Tuple[int, int]
    mips: List[np.ndarray]


class TextureManager:
    """One instance per dimensionality (d2 / cube), like the reference."""

    def __init__(self, kind: str = "d2"):
        self.kind = kind
        self.data: Dict[int, InternalTexture] = {}
        self.dirty = True
        self._device = None
        # Incremental 2D-atlas state: pending slot adds are shelf-placed
        # into the resident device atlas (jnp .at[].set) instead of
        # rebuilding it; removes only clear the rect table (holes reclaim
        # on the next forced full pack). Reference: managers/texture.rs
        # slot updates vs the old full rebuild.
        self._pending_adds: list = []
        self._shelf = None
        self._rects = None
        self._mip_counts = None
        self._atlas_dev = None

    def add(self, idx: int, tex: Texture) -> None:
        f = _decode_to_linear_f32(tex)
        if self.kind == "cube":
            assert f.ndim == 4 and f.shape[0] == 6, "cube texture needs (6, H, W, 4) data"
            if tex.mip_count == MipmapCount.MAXIMUM:
                levels = int(max(f.shape[1], f.shape[2])).bit_length()
            elif isinstance(tex.mip_count, int):
                levels = tex.mip_count
            else:
                levels = 1
            # Per-face box mip chain, stacked back to (6, h, w, 4) per level
            # (reference generates cube mips face-by-face the same way).
            chains = [_mip_chain(f[i], levels) for i in range(6)]
            mips = [np.stack([chains[i][l] for i in range(6)]) for l in range(levels)]
            self.data[idx] = InternalTexture(size=(f.shape[1], f.shape[2]), mips=mips)
        else:
            h, w = f.shape[0], f.shape[1]
            if tex.mip_count == MipmapCount.MAXIMUM:
                levels = int(max(h, w)).bit_length()
            elif isinstance(tex.mip_count, int):
                levels = tex.mip_count
            else:
                levels = 1
            self.data[idx] = InternalTexture(size=(h, w), mips=_mip_chain(f, levels))
            self._pending_adds.append(idx)
        self.dirty = True

    def add_from(self, idx: int, src_idx: int, start_mip: int, mip_count) -> None:
        """New texture as a mip-range view of another
        (reference: rend3/src/managers/texture.rs:198-242 TextureFromTexture;
        a GPU blit there, a mip-list slice here)."""
        src = self.data[src_idx]
        end = len(src.mips) if mip_count is None else start_mip + mip_count
        mips = [m.copy() for m in src.mips[start_mip:end]]
        assert mips, "TextureFromTexture: empty mip range"
        self.data[idx] = InternalTexture(size=(mips[0].shape[0], mips[0].shape[1]), mips=mips)
        self._pending_adds.append(idx)
        self.dirty = True

    def remove(self, idx: int) -> None:
        self.data.pop(idx, None)
        if idx in self._pending_adds:
            self._pending_adds.remove(idx)
        elif self.kind == "d2" and self._rects is not None and idx + 1 < len(self._rects):
            self._rects[idx + 1] = 0.0
            self._mip_counts[idx + 1] = 0
        self.dirty = True

    def shader_index(self, handle) -> int:
        """1-based shader index; 0 reserved for 'no texture'
        (reference: texture.rs translation_fn)."""
        return handle.idx + 1

    def _full_pack(self, tex_ops):
        import jax

        atlas, rects, mip_counts, shelf = tex_ops.build_texture_atlas_state(self.data)
        self._rects = rects
        self._mip_counts = mip_counts
        self._shelf = shelf
        self._atlas_dev = jax.device_put(atlas)
        self._pending_adds.clear()

    def _try_incremental(self, tex_ops) -> bool:
        """Place pending adds into the resident atlas; False -> repack."""
        import jax.numpy as jnp

        n_slots = (max(self.data.keys()) + 1) if self.data else 0
        if n_slots + 1 > len(self._rects):
            grown_r = np.zeros((n_slots + 1, tex_ops.MAX_MIPS, 4), np.float32)
            grown_r[: len(self._rects)] = self._rects
            self._rects = grown_r
            grown_m = np.zeros(n_slots + 1, np.int32)
            grown_m[: len(self._mip_counts)] = self._mip_counts
            self._mip_counts = grown_m
        placements = []
        for idx in self._pending_adds:
            t = self.data.get(idx)
            if t is None:
                continue
            for mi, mip in enumerate(t.mips[: tex_ops.MAX_MIPS]):
                h, w = mip.shape[0], mip.shape[1]
                pos = self._shelf.place(w + 2, h + 2)
                if pos is None:
                    return False
                placements.append((idx, mi, mip, pos))
        atlas = self._atlas_dev
        for idx, mi, mip, (x, y) in placements:
            h, w = mip.shape[0], mip.shape[1]
            atlas = atlas.at[y : y + h + 2, x : x + w + 2].set(
                jnp.asarray(tex_ops.gutter_block(mip))
            )
            self._rects[idx + 1, mi] = (x + 1, y + 1, w, h)
            self._mip_counts[idx + 1] = max(self._mip_counts[idx + 1], mi + 1)
        self._atlas_dev = atlas
        self._pending_adds.clear()
        return True

    def evaluate(self):
        """Build/refresh the device texture arrays; see ops/texture.py."""
        if not self.dirty and self._device is not None:
            return self._device
        import jax

        from ...ops import texture as tex_ops

        if self.kind == "cube":
            self._device = tex_ops.build_cube_array(self.data)
        else:
            if self._atlas_dev is None or not self._try_incremental(tex_ops):
                self._full_pack(tex_ops)
            # Pre-tile the atlas for the MXU bilinear sampler here — once
            # per atlas CHANGE — so the per-frame program never pays the
            # hundreds-of-MB tiling reshuffle of a static source.
            import jax.numpy as jnp

            from ...ops import mxu_gather as mg

            planes = jnp.moveaxis(self._atlas_dev, -1, 0)
            # Stored in the sampler's MXU dtype (bf16 by default): the
            # gather kernel casts tile rows to TEX_DOT_DTYPE before its dot
            # anyway, so a bf16-at-rest atlas is numerically IDENTICAL and
            # halves the dominant per-step tile-block DMA.
            tiles = jax.jit(
                lambda p: mg.build_bilinear_tiles(p).astype(tex_ops.TEX_DOT_DTYPE)
            )(planes)
            self._device = tex_ops.TextureArrays(
                atlas=self._atlas_dev,
                rects=jax.device_put(self._rects),
                mip_counts=jax.device_put(self._mip_counts),
                tiles=tiles,
            )
        self.dirty = False
        return self._device
