"""Output conversion: HDR resolve, sRGB encode, quantization.

Counterpart of the reference's tonemapping blit
(rend3-routine/src/tonemapping.rs + shaders/src/blit.wgsl): the scene is
rendered to Rgba16Float, then blitted to the output surface. When the output
format is *-Srgb the hardware encoder applies the OETF; otherwise the shader
entry `fs_main_monitor` applies it. There is no tonemap operator yet in the
reference (tonemapping.rs:1-10) and none here.
"""

from __future__ import annotations

import jax.numpy as jnp

from .shade import srgb_scene_to_display

__all__ = ["resolve_samples", "hdr_to_srgb_u8", "f16_roundtrip"]


def f16_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize through f16 to mirror the Rgba16Float intermediate target."""
    return x.astype(jnp.float16).astype(jnp.float32)


def resolve_samples(img: jnp.ndarray) -> jnp.ndarray:
    """(S, H, W, 4) -> (H, W, 4) MSAA resolve (box average)."""
    return img.mean(axis=0)


def hdr_to_srgb_u8(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 4) linear -> (H, W, 4) u8 with sRGB-encoded color channels.

    Alpha is stored linearly (matches Rgba8UnormSrgb semantics)."""
    rgb = srgb_scene_to_display(jnp.clip(img[..., :3], 0.0, 1.0))
    a = jnp.clip(img[..., 3:4], 0.0, 1.0)
    out = jnp.concatenate([rgb, a], axis=-1)
    return jnp.round(out * 255.0).astype(jnp.uint8)
