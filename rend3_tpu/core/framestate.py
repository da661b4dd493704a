"""Device-resident frame state.

The TPU redesign of the reference's GPU buffers: every manager owns a slice of
this pytree — dense SoA jnp arrays with power-of-two static capacities
(mirroring the reference's pow2 buffer discipline, e.g.
rend3/src/managers/mesh.rs:264-308) so the jitted frame program recompiles
only on capacity growth, never on content change.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "GeometryArrays",
    "TriTable",
    "ObjectTable",
    "FrameState",
    "ATTR_ORDER",
]

# Attribute order for the per-object base-offset table (matches the
# reference's vertex_attribute_start_offsets idea,
# rend3/src/managers/object.rs:236-300).
ATTR_ORDER = ("position", "normal", "tangent", "texture_coords_0", "texture_coords_1", "color_0")


class GeometryArrays(NamedTuple):
    """The mesh megabuffer: one dense arena per vertex attribute
    (reference: rend3/src/managers/mesh.rs single megabuffer)."""

    position: jnp.ndarray  # (V, 3) f32
    normal: jnp.ndarray    # (V, 3) f32
    tangent: jnp.ndarray   # (V, 3) f32
    uv0: jnp.ndarray       # (V, 2) f32
    uv1: jnp.ndarray       # (V, 2) f32
    color0: jnp.ndarray    # (V, 4) f32


class TriTable(NamedTuple):
    """Flat triangle list (mesh-local corner indices + owning object)."""

    vlocal: jnp.ndarray  # (T, 3) i32 mesh-local vertex indices
    obj: jnp.ndarray     # (T,) i32 object id, -1 = padding


class ObjectTable(NamedTuple):
    """ShaderObject SoA (reference: rend3/src/managers/object.rs:23-36)."""

    transform: jnp.ndarray  # (O, 4, 4) f32 model->world
    enabled: jnp.ndarray    # (O,) bool
    material: jnp.ndarray   # (O,) i32 slot in the material table
    # Per-attribute arena base offsets; -1 = attribute missing -> default.
    bases: jnp.ndarray      # (O, len(ATTR_ORDER)) i32


class FrameState(NamedTuple):
    """Everything the jitted frame program reads. All arrays device-resident."""

    geometry: GeometryArrays
    opaque_tris: TriTable     # opaque + cutout triangles
    blend_tris: TriTable      # alpha-blended triangles (sorted back-to-front)
    objects: ObjectTable
    material_data: jnp.ndarray      # (M, D) f32
    material_flags: jnp.ndarray     # (M,) i32
    material_textures: jnp.ndarray  # (M, 10) i32
