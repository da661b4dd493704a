"""rend3-tpu: a TPU-native, retained-mode 3D rendering framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of the reference
renderer (BVE-Reborn/rend3): handle-and-instruction scene API, mesh
megabuffer, PBR forward shading with shadow atlas, GPU-driven culling,
skinning, glTF loading — built on a software visibility-buffer rasterizer.
"""

import jax as _jax

# Vertex transforms and shading matrices must be true float32: TPU matmuls
# default to bfloat16 accumulation, which visibly shifts rasterized edges.
_jax.config.update("jax_default_matmul_precision", "float32")

from . import types  # noqa: F401
from .core.renderer import Renderer  # noqa: F401
from .types import Camera, Handedness, MeshBuilder, Object  # noqa: F401

__version__ = "0.1.0"
