"""rend3-tpu: a TPU-native, retained-mode 3D rendering framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of the reference
renderer (BVE-Reborn/rend3): handle-and-instruction scene API, mesh
megabuffer, PBR forward shading with shadow atlas, GPU-driven culling,
skinning, glTF loading — built on a software visibility-buffer rasterizer.
"""

from . import types  # noqa: F401
from .core.renderer import Renderer  # noqa: F401
from .types import Camera, Handedness, MeshBuilder, Object  # noqa: F401

__version__ = "0.1.0"
