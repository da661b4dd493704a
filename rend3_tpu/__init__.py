"""rend3-tpu: a TPU-native, retained-mode 3D rendering framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of the reference
renderer (BVE-Reborn/rend3): handle-and-instruction scene API, mesh
megabuffer, PBR forward shading with shadow atlas, GPU-driven culling,
skinning, glTF loading — built on a software visibility-buffer rasterizer.
"""

import os as _os

import jax as _jax

# Vertex transforms and shading matrices must be true float32: TPU matmuls
# default to bfloat16 accumulation, which visibly shifts rasterized edges.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: whole-frame TPU compiles cost minutes;
# caching them on disk means a process restart (or a bench re-run) replays
# the compile from cache instead of re-paying it. Opt out with
# REND3_TPU_COMPILE_CACHE=0; point elsewhere with a path value.
_cache = _os.environ.get(
    "REND3_TPU_COMPILE_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "rend3_tpu_xla"),
)
if _cache and _cache != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these keys: run uncached
        pass

from . import types  # noqa: F401
from .core.renderer import Renderer  # noqa: F401
from .types import Camera, Handedness, MeshBuilder, Object  # noqa: F401

__version__ = "0.1.0"
