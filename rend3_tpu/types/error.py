"""Typed renderer errors.

Behavioral port of rend3/src/renderer/error.rs:6-52 re-grounded in the TPU
runtime: adapter/limit/feature failures become backend/HBM/compile
failures. Raised instead of letting raw XLA exceptions escape the public
API surface.
"""

from __future__ import annotations

__all__ = [
    "RendererError",
    "RendererInitializationError",
    "DeviceLimitError",
    "DeviceOutOfMemoryError",
    "MeshValidationError",
    "AssetError",
]


class RendererError(Exception):
    """Base class for all typed renderer errors."""


class RendererInitializationError(RendererError):
    """No usable accelerator backend (the reference's MissingAdapter /
    RequestDeviceFailed)."""


class DeviceLimitError(RendererError):
    """A resource exceeds what the device can hold (the reference's
    LowDeviceLimit): e.g. a texture larger than the atlas can grow to."""

    def __init__(self, what: str, requested: int, limit: int):
        self.what = what
        self.requested = requested
        self.limit = limit
        super().__init__(
            f"device limit exceeded for {what}: requested {requested}, limit {limit}"
        )


class DeviceOutOfMemoryError(RendererError):
    """HBM allocation failure surfaced from XLA with renderer context."""


class AssetError(RendererError):
    """Asset fetch failure (rend3-framework/src/assets.rs:8-20 AssetError);
    subclassed by the framework's file/network variants."""


# Re-export the existing mesh validation error under the typed family.
from .mesh import MeshValidationError  # noqa: E402
