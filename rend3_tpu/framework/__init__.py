"""Application framework (counterpart of rend3-framework).

Reference: rend3-framework/src/lib.rs — the App trait + start(): build
renderer, shader infrastructure, base graph and default routines, call the
app's setup(), then run the frame loop. Windowing is replaced by offscreen
rendering to PNG (the headless path rend3's own example tests use,
examples/src/tests.rs:16-88); a live viewer can wrap `render_once`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..core.renderer import Renderer
from ..routine.base import BaseRenderGraph, BaseRenderGraphSettings, FrameRenderTarget
from ..types import Handedness, SampleCount
from .assets import AssetLoader, AssetPath

__all__ = [
    "App",
    "SetupContext",
    "RedrawContext",
    "start",
    "render_single_frame",
    "AssetLoader",
    "AssetPath",
]


@dataclass
class SetupContext:
    renderer: Renderer
    base_graph: BaseRenderGraph
    resolution: tuple
    overlay: object = None       # OverlayRoutine — register UI textures here
    loader: AssetLoader = None   # AssetLoader for the app's base path


@dataclass
class RedrawContext:
    renderer: Renderer
    base_graph: BaseRenderGraph
    resolution: tuple
    delta_t_seconds: float
    elapsed: float
    overlay: object = None


class App:
    """Subclass and override; mirrors rend3_framework::App."""

    HANDEDNESS = Handedness.LEFT

    def sample_count(self) -> int:
        return 1

    def ambient_color(self):
        return (0.0, 0.0, 0.0, 0.0)

    def clear_color(self):
        return (0.0, 0.0, 0.0, 1.0)

    def skybox_slot(self) -> Optional[int]:
        return None

    def asset_base(self) -> str:
        """Base path for the AssetLoader handed to setup() (the reference's
        new_local base file path, assets.rs:41-54)."""
        return ""

    def setup(self, context: SetupContext) -> None:  # pragma: no cover
        pass

    def handle_redraw(self, context: RedrawContext) -> None:
        """Per-frame scene mutation (animation etc.); default no-op."""

    #: When True, overlay_jobs are baked once and composited ON DEVICE
    #: inside the jitted frame program via register_pass (the reference
    #: draws egui in the renderpass, rend3-egui/src/lib.rs:52-94). The
    #: bake is keyed on job + texture content, so STATIC UI costs one
    #: registration (a compile) and then rides every frame for free;
    #: per-frame-changing UI should leave this False (host compositor —
    #: rebaking would recompile the frame each time).
    OVERLAY_ON_DEVICE = False

    def overlay_jobs(self, context: RedrawContext) -> list:
        """UI paint jobs (overlay.PaintJob) composited over this frame —
        the rend3-egui integration point (the reference adds the egui node
        after the tonemap node, rend3-egui/src/lib.rs:16-60). Return an
        empty list for no overlay."""
        return []


def _overlay_key(overlay_routine, jobs) -> str:
    """Content hash of paint jobs + registered UI textures: the on-device
    overlay pass rebakes (and the frame recompiles) only when this changes."""
    import hashlib

    h = hashlib.sha1()
    for job in jobs:
        for arr in (job.vertices, job.colors, job.indices):
            h.update(np.ascontiguousarray(arr).tobytes())
        if job.uvs is not None:
            h.update(np.ascontiguousarray(job.uvs).tobytes())
        h.update(repr((job.texture, job.clip_rect)).encode())
    for tid in sorted(overlay_routine._textures):
        h.update(str(tid).encode())
        h.update(overlay_routine._textures[tid].tobytes())
    return h.hexdigest()


def render_single_frame(app: App, width: int, height: int) -> np.ndarray:
    """Run setup + one frame; returns (H, W, 4) u8."""
    return start(app, width, height, frames=1)[-1]


def start(app: App, width: int, height: int, frames: int = 1, frame_dt: float = 0.0) -> list:
    """Headless event loop: setup once, then `frames` redraws. Returns the
    rendered images.

    frame_dt defaults to 0.0 to mirror the reference's headless screenshot
    harness (examples/src/tests.rs:79 `delta_t_seconds: 0.0`), so animated
    examples render their t=0 pose; live viewers pass a real delta."""
    from ..overlay import OverlayRoutine

    renderer = Renderer(handedness=app.HANDEDNESS, aspect_ratio=width / height)
    base_graph = BaseRenderGraph(renderer)
    overlay_routine = OverlayRoutine()
    app.overlay = overlay_routine  # texture registration from setup/redraw
    app.setup(
        SetupContext(
            renderer=renderer,
            base_graph=base_graph,
            resolution=(width, height),
            overlay=overlay_routine,
            loader=AssetLoader(app.asset_base()),
        )
    )
    renderer.set_aspect_ratio(width / height)

    settings = BaseRenderGraphSettings(
        ambient_color=tuple(app.ambient_color()), clear_color=tuple(app.clear_color())
    )
    target = FrameRenderTarget(width, height, app.sample_count())

    images = []
    elapsed = 0.0
    dev_overlay_key = None
    dev_overlay_fn = None
    for i in range(frames):
        ctx = RedrawContext(
            renderer=renderer,
            base_graph=base_graph,
            resolution=(width, height),
            delta_t_seconds=frame_dt,
            elapsed=elapsed,
            overlay=overlay_routine,
        )
        app.handle_redraw(ctx)
        jobs = app.overlay_jobs(ctx)
        if jobs and app.OVERLAY_ON_DEVICE:
            key = _overlay_key(overlay_routine, jobs)
            if key != dev_overlay_key:
                if dev_overlay_fn is not None:
                    base_graph.unregister_pass(dev_overlay_fn)
                dev_overlay_fn = overlay_routine.device_pass(jobs, width, height)
                base_graph.register_pass(dev_overlay_fn)
                dev_overlay_key = key
        renderer.swap_instruction_buffers()
        eval_output = renderer.evaluate_instructions()
        img = base_graph.render_frame(eval_output, target, settings, skybox_slot=app.skybox_slot())
        if jobs and not app.OVERLAY_ON_DEVICE:
            img = overlay_routine.render(img, jobs)
        images.append(img)
        elapsed += frame_dt
    return images
