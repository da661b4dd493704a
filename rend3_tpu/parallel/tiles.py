"""Multi-chip screen-tile sharding.

The TPU-native "communication backend" the reference never needed
(SURVEY.md §2.9): the frame is data-parallel over screen row-bands — each
chip runs the SAME deferred pipeline as the single-chip program
(routine/base.py `_build_program(key, band=...)`) restricted to its band,
with the scene state (geometry arenas, object/material/light tables)
replicated across the mesh. Because the band frame computes pixel
coordinates as absolute full-target values (integer row offsets added
before any float math), the sharded image is bit-identical to the
single-chip render.

Shadow maps come from the cross-frame cached shadow program
(routine/base.py _ensure_shadow_maps) and ride in with the replicated args —
every chip holds the same maps and only the PCF *resolve* is band-sharded,
so the single- and multi-chip shadow paths are literally the same code (and
a static scene re-rasters nothing per frame on any chip). Built on
`jax.sharding.Mesh` + `shard_map`; XLA inserts the collectives (the Hi-Z
occluder all_gather rides ICI).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["device_mesh", "build_tiled_frame_callable", "TILE_AXIS"]

TILE_AXIS = "tiles"


def device_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (TILE_AXIS,))


def build_tiled_frame_callable(
    graph,
    eval_output,
    target,
    settings=None,
    skybox_slot=None,
    *,
    mesh: Optional[Mesh] = None,
):
    """(jitted multi-chip program, args): the screen-band-sharded frame.

    The args tuple is EXACTLY the single-chip `build_frame_callable` args
    (all replicated); the output image is row-sharded over the mesh. The
    FULL pass list survives sharding — two-phase occlusion culling (phase-1
    band depths all-gathered into the full-target Hi-Z pyramid on every
    chip, so visibility verdicts match the single-chip program exactly),
    MSAA 1 & 4, cull -> binned raster -> G-buffer -> cutout peels ->
    PCF resolve over the replicated cached shadow maps -> textured
    lighting -> blend peels -> tonemap
    (ref rend3-routine/src/base.rs:129-185).

    Returns (program, args); program(*args) -> (image, predicted_mask, aux)
    like the single-chip program — feed predicted_mask back into
    `graph._prev_visible_mask` to carry two-phase culling across frames
    (the mask is replicated: every chip computes identical verdicts).
    """
    from ..routine.base import BaseRenderGraphSettings

    settings = settings or BaseRenderGraphSettings()
    mesh = mesh or device_mesh()
    n = int(mesh.devices.size)
    assert target.height % n == 0, (
        f"target height {target.height} must divide across {n} devices"
    )
    band_h = target.height // n

    _, args = graph.build_frame_callable(eval_output, target, settings, skybox_slot)
    key = graph._last_key
    tkey = ("tiled", key, band_h, n)
    tiled = graph._program_cache.get(tkey)
    if tiled is None:
        frame_band = graph._build_program(key, band=(band_h, TILE_AXIS, n))

        def chip_frame(*a):
            out, mask, aux = frame_band(*a)
            # Every aux slot is a needed-capacity maximum (survivor counts,
            # per-tile needs, tile multipliers); each chip has its own
            # arrays of the same capacity, so the global need is the MAX
            # over chips, not the sum. The predicted mask is computed from
            # the all-gathered full-target Hi-Z, identical on every chip.
            return out, mask, jax.lax.pmax(aux, TILE_AXIS)

        sm = jax.shard_map(
            chip_frame,
            mesh=mesh,
            in_specs=P(),                   # scene state fully replicated
            out_specs=(P(TILE_AXIS), P(), P()),  # image row-sharded; mask/aux replicated
            check_vma=False,
        )
        tiled = jax.jit(sm)
        graph._program_cache[tkey] = tiled
    return tiled, args
