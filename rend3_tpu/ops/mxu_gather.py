"""Gather-by-matmul: sampling a 2D grid at per-pixel coordinates on the MXU.

TPUs have no per-lane dynamic gather: sampling a shadow map / texture atlas
at 2M per-pixel addresses via XLA gathers costs ~22 ms per tap at 1080p. The
reference renderer leans on hardware samplers for exactly this
(rend3-routine samplers.rs, opaque.wgsl textureSampleGrad / PCF taps); this
module is the TPU-native replacement:

  1. the source grid is cut into LT x LT cell tiles with a halo sized for
     the requested static offset footprint (e.g. the 12 texel PCF5 taps),
  2. each (32, 128) screen tile gets the exact list of grid cells its
     pixels address (factored one-hot occupancy einsum -> rank-select
     compaction; the same machinery as the geometry binning),
  3. a Pallas kernel walks (screen tile, cell) pairs: one-hot row/column
     vectors select each pixel's cell-relative row via an MXU matmul
     (onehot_y @ tile_rows) and its column via a lane-rotate + masked
     reduction -- every "gather" is dense VPU/MXU work, zero scalar loads.

Exact: one-hot f32 matmul reproduces the addressed f32 value bit-for-bit
(1.0 * v sums over a single nonzero term).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "GatherGrid",
    "build_bilinear_tiles",
    "build_grid_tiles",
    "pair_lists",
    "sample_grid",
    "sample_grid_bilinear",
    "sample_grid_pcf5",
]

STILE_H = 32   # screen tile height (pixels)
STILE_W = 128  # screen tile width (pixels / lanes)
LT = 64        # source-grid cell extent (texels per axis)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class GatherGrid:
    """Pre-tiled source grid: (n_cells, R, 128) f32 blocks with halo."""

    def __init__(self, tiles, Gy, Gx, hlo, R):
        self.tiles = tiles
        self.Gy = Gy
        self.Gx = Gx
        self.hlo = hlo   # halo below the cell origin (rows AND cols)
        self.R = R       # rows per tile block


def build_grid_tiles(img: jnp.ndarray, hlo: int, hhi: int) -> GatherGrid:
    """Cut img (H, W) into (Gy*Gx, R, 128) tile blocks.

    Block c=(cy, cx) rows cover source rows [cy*LT - hlo, cy*LT + LT + hhi)
    and lanes cover source cols [cx*LT - hlo, cx*LT + 127 - hlo]; lanes
    beyond LT + hlo + hhi are over-read slack that the one-hots never match.
    Out-of-image texels read 0.
    """
    H, W = img.shape
    Gy, Gx = _cdiv(H, LT), _cdiv(W, LT)
    R = LT + hlo + hhi
    R = _cdiv(R, 8) * 8  # sublane-align f32 blocks

    padded = jnp.pad(
        img,
        ((hlo, Gy * LT + R - H), (hlo, (Gx - 1) * LT + STILE_W - W)),
    )
    ar_r = jnp.arange(R)
    row_idx = (jnp.arange(Gy)[:, None] * LT + ar_r[None, :]).reshape(-1)
    rows = padded[row_idx]                                   # (Gy*R, Wp)
    col_idx = (jnp.arange(Gx)[:, None] * LT + jnp.arange(STILE_W)[None, :]).reshape(-1)
    tiles = rows[:, col_idx]                                 # (Gy*R, Gx*128)
    tiles = tiles.reshape(Gy, R, Gx, STILE_W).transpose(0, 2, 1, 3).reshape(Gy * Gx, R, STILE_W)
    return GatherGrid(tiles=tiles, Gy=Gy, Gx=Gx, hlo=hlo, R=R)


N_BANDS = 4
BAND_H = STILE_H // N_BANDS


def pair_lists(
    bx: jnp.ndarray,     # (H, W) int32 base col per pixel
    by: jnp.ndarray,     # (H, W) int32 base row per pixel
    valid: jnp.ndarray,  # (H, W) bool
    Gy: int,
    Gx: int,
    cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-screen-tile source-cell lists: ids (nT, cap) into the flat cell
    grid (-1 padded), counts (nT,), band bits (nT, cap), need () — the max
    raw per-tile pair count (pre-clamp), i.e. the pair cap this frame
    actually required; the host jumps the cap straight there on overflow.

    A pixel addresses the cell containing its base texel; the offset
    footprint stays inside that cell's halo by construction. Band bit b is
    set when any pixel of the tile's b-th 8-row band addresses the cell, so
    the kernel can skip (pair, band) combinations — tiles spanning depth
    discontinuities touch many cells, each from only a sliver of pixels.
    """
    from .geometry import _compact_rows

    H, W = bx.shape
    n_rows, n_cols = H // STILE_H, W // STILE_W
    nT = n_rows * n_cols
    npx = STILE_H * STILE_W

    def tile_flat(a):
        return (
            a.reshape(n_rows, STILE_H, n_cols, STILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(nT, npx)
        )

    cx = jnp.floor_divide(tile_flat(bx), LT)
    cy = jnp.floor_divide(tile_flat(by), LT)
    ok = tile_flat(valid) & (cx >= 0) & (cx < Gx) & (cy >= 0) & (cy < Gy)

    npb = BAND_H * STILE_W
    cxb = cx.reshape(nT, N_BANDS, npb)
    cyb = cy.reshape(nT, N_BANDS, npb)
    okb = ok.reshape(nT, N_BANDS, npb)
    ohx = ((cxb[..., None] == jnp.arange(Gx)) & okb[..., None]).astype(jnp.bfloat16)
    ohy = ((cyb[..., None] == jnp.arange(Gy)) & okb[..., None]).astype(jnp.bfloat16)
    occ_b = jnp.einsum(
        "tbpy,tbpx->tbyx", ohy, ohx, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,  # intentionally-bf16 occupancy
    )
    occ_bits = (
        ((occ_b > 0.0).astype(jnp.int32) << jnp.arange(N_BANDS)[None, :, None, None])
        .sum(axis=1)
        .reshape(nT, Gy * Gx)
    )
    ids, counts = _compact_rows(occ_bits > 0, cap)
    bits = jnp.take_along_axis(occ_bits, jnp.clip(ids, 0, Gy * Gx - 1), axis=1)
    bits = jnp.where(ids >= 0, bits, 0)
    need = counts.max()
    return ids, jnp.minimum(counts, cap), bits, need




INIT_BIT = N_BANDS  # step_flags bit marking a tile's first (init) step


def _pair_step_tables(
    counts: jnp.ndarray,   # (nT,) real pair count per screen tile
    pids: jnp.ndarray,     # (nT*cap,) source-cell id per (tile, j) slot
    bits: jnp.ndarray,     # (nT*cap,) band-occupancy bits per slot
    nT: int,
    cap: int,
    slack_tiles: int = 16,
    queue_cap: int = None,
):
    """1D work queue over actual (screen tile, source cell) pairs: one grid
    step per real pair plus one init step per pair-less tile. Returns
    (step_tile, step_pid, step_flags, n_steps_static, queue_need, total) —
    queue_need is the pair cap the formula budget S(cap) would have needed
    to hold every real pair (0 when everything fit, or always 0 with an
    explicit queue_cap); total is the RAW number of steps this launch
    actually required (init + real pairs), for adaptive queue sizing.

    Sizing rules learned the hard way:
      * a 2D (tile, cap) grid pays the Mosaic step overhead for every empty
        slot, making kernel time scale with the pair CAPACITY (adaptive cap
        growth turned a ~1k-pair frame into a quarter-million grid steps);
      * the per-pair tables must be folded into per-STEP tables here on the
        host side — prefetching the raw (nT*cap) pids/bits into SMEM walks
        off the ~1 MB SMEM cliff at representative scale (nT=2040, cap=64
        is 510 KB per table; round-2 bench crash);
      * even the 1D formula queue S = 5*nT + slack*cap is ~60-80% PADDING
        steps on real frames, and each no-op Mosaic step still costs ~1 us —
        the round-3 bench spent ~45 ms walking a 43k-step texture queue with
        ~10k real steps. queue_cap (host-adaptive, reported via `total`)
        sizes S to the frame's real step count instead.

    step_flags packs the pair's band bits (bits 0..N_BANDS-1; zero for
    padding steps so no work fires) plus INIT_BIT for each tile's first
    step (the kernel zeroes the output block there).
    """
    from .geometry import _rank_of

    per_tile = jnp.maximum(counts, 1)
    base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(per_tile)[:-1].astype(jnp.int32)]
    )
    total = (base[-1] + per_tile[-1]).astype(jnp.int32)
    if queue_cap is None:
        S = nT + 4 * nT + slack_tiles * cap  # typical ~2-4 pairs/tile + worst-tile slack
    else:
        S = max(8, int(queue_cap))
    s = jnp.arange(S, dtype=jnp.int32)
    tile = _rank_of(base, S, nT)
    j = s - base[tile]
    pad = s >= total
    step_tile = jnp.where(pad, nT - 1, tile).astype(jnp.int32)
    step_j = jnp.where(pad, cap, jnp.minimum(j, cap)).astype(jnp.int32)
    real = (~pad) & (step_j < counts[step_tile])
    flat = step_tile * cap + jnp.minimum(step_j, cap - 1)
    step_pid = jnp.where(real, pids[flat], 0).astype(jnp.int32)
    init = jnp.where(step_j == 0, jnp.int32(1 << INIT_BIT), 0)
    step_flags = (jnp.where(real, bits[flat], 0) | init).astype(jnp.int32)
    if queue_cap is None:
        # S = 5*nT + slack_tiles*cap: invert for the cap that makes S >= total.
        queue_need = jnp.where(
            total > S, -(-(total - (S - slack_tiles * cap)) // slack_tiles), 0
        ).astype(jnp.int32)
    else:
        queue_need = jnp.int32(0)
    return step_tile, step_pid, step_flags, S, queue_need, total


# Per-launch step ceiling: the three step tables are scalar-prefetched at
# 12 B/step and walk off the ~1 MB SMEM cliff past ~85k steps; 48k = 576 KB
# leaves headroom for Mosaic's own SMEM use (routine/base.py QUEUE_STEP_CEIL
# mirrors this). Frames needing more steps DEGRADE to several launches
# instead of refusing (ref suballoc.rs:164-214 grows, never refuses).
QUEUE_STEPS_PER_LAUNCH = 49152


def _pair_launch_plan(counts, pids2, bits2, nT, cap, queue_cap):
    """Split the pair-step queue into launches whose scalar-prefetch tables
    each fit under the SMEM ceiling.

    queue_cap None or <= QUEUE_STEPS_PER_LAUNCH: one launch over all tiles
    (the common case — identical tables to calling _pair_step_tables
    directly). Past the ceiling, the screen tiles split into n contiguous
    ranges (n = ceil(queue_cap / ceiling)), each with its own queue of
    ceil(queue_cap / n) steps. A tile's ENTIRE pair list lives in exactly
    one launch, so init semantics and output blocks stay tile-local and the
    per-launch outputs simply concatenate. Unbalanced ranges are caught by
    the reported step need (n * max per-launch total, see _plan_qtotal)
    growing queue_cap through the host's normal adapt-and-re-render loop.

    Returns ([(lo, hi, step_tile, step_pid, step_flags, S)], queue_need,
    [per-launch totals])."""
    if queue_cap is None or int(queue_cap) <= QUEUE_STEPS_PER_LAUNCH:
        st, spid, sflags, S, qneed, total = _pair_step_tables(
            counts, pids2.reshape(-1), bits2.reshape(-1), nT, cap,
            queue_cap=queue_cap,
        )
        return [(0, nT, st, spid, sflags, S)], qneed, [total]
    n = min(nT, _cdiv(int(queue_cap), QUEUE_STEPS_PER_LAUNCH))
    per_launch = _cdiv(int(queue_cap), n)
    tile_step = _cdiv(nT, n)
    launches, totals = [], []
    for k in range(n):
        lo, hi = k * tile_step, min(nT, (k + 1) * tile_step)
        if lo >= hi:
            break
        st, spid, sflags, S, _qn, tot = _pair_step_tables(
            counts[lo:hi], pids2[lo:hi].reshape(-1), bits2[lo:hi].reshape(-1),
            hi - lo, cap, queue_cap=per_launch,
        )
        launches.append((lo, hi, st, spid, sflags, S))
        totals.append(tot)
    return launches, jnp.int32(0), totals


def _plan_qtotal(launches, totals):
    """Step need to report for adaptive queue sizing: with one launch it is
    the raw total (exact); with n launches it is n * max(per-launch total) —
    a conservative bound that guarantees the NEXT queue_cap gives every
    launch enough steps for its own range."""
    if len(launches) == 1:
        return totals[0]
    return jnp.int32(len(launches)) * functools.reduce(jnp.maximum, totals)


def sample_grid(
    img: jnp.ndarray,              # (Hs, Ws) f32 source grid
    bx: jnp.ndarray,               # (H, W) int32 base col per pixel
    by: jnp.ndarray,               # (H, W) int32 base row per pixel
    valid: jnp.ndarray,            # (H, W) bool
    offsets: Sequence[Tuple[int, int]],  # static (dx, dy) taps
    *,
    pair_cap: int = 32,
    interpret: bool = False,
    queue_cap: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """img[by+dy, bx+dx] for every pixel and every static offset.

    Returns (values, need, qtotal): values (n_off, H, W) f32 (0.0 where
    invalid / out of grid / dropped by pair overflow), the needed pair cap
    (compare to the static pair_cap: > means pairs were dropped and the
    host should rebuild with cap = the returned value), and the raw step
    count the launch required (compare to queue_cap when one was given).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = bx.shape
    assert H % STILE_H == 0 and W % STILE_W == 0, (H, W)
    n_rows, n_cols = H // STILE_H, W // STILE_W
    nT = n_rows * n_cols
    npx = STILE_H * STILE_W
    n_off = len(offsets)
    OL = _cdiv(n_off, 8) * 8  # output lane padding (VMEM min f32 is fine; keep small)

    Hs_src, Ws_src = img.shape
    dxs = sorted({dx for dx, _ in offsets})
    dys = sorted({dy for _, dy in offsets})
    hlo = max(0, -min(min(dxs), min(dys)))
    hhi = max(0, max(max(dxs), max(dys)))
    grid = build_grid_tiles(img, hlo, hhi)
    Gy, Gx, R = grid.Gy, grid.Gx, grid.R

    cap = min(pair_cap, Gy * Gx)
    ids, counts, bits, need = pair_lists(bx, by, valid, Gy, Gx, cap)
    pids2 = jnp.clip(ids, 0, Gy * Gx - 1).astype(jnp.int32)
    bits2 = bits.astype(jnp.int32)
    launches, qneed, totals = _pair_launch_plan(
        counts, pids2, bits2, nT, cap, queue_cap
    )
    need = jnp.maximum(need, qneed)

    # Pixel coords, pixels-on-LANES layout (nT, 2, npx): one-hot rows live on
    # sublanes so every block is padding-free and no in-kernel relayouts occur.
    def tile_flat(a):
        return (
            a.reshape(n_rows, STILE_H, n_cols, STILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(nT, npx)
        )

    bad = jnp.int32(-(1 << 20))
    bxt = jnp.where(tile_flat(valid), tile_flat(bx), bad)
    byt = jnp.where(tile_flat(valid), tile_flat(by), bad)
    coords = jnp.stack([bxt, byt], axis=1)                   # (nT, 2, npx)

    npb = BAND_H * STILE_W

    # x-select domain: rel_x in [hlo, hlo+LT) plus dx taps within the halo
    # -> rows [0, hlo+LT+hhi), i.e. R. Slicing the select (and the rolls) to
    # XS sublanes instead of the full 128-lane block cuts the dominant VPU
    # multiply-reduce ~44%; roll wraparound only pollutes rows the one-hot
    # never selects (selected rows are >= hlo and < hlo+LT <= XS-hhi).
    XS = R

    def kernel(st_ref, spid_ref, sflags_ref, tile_ref, coords_ref, out_ref):
        s = pl.program_id(0)
        flags = sflags_ref[s]
        sub64 = jax.lax.broadcasted_iota(jnp.int32, (LT, 1), 0)
        subX = jax.lax.broadcasted_iota(jnp.int32, (XS, 1), 0)

        @pl.when(((flags >> INIT_BIT) & 1) != 0)
        def _init():
            out_ref[...] = jnp.zeros((1, OL, npx), jnp.float32)

        @pl.when((flags & ((1 << N_BANDS) - 1)) != 0)
        def _pair():
            pid = spid_ref[s]
            pbits = flags
            cy = pid // Gx
            cx = pid - cy * Gx
            for b in range(N_BANDS):
                @pl.when(((pbits >> b) & 1) != 0)
                def _band(b=b):
                    sl = pl.ds(b * npb, npb)
                    bxv = coords_ref[0, 0:1, sl]                 # (1, npb)
                    byv = coords_ref[0, 1:2, sl]
                    rel_x = bxv - cx * LT + hlo                  # sublane of base col
                    rel_y = byv - cy * LT                        # cell-local row
                    own = (rel_y >= 0) & (rel_y < LT) & (rel_x >= hlo) & (rel_x < hlo + LT)
                    own &= (bxv >= 0) & (bxv < Ws_src) & (byv >= 0) & (byv < Hs_src)
                    ohy = (jnp.where(own, rel_y, -1) == sub64).astype(jnp.float32)   # (64, npb)
                    ohx = (jnp.where(own, rel_x, -1) == subX).astype(jnp.float32)    # (XS, npb)

                    rows = []
                    for dy in dys:
                        trows = tile_ref[0, pl.ds(hlo + dy, LT), :]  # (64, 128)
                        r2 = jax.lax.dot_general(
                            trows, ohy,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )[:XS]                                       # (XS cols, npb)
                        for dx in dxs:
                            if (dx, dy) not in offsets:
                                continue
                            shifted = pltpu.roll(r2, (-dx) % XS, 0) if dx else r2
                            rows.append((ohx * shifted).sum(axis=0, keepdims=True))
                    # rows ordered (dy-major, dx-minor); map back to the
                    # caller's offset order.
                    order = sorted(range(n_off), key=lambda k: (offsets[k][1], offsets[k][0]))
                    cols = [None] * n_off
                    for slot, k in enumerate(order):
                        cols[k] = rows[slot]
                    cols += [jnp.zeros((1, npb), jnp.float32)] * (OL - n_off)
                    out_ref[0, :, sl] = out_ref[0, :, sl] + jnp.concatenate(cols, axis=0)

    outs = []
    for (lo, hi, st, spid, sflags, S) in launches:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # step_tile, step_pid, step_flags (all S-sized)
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, R, STILE_W), lambda s, st, sp, sf: (sp[s], 0, 0)),
                pl.BlockSpec((1, 2, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, OL, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
        )
        outs.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((hi - lo, OL, npx), jnp.float32),
            interpret=interpret,
        )(st, spid, sflags, grid.tiles, coords[lo:hi]))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    out = out[:, :n_off].reshape(n_rows, n_cols, n_off, STILE_H, STILE_W)
    out = out.transpose(2, 0, 3, 1, 4).reshape(n_off, H, W)
    return out, need, _plan_qtotal(launches, totals)


def sample_grid_pcf5(
    img: jnp.ndarray,              # (Hs, Ws) f32 depth grid (reverse-Z)
    bx: jnp.ndarray,               # (H, W) int32 floor(sx-0.5) base texel col
    by: jnp.ndarray,               # (H, W) int32 floor(sy-0.5) base texel row
    fx: jnp.ndarray,               # (H, W) f32 x bilerp fraction
    fy: jnp.ndarray,               # (H, W) f32 y bilerp fraction
    ref: jnp.ndarray,              # (H, W) f32 reference depth (GE compare)
    valid: jnp.ndarray,            # (H, W) bool
    *,
    pair_cap: int = 32,
    interpret: bool = False,
    queue_cap: int = None,
    tiles: jnp.ndarray = None,     # optional pre-built build_pcf5_tiles(img)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PCF5-with-bilinear-GE resolved INSIDE the gather kernel.

    Semantically identical to sample_grid(img, ..., PCF 12-tap offsets)
    followed by shadow.pcf5_from_occlusion — the reference's single fused
    PCF resolve (opaque.wgsl:471-520) — but the 12 occluder depths never
    leave VMEM: each (screen tile, grid cell) pair compares its window
    values against ref and bilerps the five taps in-register, emitting ONE
    channel instead of 12 (half the output traffic, and no XLA-side
    12-plane compare pass over the stacked entries image).

    Returns (pcf (H, W) f32 — 0 where the pixel was invalid / uncovered,
    callers substitute 1.0 there — the needed pair cap, and the raw step
    count the launch required)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = bx.shape
    assert H % STILE_H == 0 and W % STILE_W == 0, (H, W)
    n_rows, n_cols = H // STILE_H, W // STILE_W
    nT = n_rows * n_cols
    npx = STILE_H * STILE_W

    Hs_src, Ws_src = img.shape
    # The 12-tap PCF5 window: dy in [-1, 2], dx in [-1, 2], minus corners.
    offsets = [
        (0, -1), (1, -1),
        (-1, 0), (0, 0), (1, 0), (2, 0),
        (-1, 1), (0, 1), (1, 1), (2, 1),
        (0, 2), (1, 2),
    ]
    dys = (-1, 0, 1, 2)
    hlo, hhi = 1, 2
    if tiles is None:
        grid = build_grid_tiles(img, hlo, hhi)
    else:
        # Pre-tiled source (static shadow maps are cached across frames —
        # re-tiling a multi-MB stacked map every frame is pure waste).
        grid = GatherGrid(
            tiles=tiles, Gy=_cdiv(Hs_src, LT), Gx=_cdiv(Ws_src, LT),
            hlo=hlo, R=_cdiv(LT + hlo + hhi, 8) * 8,
        )
    Gy, Gx, R = grid.Gy, grid.Gx, grid.R

    cap = min(pair_cap, Gy * Gx)
    ids, counts, bits, need = pair_lists(bx, by, valid, Gy, Gx, cap)
    pids2 = jnp.clip(ids, 0, Gy * Gx - 1).astype(jnp.int32)
    bits2 = bits.astype(jnp.int32)
    launches, qneed, totals = _pair_launch_plan(
        counts, pids2, bits2, nT, cap, queue_cap
    )
    need = jnp.maximum(need, qneed)

    def tile_flat(a):
        return (
            a.reshape(n_rows, STILE_H, n_cols, STILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(nT, npx)
        )

    bad = jnp.int32(-(1 << 20))
    bxt = jnp.where(tile_flat(valid), tile_flat(bx), bad)
    byt = jnp.where(tile_flat(valid), tile_flat(by), bad)
    coords = jnp.stack([bxt, byt], axis=1)                   # (nT, 2, npx)
    fracs = jnp.stack(
        [tile_flat(fx), tile_flat(fy), tile_flat(ref)], axis=1
    ).astype(jnp.float32)                                    # (nT, 3, npx)

    npb = BAND_H * STILE_W
    XS = R  # x-select domain (see sample_grid)

    def kernel(st_ref, spid_ref, sflags_ref, tile_ref, coords_ref, fracs_ref, out_ref):
        s = pl.program_id(0)
        flags = sflags_ref[s]
        sub64 = jax.lax.broadcasted_iota(jnp.int32, (LT, 1), 0)
        subX = jax.lax.broadcasted_iota(jnp.int32, (XS, 1), 0)

        @pl.when(((flags >> INIT_BIT) & 1) != 0)
        def _init():
            out_ref[...] = jnp.zeros((1, 8, npx), jnp.float32)

        @pl.when((flags & ((1 << N_BANDS) - 1)) != 0)
        def _pair():
            pid = spid_ref[s]
            pbits = flags
            cy = pid // Gx
            cx = pid - cy * Gx
            # Nearest occluder anywhere in this cell (+halo): any pixel whose
            # reference depth is >= it compares GE against every window texel
            # — the whole band resolves to "lit" without a single select.
            # Most of a frame's (tile, cell) pairs sit over caster-free map
            # regions (tmax == 0), so this skips the expensive path outright.
            tmax = jnp.max(tile_ref[0])
            for b in range(N_BANDS):
                @pl.when(((pbits >> b) & 1) != 0)
                def _band(b=b):
                    sl = pl.ds(b * npb, npb)
                    bxv = coords_ref[0, 0:1, sl]                 # (1, npb)
                    byv = coords_ref[0, 1:2, sl]
                    fxv = fracs_ref[0, 0:1, sl]
                    fyv = fracs_ref[0, 1:2, sl]
                    refv = fracs_ref[0, 2:3, sl]
                    rel_x = bxv - cx * LT + hlo
                    rel_y = byv - cy * LT
                    own = (rel_y >= 0) & (rel_y < LT) & (rel_x >= hlo) & (rel_x < hlo + LT)
                    own &= (bxv >= 0) & (bxv < Ws_src) & (byv >= 0) & (byv < Hs_src)
                    own_f = own.astype(jnp.float32)
                    minref = jnp.min(jnp.where(own, refv, 1.0))

                    @pl.when(minref >= tmax)
                    def _all_lit():
                        out_ref[0, 0, sl] = out_ref[0, 0, sl] + own_f[0]

                    @pl.when(minref < tmax)
                    def _resolve():
                        ohy = (jnp.where(own, rel_y, -1) == sub64).astype(jnp.float32)
                        ohx = (jnp.where(own, rel_x, -1) == subX).astype(jnp.float32)

                        cmp = {}
                        for dy in dys:
                            trows = tile_ref[0, pl.ds(hlo + dy, LT), :]  # (64, 128)
                            r2 = jax.lax.dot_general(
                                trows, ohy,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )[:XS]                                       # (XS, npb)
                            for dx in (-1, 0, 1, 2):
                                if (dx, dy) not in offsets:
                                    continue
                                shifted = pltpu.roll(r2, (-dx) % XS, 0) if dx else r2
                                occ = (ohx * shifted).sum(axis=0, keepdims=True)
                                cmp[(dx, dy)] = (refv >= occ).astype(jnp.float32)

                        def tap(ox, oy):
                            top = cmp[(ox, oy)] * (1.0 - fxv) + cmp[(ox + 1, oy)] * fxv
                            bot = cmp[(ox, oy + 1)] * (1.0 - fxv) + cmp[(ox + 1, oy + 1)] * fxv
                            return top * (1.0 - fyv) + bot * fyv

                        total = tap(0, 0) + tap(0, 1) + tap(0, -1) + tap(1, 0) + tap(-1, 0)
                        pcf = total * (0.2 * own_f)
                        out_ref[0, 0, sl] = out_ref[0, 0, sl] + pcf[0]

    outs = []
    for (lo, hi, st, spid, sflags, S) in launches:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, R, STILE_W), lambda s, st, sp, sf: (sp[s], 0, 0)),
                pl.BlockSpec((1, 2, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
                pl.BlockSpec((1, 3, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
        )
        outs.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((hi - lo, 8, npx), jnp.float32),
            interpret=interpret,
        )(st, spid, sflags, grid.tiles, coords[lo:hi], fracs[lo:hi]))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    out = out[:, 0].reshape(n_rows, n_cols, STILE_H, STILE_W)
    out = out.transpose(0, 2, 1, 3).reshape(H, W)
    return out, need, _plan_qtotal(launches, totals)


def _build_grid_tiles_multi(planes: jnp.ndarray, hlo: int, hhi: int):
    """planes (C, H, W) -> (Gy*Gx, R, C*128): per-cell blocks with the C
    channel blocks side by side on lanes so one matmul row-selects all
    channels at once."""
    C, H, W = planes.shape
    Gy, Gx = _cdiv(H, LT), _cdiv(W, LT)
    R = _cdiv(LT + hlo + hhi, 8) * 8

    padded = jnp.pad(
        planes,
        ((0, 0), (hlo, Gy * LT + R - H), (hlo, (Gx - 1) * LT + STILE_W - W)),
    )
    row_idx = (jnp.arange(Gy)[:, None] * LT + jnp.arange(R)[None, :]).reshape(-1)
    rows = padded[:, row_idx]                                # (C, Gy*R, Wp)
    col_idx = (jnp.arange(Gx)[:, None] * LT + jnp.arange(STILE_W)[None, :]).reshape(-1)
    tiles = rows[:, :, col_idx]                              # (C, Gy*R, Gx*128)
    tiles = (
        tiles.reshape(C, Gy, R, Gx, STILE_W)
        .transpose(1, 3, 2, 0, 4)
        .reshape(Gy * Gx, R, C * STILE_W)
    )
    return GatherGrid(tiles=tiles, Gy=Gy, Gx=Gx, hlo=hlo, R=R)


def build_pcf5_tiles(img: jnp.ndarray) -> jnp.ndarray:
    """Pre-tile a (H, W) depth grid for sample_grid_pcf5's `tiles=` (the
    PCF5 halo: hlo=1, hhi=2). For shadow maps cached across frames, build
    this once with the maps instead of per frame."""
    return build_grid_tiles(img, 1, 2).tiles


def build_bilinear_tiles(planes: jnp.ndarray) -> jnp.ndarray:
    """Pre-tile (C, H, W) source planes for sample_grid_bilinear's `tiles=`.

    The tiling is a pure relayout of the source (a multi-hundred-MB
    reshuffle at atlas scale); for grids that are static across frames
    (the texture atlas) callers build it ONCE outside the frame program
    and pass it in, instead of paying the reshuffle every frame."""
    return _build_grid_tiles_multi(planes, 0, 1).tiles


def sample_grid_bilinear(
    planes: jnp.ndarray,           # (C, Hs, Ws) f32 source planes
    bx: jnp.ndarray,               # (H, W) i32 floor texel col (left tap)
    by: jnp.ndarray,               # (H, W) i32 floor texel row (top tap)
    fx: jnp.ndarray,               # (H, W) f32 x lerp fraction
    fy: jnp.ndarray,               # (H, W) f32 y lerp fraction
    wt: jnp.ndarray,               # (H, W) f32 overall weight (mip lerp etc.)
    valid: jnp.ndarray,            # (H, W) bool
    *,
    pair_cap: int = 16,
    dot_dtype=jnp.float32,
    interpret: bool = False,
    tiles: jnp.ndarray = None,     # optional pre-built build_bilinear_tiles(planes)
    queue_cap: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted 2x2 bilinear gather on the MXU, all C channels at once.

    Returns (C, H, W) with wt * bilerp(planes[c], by+fy, bx+fx) per pixel
    (0 where invalid / out of grid / dropped by pair overflow), plus the
    needed pair cap (> pair_cap means pairs were dropped), plus the raw
    step count the launch required (adaptive queue_cap sizing).

    The trick over sample_grid: the lerp weights ride IN the one-hot
    vectors — ohy has two nonzeros (1-fy @ rel_y, fy @ rel_y+1) so one
    matmul row-selects AND y-lerps; the column one-hot likewise x-lerps in
    the VPU reduce. A full 4-tap bilinear costs one (R x C*128)^T x
    (R x npb) matmul per (screen tile, source cell) pair instead of four
    gathers (the reference leans on hardware samplers for this:
    rend3-routine samplers.rs, opaque.wgsl textureSampleGrad).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = planes.shape[0]
    H, W = bx.shape
    assert H % STILE_H == 0 and W % STILE_W == 0, (H, W)
    n_rows, n_cols = H // STILE_H, W // STILE_W
    nT = n_rows * n_cols
    npx = STILE_H * STILE_W
    CL = _cdiv(C, 8) * 8

    Hs_src, Ws_src = planes.shape[1], planes.shape[2]
    if tiles is not None:
        Gy, Gx = _cdiv(Hs_src, LT), _cdiv(Ws_src, LT)
        R = _cdiv(LT + 1, 8) * 8
        assert tiles.shape == (Gy * Gx, R, C * STILE_W), (tiles.shape, Gy, Gx, R, C)
        grid = GatherGrid(tiles=tiles, Gy=Gy, Gx=Gx, hlo=0, R=R)
    else:
        grid = _build_grid_tiles_multi(planes, 0, 1)
    if dot_dtype == jnp.bfloat16 and grid.tiles.dtype != jnp.bfloat16:
        # The kernel casts tile rows to the dot dtype anyway; casting the
        # whole (static or freshly built) tile store up front is numerically
        # identical and halves the dominant per-step tile-block DMA.
        grid = GatherGrid(
            tiles=grid.tiles.astype(jnp.bfloat16),
            Gy=grid.Gy, Gx=grid.Gx, hlo=grid.hlo, R=grid.R,
        )
    Gy, Gx, R = grid.Gy, grid.Gx, grid.R

    cap = min(pair_cap, Gy * Gx)
    ids, counts, bits, need = pair_lists(bx, by, valid, Gy, Gx, cap)
    pids2 = jnp.clip(ids, 0, Gy * Gx - 1).astype(jnp.int32)
    bits2 = bits.astype(jnp.int32)
    launches, qneed, totals = _pair_launch_plan(
        counts, pids2, bits2, nT, cap, queue_cap
    )
    need = jnp.maximum(need, qneed)

    def tile_flat(a):
        return (
            a.reshape(n_rows, STILE_H, n_cols, STILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(nT, npx)
        )

    bad = jnp.int32(-(1 << 20))
    bxt = jnp.where(tile_flat(valid), tile_flat(bx), bad)
    byt = jnp.where(tile_flat(valid), tile_flat(by), bad)
    coords = jnp.stack([bxt, byt], axis=1)                   # (nT, 2, npx)
    fracs = jnp.stack(
        [tile_flat(fx), tile_flat(fy), tile_flat(wt)], axis=1
    ).astype(jnp.float32)                                    # (nT, 3, npx)

    npb = BAND_H * STILE_W

    # x-select domain: rel_x < LT and the +1 tap -> rows [0, LT], padded to
    # sublane granularity. Slicing the per-channel select to XS rows (vs the
    # full 128-lane block) cuts the dominant VPU multiply-reduce ~44%.
    XS = _cdiv(LT + 2, 8) * 8

    def kernel(st_ref, spid_ref, sflags_ref, tile_ref, coords_ref, fracs_ref, out_ref):
        s = pl.program_id(0)
        flags = sflags_ref[s]
        subR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        subX = jax.lax.broadcasted_iota(jnp.int32, (XS, 1), 0)

        @pl.when(((flags >> INIT_BIT) & 1) != 0)
        def _init():
            out_ref[...] = jnp.zeros((1, CL, npx), jnp.float32)

        @pl.when((flags & ((1 << N_BANDS) - 1)) != 0)
        def _pair():
            pid = spid_ref[s]
            pbits = flags
            cy = pid // Gx
            cx = pid - cy * Gx
            for b in range(N_BANDS):
                @pl.when(((pbits >> b) & 1) != 0)
                def _band(b=b):
                    sl = pl.ds(b * npb, npb)
                    bxv = coords_ref[0, 0:1, sl]                 # (1, npb)
                    byv = coords_ref[0, 1:2, sl]
                    fxv = fracs_ref[0, 0:1, sl]
                    fyv = fracs_ref[0, 1:2, sl]
                    wtv = fracs_ref[0, 2:3, sl]
                    rel_x = bxv - cx * LT                        # lane of left tap
                    rel_y = byv - cy * LT                        # cell-local row
                    own = (rel_y >= 0) & (rel_y < LT) & (rel_x >= 0) & (rel_x < LT)
                    own &= (bxv >= 0) & (bxv + 1 < Ws_src) & (byv >= 0) & (byv + 1 < Hs_src)
                    ry = jnp.where(own, rel_y, -2)
                    rx = jnp.where(own, rel_x, -2)
                    w_area = jnp.where(own, wtv, 0.0)
                    # Two nonzeros per column: the y-lerp lives in the matmul.
                    ohy = (ry == subR) * (w_area * (1.0 - fyv)) + (ry + 1 == subR) * (w_area * fyv)
                    ohx = (rx == subX) * (1.0 - fxv) + (rx + 1 == subX) * fxv

                    trows = tile_ref[0]                          # (R, C*128)
                    # Precision must be explicit both ways: the package sets
                    # the GLOBAL default matmul precision to float32, which
                    # stamps contract_precision<fp32> onto this dot — and
                    # Mosaic rejects fp32-precision bf16 matmuls ("Bad lhs
                    # type"); conversely DEFAULT precision on f32 operands
                    # lets the MXU truncate to one bf16 pass, silently
                    # degrading the f32 fallback path.
                    prec = (
                        jax.lax.Precision.DEFAULT
                        if dot_dtype == jnp.bfloat16
                        else jax.lax.Precision.HIGHEST
                    )
                    r2 = jax.lax.dot_general(
                        trows.astype(dot_dtype), ohy.astype(dot_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )                                            # (C*128, npb)
                    for c in range(C):
                        rc = r2[c * STILE_W : c * STILE_W + XS]
                        val = (ohx * rc).sum(axis=0, keepdims=True)  # (1, npb)
                        out_ref[0, c, sl] = out_ref[0, c, sl] + val[0]

    outs = []
    for (lo, hi, st, spid, sflags, S) in launches:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # step_tile, step_pid, step_flags (all S-sized)
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, R, C * STILE_W), lambda s, st, sp, sf: (sp[s], 0, 0)),
                pl.BlockSpec((1, 2, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
                pl.BlockSpec((1, 3, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, CL, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
        )
        outs.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((hi - lo, CL, npx), jnp.float32),
            interpret=interpret,
        )(st, spid, sflags, grid.tiles, coords[lo:hi], fracs[lo:hi]))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    out = out[:, :C].reshape(n_rows, n_cols, C, STILE_H, STILE_W)
    out = out.transpose(2, 0, 3, 1, 4).reshape(C, H, W)
    return out, need, _plan_qtotal(launches, totals)
