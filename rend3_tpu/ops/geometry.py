"""GPU-driven geometry front-end: per-triangle culling, setup, and binning.

The TPU redesign of the reference's GpuCuller + cull.wgsl
(rend3-routine/src/culling/culler.rs, shaders/src/cull.wgsl): every triangle
is frustum/winding/degenerate/sub-pixel culled in one vectorized pass, the
survivors are compacted (stream compaction via cumsum+scatter — the XLA
equivalent of the shader's atomic append), converted to screen-space edge
equations, and binned into (8, 128) pixel tiles by a two-level row/column
compaction. The resulting per-tile triangle lists drive the Pallas fine
rasterizer (ops/raster_pallas.py).

Like the reference, culling is what makes large scenes cheap: raster cost
tracks *surviving* triangles, not scene size.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["TriSetup", "BinnedTris", "cull_and_setup", "visibility_mask", "bin_triangles", "TILE_H", "TILE_W"]

TILE_H = 8
TILE_W = 128

# Setup row layout (SETUP_W floats per surviving triangle).
SETUP_W = 16
S_EA, S_EB, S_EC = 0, 3, 6        # edge eq: e_i = a_i*px + b_i*py + c_i (inside > 0)
S_ZA, S_ZB, S_ZC = 9, 10, 11      # depth plane: z = za*px + zb*py + zc
S_TL = 12                          # top-left flag, edge 0 (0.0/1.0)
S_ID = 13                          # source (clipped-table) id, bitcast int32
S_TL1, S_TL2 = 14, 15             # top-left flags, edges 1 and 2


class TriSetup(NamedTuple):
    setup: jnp.ndarray   # (V, SETUP_W) f32
    bbox: jnp.ndarray    # (V, 4) f32: xmin, ymin, xmax, ymax (pixels)
    count: jnp.ndarray   # () i32 number of valid rows
    src: jnp.ndarray     # (V,) i32 source (clipped-table) row per survivor
    flip: jnp.ndarray    # (V,) bool: corners 1/2 swapped for orientation


class BinnedTris(NamedTuple):
    ids: jnp.ndarray     # (n_tiles, K) i32 indices into the setup table
    counts: jnp.ndarray  # (n_tiles,) i32
    overflow: jnp.ndarray  # () i32 total dropped (tiles over capacity)
    need: jnp.ndarray    # () i32 max raw per-tile count (pre-clamp): the
    #                      tile capacity this frame actually needed, so the
    #                      host can jump caps straight there in ONE regrow
    #                      instead of doubling through multi-minute compiles


def _compact(mask: jnp.ndarray, cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stream compaction: indices of True entries, padded with -1 to cap.
    Single-row case of _compact_rows (bucketed rank-select, scatter-free)."""
    ids, counts = _compact_rows(mask[None, :], cap)
    return ids[0], counts[0]


def _compact_rows(mask: jnp.ndarray, cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-wise stream compaction: mask (N, V) -> ids (N, cap) of True
    columns per row (-1 padded), counts (N,).

    Scatter-free AND gather-light: position of the k-th set bit is found by a
    two-stage rank-select — a bucketed compare-and-sum over the cumsum
    (vectorized VPU compares) plus one contiguous row-gather per query —
    instead of per-query binary search (log V strided gathers each) or a
    scatter (~1 elem/cycle on TPU)."""
    N, V = mask.shape
    cum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    counts = cum[:, -1]
    q = jnp.arange(1, cap + 1, dtype=jnp.int32)

    # Balance the two compare stages: coarse costs N*cap*n_buckets, fine
    # costs N*cap*B; minimized at B ~ sqrt(V).
    B = 128
    while B * B < V:
        B *= 2
    n_buckets = -(-V // B)
    Vp = n_buckets * B
    big = jnp.int32(2 ** 30)
    cum_p = jnp.pad(cum, ((0, 0), (0, Vp - V)), constant_values=2 ** 30) if Vp != V else cum
    cum_b = cum_p.reshape(N, n_buckets, B)
    coarse = cum_b[:, :, -1]                                  # (N, nB) bucket-end cums

    # Coarse: #buckets entirely below k.
    bucket = (coarse[:, None, :] < q[None, :, None]).sum(-1).astype(jnp.int32)  # (N, cap)
    bucket = jnp.clip(bucket, 0, n_buckets - 1)
    # Fine: rank within the selected bucket (one contiguous row-gather).
    rows = jnp.take_along_axis(cum_b, bucket[:, :, None], axis=1)  # (N, cap, B)
    within = (rows < q[None, :, None]).sum(-1).astype(jnp.int32)
    pos = bucket * B + within

    ids = jnp.where(q[None, :] <= counts[:, None], jnp.minimum(pos, V - 1), -1)
    return ids, counts.astype(jnp.int32)


def _screen_tests(
    clip, valid, width, height, *, cull_mode, front_is_cw, subpixel,
    hiz=None, hiz_interpret=False, y_range=None,
):
    """Shared culling tests (cull.wgsl): degenerate/backface/frustum/
    sub-pixel and the optional Hi-Z occlusion query. Returns
    (keep, x, y, z, area2, bbox mins/maxs).

    y_range: optional traced (y0, y1) restricting the viewport reject to a
    horizontal band of the full target — the multi-chip screen-tile path
    renders one band per chip with ABSOLUTE pixel coordinates (the viewport
    transform always uses the full height), so per-pixel results are
    bit-identical to the single-chip program."""
    from .raster import CullMode, _top_left

    w = clip[..., 3]
    inv_w = 1.0 / jnp.where(w == 0.0, 1.0, w)
    x = (clip[..., 0] * inv_w * 0.5 + 0.5) * width     # (T, 3)
    y = (0.5 - clip[..., 1] * inv_w * 0.5) * height
    z = clip[..., 2] * inv_w

    area2 = (x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0]) - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0])
    is_front = (area2 > 0.0) if front_is_cw else (area2 < 0.0)

    keep = valid & (area2 != 0.0) & (w > 0.0).all(axis=-1)
    if cull_mode == CullMode.BACK:
        keep = keep & is_front
    elif cull_mode == CullMode.FRONT:
        keep = keep & ~is_front

    xmin = x.min(axis=1)
    xmax = x.max(axis=1)
    ymin = y.min(axis=1)
    ymax = y.max(axis=1)
    # viewport reject
    y_lo, y_hi = (0.0, float(height)) if y_range is None else y_range
    keep = keep & (xmax > 0.0) & (xmin < width) & (ymax > y_lo) & (ymin < y_hi)

    if subpixel:
        # Sub-pixel cull: bbox contains no pixel center (cull.wgsl:221-236,
        # non-MSAA only): round min up to next center, compare to max.
        cx = jnp.floor(xmin - 0.5) + 1.5   # first center >= xmin
        cy = jnp.floor(ymin - 0.5) + 1.5
        keep = keep & (cx <= xmax) & (cy <= ymax)

    if hiz is not None:
        from . import hi_z as hiz_ops

        # Query only triangles that survived every other cull: the MXU
        # sampler's pair lists (and so its cost) scale with live queries.
        occluded = hiz_ops.occlusion_test(
            hiz, None, xmin, ymin, xmax, ymax, z.max(axis=1), width, height,
            live=keep, interpret=hiz_interpret,
        )
        keep = keep & ~occluded
    return keep, x, y, z, area2


def visibility_mask(
    clip, valid, width, height, *, cull_mode, front_is_cw, subpixel,
    hiz, hiz_interpret=False, y_range=None,
):
    """Per-row potentially-visible mask: the same tests as cull_and_setup
    including the Hi-Z occlusion query, without building a setup table.
    Drives the two-phase predicted-visible set (cull.wgsl phase-2 result
    stores): next frame predicts exactly the rows that pass against this
    frame's occluder depth."""
    keep, *_ = _screen_tests(
        clip, valid, width, height, cull_mode=cull_mode,
        front_is_cw=front_is_cw, subpixel=subpixel, hiz=hiz,
        hiz_interpret=hiz_interpret, y_range=y_range,
    )
    return keep


def cull_and_setup(
    clip: jnp.ndarray,       # (T, 3, 4) clipped triangles
    valid: jnp.ndarray,      # (T,) bool
    width: int,
    height: int,
    *,
    cull_mode: int,
    front_is_cw: bool,
    cap: Optional[int] = None,
    subpixel: bool = False,
    hiz: Optional[jnp.ndarray] = None,  # optional (levels...) pyramid, see hi_z.py
    hiz_mips=None,
    hiz_interpret: bool = False,
    y_range=None,
) -> TriSetup:
    """Cull, compute edge/depth planes, compact. cap defaults to T."""
    from .raster import CullMode, _top_left

    T = clip.shape[0]
    cap = cap or T

    keep, x, y, z, area2 = _screen_tests(
        clip, valid, width, height, cull_mode=cull_mode,
        front_is_cw=front_is_cw, subpixel=subpixel, hiz=hiz,
        hiz_interpret=hiz_interpret, y_range=y_range,
    )
    xmin = x.min(axis=1)
    xmax = x.max(axis=1)
    ymin = y.min(axis=1)
    ymax = y.max(axis=1)

    # Orient: ensure positive area for uniform edge tests. Column swaps via
    # static slices (take_along_axis lowers to scalar gathers on TPU).
    flip = area2 < 0.0

    def _orient(a):
        swapped = jnp.stack([a[:, 0], a[:, 2], a[:, 1]], axis=1)
        return jnp.where(flip[:, None], swapped, a)

    xo = _orient(x)
    yo = _orient(y)
    zo = _orient(z)

    # Edge i: from corner i to corner i+1. e = a*px + b*py + c.
    xn = jnp.roll(xo, -1, axis=1)
    yn = jnp.roll(yo, -1, axis=1)
    ea = -(yn - yo)                       # (T, 3)
    eb = xn - xo
    ec = (yn - yo) * xo - (xn - xo) * yo
    tl = _top_left(xo, yo, xn, yn).astype(jnp.float32)  # (T, 3)

    # Watertight shared edges: anchor the c coefficient at the
    # lexicographically-smaller endpoint so the two triangles sharing an edge
    # compute bitwise-opposite edge functions (float negation is exact and
    # rounding is sign-symmetric). Without this, a pixel center lying exactly
    # on a shared edge can round to "outside" for BOTH triangles and drop out
    # (the msaa sample-coverage golden's diagonal). ea/eb are already exact
    # negations across the shared edge; only ec is anchor-dependent.
    swap = (xn < xo) | ((xn == xo) & (yn < yo))
    sgn = jnp.where(swap, -1.0, 1.0)
    lx = jnp.where(swap, xn, xo)
    hx = jnp.where(swap, xo, xn)
    ly = jnp.where(swap, yn, yo)
    hy = jnp.where(swap, yo, yn)
    ec_canon = sgn * ((hy - ly) * lx - (hx - lx) * ly)

    # Depth plane: z(p) = sum_i z_i * e_opp_i(p) / area. Opposite edge of
    # corner 0 is edge 1 (1->2), corner 1 -> edge 2, corner 2 -> edge 0.
    area_o = (xo[:, 1] - xo[:, 0]) * (yo[:, 2] - yo[:, 0]) - (xo[:, 2] - xo[:, 0]) * (yo[:, 1] - yo[:, 0])
    inv_area = 1.0 / jnp.where(area_o == 0.0, 1.0, area_o)
    def _opp(a):  # static column rotation [1, 2, 0]
        return jnp.stack([a[:, 1], a[:, 2], a[:, 0]], axis=1)

    za = (zo * _opp(ea)).sum(axis=1) * inv_area
    zb = (zo * _opp(eb)).sum(axis=1) * inv_area
    zc = (zo * _opp(ec)).sum(axis=1) * inv_area

    ids, count = _compact(keep, cap)
    g = jnp.clip(ids, 0, T - 1)


    # Assemble the full-width row table FIRST, then compact with ONE
    # contiguous row-gather (per-column scalar gathers cost ~10 cycles per
    # element on TPU and dominated this pass at scale).
    # Column order must match the S_* layout.
    pre = jnp.stack(
        [
            ea[:, 0], ea[:, 1], ea[:, 2],
            eb[:, 0], eb[:, 1], eb[:, 2],
            ec_canon[:, 0], ec_canon[:, 1], ec_canon[:, 2],
            za, zb, zc,
            tl[:, 0],
            jnp.zeros_like(za),  # S_ID placeholder
            tl[:, 1], tl[:, 2],
        ],
        axis=1,
    )  # (T, SETUP_W)
    setup = pre[g]
    setup = setup.at[:, S_ID].set(g.astype(jnp.float32))  # exact for < 2^24

    pre_bbox = jnp.stack([xmin, ymin, xmax, ymax], axis=1)  # (T, 4)
    live = ids >= 0
    bbox = jnp.where(
        live[:, None], pre_bbox[g], jnp.array([1e9, 1e9, -1e9, -1e9], jnp.float32)
    )
    # Materialize once: the setup table feeds binning, packing, gathers and
    # the raster kernels; letting XLA fuse this producer into each consumer
    # re-runs the whole cull chain per consumer (composed-stage timings
    # measured ~4x the isolated op without this).
    return jax.tree_util.tree_map(
        jax.lax.optimization_barrier,
        TriSetup(setup=setup, bbox=bbox, count=count, src=g, flip=flip[g]),
    )


def bin_triangles(
    tris: TriSetup,
    width: int,
    height: int,
    *,
    tile_cap: int = 512,
    row_cap: Optional[int] = None,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    y0=0,
) -> BinnedTris:
    """Two-level (tile-row then tile) compaction binning.

    Returns per-tile id lists into the setup table. Tiles are (TILE_H,
    TILE_W) pixels, row-major. width/height are padded sizes (multiples of
    TILE_W / TILE_H). y0: optional traced absolute row of the first tile
    row (multi-chip band rendering): tile r covers rows [y0 + r*tile_h, ...).
    """
    V = tris.setup.shape[0]
    n_rows = height // tile_h
    n_cols = width // tile_w
    row_cap = row_cap or min(V, 1 << 14)
    y0f = jnp.asarray(y0, jnp.float32)

    xmin, ymin, xmax, ymax = tris.bbox[:, 0], tris.bbox[:, 1], tris.bbox[:, 2], tris.bbox[:, 3]

    if V <= (1 << 18):
        # Single level: (n_tiles, V) overlap mask + gather-compaction.
        tid = jnp.arange(n_rows * n_cols)
        tx0 = ((tid % n_cols) * tile_w).astype(jnp.float32)[:, None]
        ty0 = ((tid // n_cols) * tile_h).astype(jnp.float32)[:, None] + y0f
        mask = (
            (xmax[None, :] > tx0)
            & (xmin[None, :] < tx0 + tile_w)
            & (ymax[None, :] > ty0)
            & (ymin[None, :] < ty0 + tile_h)
        )
        ids, counts = _compact_rows(mask, tile_cap)
        overflow = jnp.maximum(counts - tile_cap, 0).sum()
        return BinnedTris(ids=ids, counts=jnp.minimum(counts, tile_cap),
                          overflow=overflow, need=counts.max())

    # Two level (large scenes): tile rows first, then columns, both
    # gather-compacted.
    rows = jnp.arange(n_rows, dtype=jnp.float32)[:, None]
    rmask = (ymax[None, :] > y0f + rows * tile_h) & (ymin[None, :] < y0f + (rows + 1) * tile_h)  # (R, V)
    row_ids, _ = _compact_rows(rmask, row_cap)

    live = row_ids >= 0
    gr = jnp.clip(row_ids, 0, V - 1)
    rxmin = jnp.where(live, xmin[gr], 1e9)                    # (R, cap)
    rxmax = jnp.where(live, xmax[gr], -1e9)
    cols = jnp.arange(n_cols, dtype=jnp.float32)[None, :, None]
    cmask = (rxmax[:, None, :] > cols * tile_w) & (rxmin[:, None, :] < (cols + 1) * tile_w)  # (R, C, cap)
    ids2, counts = _compact_rows(cmask.reshape(n_rows * n_cols, row_cap), tile_cap)
    # ids2 index into the row lists; translate to setup ids.
    rr = jnp.arange(n_rows * n_cols) // n_cols
    ids = jnp.where(ids2 >= 0, row_ids[rr[:, None], jnp.clip(ids2, 0, row_cap - 1)], -1)

    overflow = jnp.maximum(counts - tile_cap, 0).sum()
    return jax.tree_util.tree_map(
        jax.lax.optimization_barrier,
        BinnedTris(ids=ids, counts=jnp.minimum(counts, tile_cap),
                   overflow=overflow, need=counts.max()),
    )


def _rank_of(bases: jnp.ndarray, length: int, n: int) -> jnp.ndarray:
    """For strictly-increasing bases (n,), the row->segment map over
    [0, length): rank[p] = #bases <= p, minus 1 (clipped to [0, n-1]).

    Equivalent to searchsorted(bases, arange(length), 'right') - 1, but a
    1-per-base scatter + cumsum instead of a per-element binary search —
    XLA lowers searchsorted to `length * log(n)` scalar gathers, which
    measured ~60 ms at representative packing sizes (length ~500k)."""
    ind = jnp.zeros(length + 1, jnp.int32).at[jnp.clip(bases, 0, length)].add(
        1, mode="drop"
    )
    return jnp.clip(jnp.cumsum(ind[:length]) - 1, 0, n - 1).astype(jnp.int32)


class FlatChunks(NamedTuple):
    """Chunk-aligned concatenation of the per-tile binned lists for the
    chunked raster kernels (deferred.py): per-tile segments of the compacted
    tile lists, one flat id table, per-GROUP metadata carrying a band
    overlap MASK (union over the group's triangles) plus the valid-row
    count. No band duplication: kernel DMA, the XLA setup/plane row-gathers
    and the packing itself all scale with the scene's real triangle-tile
    pairs instead of the worst tile's capacity."""

    ids: jnp.ndarray         # (cap_total,) i32 triangle index per entry (-1 pad)
    chunk_base: jnp.ndarray  # (n_tiles,) i32 first chunk of the tile's segment
    n_chunks: jnp.ndarray    # (n_tiles,) i32 occupied chunks (>= 1)
    group_meta: jnp.ndarray  # (cap_total // 8,) i32: band_mask << 4 | valid_rows
    overflow: jnp.ndarray    # () i32
    need: jnp.ndarray        # () i32 chunk-aligned rows the packing actually
    #                          required — the flat-list capacity bucket the
    #                          host should jump to (one-shot, like BinnedTris
    #                          .need)


def pack_chunks(
    tris: TriSetup,
    binned: BinnedTris,
    n_bands: int,
    band_h: int,
    n_cols: int,
    chunk: int,
    cap_total: int,
    max_chunks: int,
    group: int = 8,
    y0=0,
) -> FlatChunks:
    nT, K = binned.ids.shape
    counts = jnp.minimum(binned.counts, max_chunks * chunk)
    clamp_dropped = (binned.counts - counts).sum()
    # Empty tiles occupy ZERO chunks (n_chunks = 0): a 1080p deferred target
    # has 510 tiles and a 2048 shadow map 1024 — one forced chunk per tile
    # added 32k/65k padded rows to every sparse raster class (cutout, blend,
    # shadow), dominating its flat-list capacity and the kernel's step
    # queue. The kernels' finalize writes a cleared block for chunkless
    # tiles (deferred.py _step_tables / finalize).
    tile_aligned = -(-counts // chunk) * chunk
    tile_base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(tile_aligned)[:-1].astype(jnp.int32)]
    )
    total = tile_base[-1] + tile_aligned[-1]
    overflow = jnp.maximum(total - cap_total, 0) + binned.overflow + clamp_dropped

    p = jnp.arange(cap_total, dtype=jnp.int32)
    t = _rank_of(tile_base, cap_total, nT)
    local = p - tile_base[t]
    valid = (local < counts[t]) & (p < total)
    ids = jnp.where(
        valid, binned.ids.reshape(-1)[t * K + jnp.minimum(local, K - 1)], -1
    )

    # Per-group band mask: a group is evaluated only against bands some
    # member's bbox overlaps (the lists are in triangle-id order, which is
    # spatially coherent, so the union stays tight).
    g = jnp.clip(ids, 0, tris.setup.shape[0] - 1)
    ymin = jnp.where(ids >= 0, tris.bbox[g, 1], 1e9)
    ymax = jnp.where(ids >= 0, tris.bbox[g, 3], -1e9)
    tile_y0 = ((t // n_cols) * (n_bands * band_h)).astype(jnp.float32) + jnp.asarray(y0, jnp.float32)
    b = jnp.arange(n_bands, dtype=jnp.float32)
    band_top = tile_y0[:, None] + b[None, :] * band_h     # (cap_total, nb)
    overlap = (ymax[:, None] > band_top) & (ymin[:, None] < band_top + band_h)
    ob = overlap.reshape(-1, group, n_bands).any(axis=1)  # (n_groups, nb)
    gbits = (ob.astype(jnp.int32) << jnp.arange(n_bands)).sum(axis=1)
    gvalid = (ids.reshape(-1, group) >= 0).sum(axis=1).astype(jnp.int32)
    group_meta = jnp.where(gvalid > 0, (gbits << 4) | gvalid, 0)

    max_cb = cap_total // chunk
    cb = jnp.minimum(tile_base // chunk, max_cb - 1).astype(jnp.int32)
    nchunks = jnp.clip(tile_aligned // chunk, 0, jnp.maximum(max_cb - cb, 0)).astype(jnp.int32)
    return FlatChunks(
        ids=ids,
        chunk_base=cb,
        n_chunks=nchunks,
        group_meta=group_meta,
        overflow=overflow.astype(jnp.int32),
        need=total.astype(jnp.int32),
    )
