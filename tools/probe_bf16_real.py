"""Bisect the real sample_grid_bilinear kernel for the bf16 Mosaic failure:
verbatim body at small scale, with individual pieces removable via flags.

Usage: python tools/probe_bf16_real.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STILE_H, STILE_W, LT = 32, 128, 64
N_BANDS, BAND_H = 4, 8
INIT_BIT = N_BANDS


def build(dot_dtype, *, ohx_lerp=True, int_coords=True, w_area_in_ohy=True,
          init_branch=True):
    C = 4
    Hs, Ws = 256, 256
    H, W = 64, 256
    Gy = Gx = 4
    R = 72
    nT = (H // STILE_H) * (W // STILE_W)
    npx = STILE_H * STILE_W
    npb = BAND_H * STILE_W
    CL = 8
    cap = 8

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.random((Gy * Gx, R, C * STILE_W), np.float32))
    S = 5 * nT + 16 * cap
    st = jnp.asarray(rng.integers(0, nT, S), jnp.int32)
    spid = jnp.asarray(rng.integers(0, Gy * Gx, S), jnp.int32)
    sflags = jnp.asarray(rng.integers(0, 32, S), jnp.int32)
    coords = jnp.asarray(rng.integers(0, 250, (nT, 2, npx)), jnp.int32)
    fracs = jnp.asarray(rng.random((nT, 3, npx), np.float32))

    def kernel(st_ref, spid_ref, sflags_ref, tile_ref, coords_ref, fracs_ref, out_ref):
        s = pl.program_id(0)
        flags = sflags_ref[s]
        subR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        sub128 = jax.lax.broadcasted_iota(jnp.int32, (STILE_W, 1), 0)

        if init_branch:
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
                    fxv = fracs_ref[0, 0:1, sl]
                    fyv = fracs_ref[0, 1:2, sl]
                    wtv = fracs_ref[0, 2:3, sl]
                    if int_coords:
                        bxv = coords_ref[0, 0:1, sl]
                        byv = coords_ref[0, 1:2, sl]
                        rel_x = bxv - cx * LT
                        rel_y = byv - cy * LT
                        own = (rel_y >= 0) & (rel_y < LT) & (rel_x >= 0) & (rel_x < LT)
                        own &= (bxv >= 0) & (bxv + 1 < Ws) & (byv >= 0) & (byv + 1 < Hs)
                        ry = jnp.where(own, rel_y, -2)
                        rx = jnp.where(own, rel_x, -2)
                        w_eff = jnp.where(own, wtv, 0.0)
                    else:
                        ry = jnp.round(fracs_ref[0, 2:3, sl] * (R - 8)).astype(jnp.int32)
                        rx = jnp.round(fracs_ref[0, 0:1, sl] * 120).astype(jnp.int32)
                        w_eff = wtv
                    if w_area_in_ohy:
                        ohy = (ry == subR) * (w_eff * (1.0 - fyv)) + (ry + 1 == subR) * (w_eff * fyv)
                    else:
                        ohy = (ry == subR) * (1.0 - fyv) + (ry + 1 == subR) * fyv
                    if ohx_lerp:
                        ohx = (rx == sub128) * (1.0 - fxv) + (rx + 1 == sub128) * fxv
                    else:
                        ohx = None

                    trows = tile_ref[0]
                    r2 = jax.lax.dot_general(
                        trows.astype(dot_dtype), ohy.astype(dot_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for c in range(C):
                        rc = r2[c * STILE_W : (c + 1) * STILE_W]
                        if ohx is not None:
                            val = (ohx * rc).sum(axis=0, keepdims=True)
                            out_ref[0, c, sl] = out_ref[0, c, sl] + val[0]
                        else:
                            out_ref[0, c, sl] = out_ref[0, c, sl] + rc.sum(axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, R, C * STILE_W), lambda s, st, sp, sf: (sp[s], 0, 0)),
            pl.BlockSpec((1, 2, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
            pl.BlockSpec((1, 3, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, CL, npx), lambda s, st, sp, sf: (st[s], 0, 0)),
    )
    return lambda: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nT, CL, npx), jnp.float32),
    )(st, spid, sflags, tiles, coords, fracs)


def run(name, fn):
    try:
        jax.block_until_ready(fn())
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL — {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    run("full f32", build(jnp.float32))
    run("full bf16", build(jnp.bfloat16))
    run("bf16 no-ohx-lerp", build(jnp.bfloat16, ohx_lerp=False))
    run("bf16 no-int-coords", build(jnp.bfloat16, int_coords=False))
    run("bf16 no-w-area", build(jnp.bfloat16, w_area_in_ohy=False))
    run("bf16 no-init", build(jnp.bfloat16, init_branch=False))
