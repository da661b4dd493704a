"""Second-stage Mosaic repro for the bf16 "Bad lhs type" failure: the
minimal (72,512)x(72,1024) bf16 dot lowers fine standalone
(probe_bf16_dot.py), but the same dot inside sample_grid_bilinear fails.
Each variant here adds back one piece of the real kernel's context —
per-channel lane slicing of the result, accumulation into out_ref slices,
pl.when nesting, scalar-prefetch grid — to find the trigger and a
formulation that lowers.

Usage: python tools/probe_bf16_kernel.py
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, CW, NPB, C = 72, 512, 1024, 4
NPX = 4096  # full tile pixels (4 bands x 1024)


def run(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL — {str(e)[:160]}", flush=True)


def dot_bf16(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


# V1: dot + per-channel slice + ohx reduce, single step, direct out write.
def v1():
    def kernel(t_ref, y_ref, x_ref, o_ref):
        r2 = dot_bf16(t_ref[:], y_ref[:])          # (CW, NPB)
        for c in range(C):
            rc = r2[c * 128 : (c + 1) * 128]
            o_ref[c, :] = (x_ref[:] * rc).sum(axis=0)

    t = jnp.asarray(np.random.rand(R, CW), jnp.float32)
    y = jnp.asarray(np.random.rand(R, NPB), jnp.float32)
    x = jnp.asarray(np.random.rand(128, NPB), jnp.float32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, NPB), jnp.float32)
    )(t, y, x)


# V2: V1 + accumulate into out slices via  read-modify-write.
def v2():
    def kernel(t_ref, y_ref, x_ref, o_ref):
        r2 = dot_bf16(t_ref[:], y_ref[:])
        for c in range(C):
            rc = r2[c * 128 : (c + 1) * 128]
            o_ref[c, :] = o_ref[c, :] + (x_ref[:] * rc).sum(axis=0)

    t = jnp.asarray(np.random.rand(R, CW), jnp.float32)
    y = jnp.asarray(np.random.rand(R, NPB), jnp.float32)
    x = jnp.asarray(np.random.rand(128, NPB), jnp.float32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, NPB), jnp.float32)
    )(t, y, x)


# V3: V2 inside pl.when + band ds slices of a (3, NPX) coord block, i.e. the
# real kernel's structure minus the scalar-prefetch grid.
def v3():
    def kernel(t_ref, f_ref, o_ref):
        @pl.when(f_ref[0, 0] < 1.0)
        def _():
            for b in range(4):
                sl = pl.ds(b * NPB, NPB)
                fy = f_ref[1:2, sl]
                ry = jnp.round(f_ref[2:3, sl] * (R - 8)).astype(jnp.int32)
                subR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ohy = (ry == subR) * (1.0 - fy) + (ry + 1 == subR) * fy
                r2 = dot_bf16(t_ref[:], ohy)
                for c in range(C):
                    rc = r2[c * 128 : (c + 1) * 128]
                    o_ref[c, sl] = o_ref[c, sl] + rc.sum(axis=0)

    t = jnp.asarray(np.random.rand(R, CW), jnp.float32)
    f = jnp.asarray(np.random.rand(3, NPX), jnp.float32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, NPX), jnp.float32)
    )(t, f)


# V4: V3 but the dot's lhs pre-cast OUTSIDE the when (hoisted cast).
def v4():
    def kernel(t_ref, f_ref, o_ref):
        tb = t_ref[:].astype(jnp.bfloat16)

        @pl.when(f_ref[0, 0] < 1.0)
        def _():
            for b in range(4):
                sl = pl.ds(b * NPB, NPB)
                fy = f_ref[1:2, sl]
                ry = jnp.round(f_ref[2:3, sl] * (R - 8)).astype(jnp.int32)
                subR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ohy = ((ry == subR) * (1.0 - fy) + (ry + 1 == subR) * fy).astype(jnp.bfloat16)
                r2 = jax.lax.dot_general(
                    tb, ohy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for c in range(C):
                    rc = r2[c * 128 : (c + 1) * 128]
                    o_ref[c, sl] = o_ref[c, sl] + rc.sum(axis=0)

    t = jnp.asarray(np.random.rand(R, CW), jnp.float32)
    f = jnp.asarray(np.random.rand(3, NPX), jnp.float32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, NPX), jnp.float32)
    )(t, f)


# V5: transpose formulation — contract on dim 1 of a pre-transposed lhs
# (ohy.T @ trows gives (npb? no)) ... instead: r2 = (ohy^T (npb,R) x trows
# (R,CW)) -> (npb, CW): contraction (1,0), the canonical matmul shape.
def v5():
    def kernel(t_ref, f_ref, o_ref):
        @pl.when(f_ref[0, 0] < 1.0)
        def _():
            for b in range(4):
                sl = pl.ds(b * NPB, NPB)
                fy = f_ref[1:2, sl]
                ry = jnp.round(f_ref[2:3, sl] * (R - 8)).astype(jnp.int32)
                subR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ohy = (ry == subR) * (1.0 - fy) + (ry + 1 == subR) * fy
                r2 = jax.lax.dot_general(
                    ohy.T.astype(jnp.bfloat16), t_ref[:].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )                                   # (NPB, CW)
                for c in range(C):
                    rc = r2[:, c * 128 : (c + 1) * 128].T
                    o_ref[c, sl] = o_ref[c, sl] + rc.sum(axis=0)

    t = jnp.asarray(np.random.rand(R, CW), jnp.float32)
    f = jnp.asarray(np.random.rand(3, NPX), jnp.float32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, NPX), jnp.float32)
    )(t, f)


# V6: V3 with the contraction dim padded to 128 before the bf16 dot.
def v6():
    def kernel(t_ref, f_ref, o_ref):
        @pl.when(f_ref[0, 0] < 1.0)
        def _():
            for b in range(4):
                sl = pl.ds(b * NPB, NPB)
                fy = f_ref[1:2, sl]
                ry = jnp.round(f_ref[2:3, sl] * (R - 8)).astype(jnp.int32)
                subR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ohy = (ry == subR) * (1.0 - fy) + (ry + 1 == subR) * fy
                tp = jnp.pad(t_ref[:], ((0, 128 - R), (0, 0)))
                yp = jnp.pad(ohy, ((0, 128 - R), (0, 0)))
                r2 = dot_bf16(tp, yp)
                for c in range(C):
                    rc = r2[c * 128 : (c + 1) * 128]
                    o_ref[c, sl] = o_ref[c, sl] + rc.sum(axis=0)

    t = jnp.asarray(np.random.rand(R, CW), jnp.float32)
    f = jnp.asarray(np.random.rand(3, NPX), jnp.float32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, NPX), jnp.float32)
    )(t, f)




# V7: the real kernel's grid machinery — PrefetchScalarGridSpec, 3D blocks
# indexed by prefetched scalars, tile_ref[0] squeeze — with the v3 body.
def v7(dtype=jnp.bfloat16, squeeze=True):
    nT, S_steps, nCells = 8, 16, 4

    def kernel(st_ref, sp_ref, t_ref, f_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(sp_ref[s] >= 0)
        def _():
            trows = t_ref[0] if squeeze else t_ref[0, :, :]
            for b in range(4):
                sl = pl.ds(b * NPB, NPB)
                fy = f_ref[0, 1:2, sl]
                ry = jnp.round(f_ref[0, 2:3, sl] * (R - 8)).astype(jnp.int32)
                subR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ohy = (ry == subR) * (1.0 - fy) + (ry + 1 == subR) * fy
                r2 = jax.lax.dot_general(
                    trows.astype(dtype), ohy.astype(dtype),
                    (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                for c in range(C):
                    rc = r2[c * 128 : (c + 1) * 128]
                    o_ref[0, c, sl] = o_ref[0, c, sl] + rc.sum(axis=0)

    st = jnp.arange(S_steps, dtype=jnp.int32) % nT
    sp = jnp.arange(S_steps, dtype=jnp.int32) % nCells
    t = jnp.asarray(np.random.rand(nCells, R, CW), jnp.float32)
    f = jnp.asarray(np.random.rand(nT, 3, NPX), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S_steps,),
        in_specs=[
            pl.BlockSpec((1, R, CW), lambda s, st, sp: (sp[s], 0, 0)),
            pl.BlockSpec((1, 3, NPX), lambda s, st, sp: (st[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, NPX), lambda s, st, sp: (st[s], 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nT, 8, NPX), jnp.float32),
    )(st, sp, t, f)


# V8: V7 with an f32 dot (sanity: the production formulation).


if __name__ == "__main__":
    run("v1 dot+slice+reduce", v1)
    run("v2 +accumulate", v2)
    run("v3 +when/bands (kernel shape)", v3)
    run("v4 hoisted lhs cast", v4)
    run("v5 transposed matmul", v5)
    run("v6 pad contraction to 128", v6)
    run("v7 grid+prefetch bf16", lambda: v7(jnp.bfloat16))
    run("v7 grid+prefetch f32", lambda: v7(jnp.float32))
