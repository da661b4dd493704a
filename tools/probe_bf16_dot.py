"""Minimal Mosaic repro for the bf16 select-and-lerp matmul that failed to
lower in sample_grid_bilinear ("Bad lhs type"): try several formulations of
(R, C*128) x (R, npb) -> (C*128, npb) with bf16 operands and f32 accumulation
to find one the TPU compiler accepts.

Usage: python tools/probe_bf16_dot.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, CW, NPB = 72, 512, 1024


def run(name, kernel):
    a = jnp.asarray(np.random.rand(R, CW), jnp.float32)
    b = jnp.asarray(np.random.rand(R, NPB), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((CW, NPB), jnp.float32),
        )(a, b)
        ref = a.T @ b
        err = float(jnp.abs(out - ref).max())
        print(f"{name}: OK, max err {err:.5f}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL — {str(e)[:200]}", flush=True)


def k_f32(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def k_bf16(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:].astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def k_bf16_T(a_ref, b_ref, o_ref):
    # Pre-transpose the lhs so the contraction is the canonical (1),(0).
    at = a_ref[:].astype(jnp.bfloat16).T
    o_ref[:] = jax.lax.dot_general(
        at, b_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def k_bf16_pad128(a_ref, b_ref, o_ref):
    # Pad the contraction dim to a 128 multiple before the bf16 dot.
    a = jnp.pad(a_ref[:], ((0, 128 - R), (0, 0))).astype(jnp.bfloat16)
    b = jnp.pad(b_ref[:], ((0, 128 - R), (0, 0))).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


if __name__ == "__main__":
    run("f32 (0,0) contraction", k_f32)
    run("bf16 (0,0) contraction", k_bf16)
    run("bf16 transpose-first", k_bf16_T)
    run("bf16 pad-to-128", k_bf16_pad128)
