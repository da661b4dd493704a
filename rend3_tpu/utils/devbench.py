"""Device-side op benchmarking.

The axon TPU tunnel dispatches asynchronously, caches repeated identical
computations, and has tens of ms of round-trip latency — host-side
`block_until_ready` timing is meaningless. This helper times an op by
running it N times *inside one jitted program* (each iteration perturbed so
XLA cannot hoist or dedupe), fetching one scalar, and dividing out the
measured tunnel baseline.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["time_op", "tunnel_baseline_ms"]

_baseline = None


def tunnel_baseline_ms(refresh: bool = False) -> float:
    """Latency of a trivial program + scalar device_get."""
    global _baseline
    if _baseline is not None and not refresh:
        return _baseline

    @jax.jit
    def triv(x):
        return x + 1.0

    float(jax.device_get(triv(jnp.float32(0.0))))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(triv(jnp.float32(i + 1))))
        ts.append(time.perf_counter() - t0)
    _baseline = min(ts) * 1e3
    return _baseline


def _reduce_small(x):
    return jnp.asarray(
        [jnp.sum(v).astype(jnp.float32) for v in jax.tree_util.tree_leaves(x)]
    ).sum()


def time_op(fn: Callable, *args, iters: int = 8, name: str = "") -> float:
    """Milliseconds per call of fn(*args), measured on device.

    fn must be traceable; its first array leaf gets an additive perturbation
    each iteration so the loop cannot collapse."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    fidx = next(
        (i for i, l in enumerate(leaves)
         if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)),
        None,
    )
    if fidx is None:
        # All-integer inputs: perturb the first integer leaf by i >> 30
        # (zero for any practical iter count, but data-dependent on the
        # loop index so XLA cannot hoist the body out of the loop).
        fidx = next(
            i for i, l in enumerate(leaves)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.integer)
        )

    @jax.jit
    def looped(*args):
        leaves, _ = jax.tree_util.tree_flatten(args)

        def body(i, acc):
            ls = list(leaves)
            if jnp.issubdtype(ls[fidx].dtype, jnp.floating):
                ls[fidx] = ls[fidx] + (i.astype(ls[fidx].dtype) * jnp.asarray(1e-12, ls[fidx].dtype))
            else:
                ls[fidx] = ls[fidx] + (i >> 30).astype(ls[fidx].dtype)
            out = fn(*jax.tree_util.tree_unflatten(treedef, ls))
            return acc + _reduce_small(out)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(jax.device_get(looped(*args)))  # compile + warm
    base = tunnel_baseline_ms()
    ts = []
    for k in range(2):
        leaves2 = list(leaves)
        if jnp.issubdtype(leaves2[fidx].dtype, jnp.floating):
            leaves2[fidx] = leaves2[fidx] + jnp.asarray((k + 1) * 1e-10, leaves2[fidx].dtype)
        else:
            leaves2[fidx] = leaves2[fidx] + jnp.asarray(k + 1, leaves2[fidx].dtype) * 0
        args2 = jax.tree_util.tree_unflatten(treedef, leaves2)
        t0 = time.perf_counter()
        float(jax.device_get(looped(*args2)))
        ts.append(time.perf_counter() - t0)
    ms = max(0.0, (min(ts) * 1e3 - base)) / iters
    if name:
        print(f"{name}: {ms:.3f} ms/call (baseline {base:.1f} ms)", flush=True)
    return ms
