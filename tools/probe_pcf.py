"""Time the frame's shadow resolve at bench scale: the old path
(sample_shadow_maps 12-tap gather + XLA pcf5_from_occlusion) vs the fused
in-kernel path (resolve_shadow_pcf5), with representative sx/sy fields
(smooth light-space mapping + depth discontinuities).

Usage: python tools/probe_pcf.py [n_entries]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_entries = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hp, wp = 1088, 1920
    size = 2048
    rng = np.random.default_rng(0)

    from rend3_tpu.ops import shadow as sh
    from rend3_tpu.utils.devbench import time_op

    smaps = [jnp.asarray(rng.random((size, size), np.float32)) for _ in range(2)]

    # Representative fields: screen maps smoothly into light space (~1.2
    # texels/pixel), with blocky depth discontinuities perturbing sy.
    yy, xx = np.mgrid[0:hp, 0:wp].astype(np.float32)
    entries = []
    for e in range(n_entries):
        sx = xx * 1.07 + 30.0 * e
        sy = yy * 1.22 + ((xx // 160).astype(np.int32) % 3) * 90.0
        ref = np.clip(0.5 + 0.3 * np.sin(xx / 97.0), 0.0, 1.0).astype(np.float32)
        hit = (yy < hp - 8)
        entries.append(
            (e % 2, jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(ref), jnp.asarray(hit))
        )

    def old_path(*flat):
        es = [
            (entries[i][0], flat[3 * i], flat[3 * i + 1], flat[3 * i + 2], entries[i][4])
            for i in range(n_entries)
        ]
        e4 = [(mi, sx, sy, hit) for (mi, sx, sy, ref, hit) in es]
        occs, ovf = sh.sample_shadow_maps(smaps, e4, pair_cap=32)
        outs = [
            sh.pcf5_from_occlusion(occ, sx, sy, ref)
            for occ, (mi, sx, sy, ref, hit) in zip(occs, es)
        ]
        return outs

    def new_path(*flat):
        es = [
            (entries[i][0], flat[3 * i], flat[3 * i + 1], flat[3 * i + 2], entries[i][4])
            for i in range(n_entries)
        ]
        outs, ovf, _q = sh.resolve_shadow_pcf5(smaps, es, pair_cap=32)
        return outs

    flat = []
    for (mi, sx, sy, ref, hit) in entries:
        flat += [sx, sy, ref]

    o = jax.block_until_ready(jax.jit(old_path)(*flat))
    n = jax.block_until_ready(jax.jit(new_path)(*flat))
    # Equivalence (normalizing the old path's invalid -> 1.0 substitution).
    for i, (mi, sxe, sye, refe, hite) in enumerate(entries):
        h_m, w_m = smaps[mi].shape
        bx = jnp.floor(sxe - 0.5).astype(jnp.int32)
        by = jnp.floor(sye - 0.5).astype(jnp.int32)
        ok = hite & (bx >= 0) & (bx < w_m) & (by >= 0) & (by < h_m)
        err = float(jnp.abs(jnp.where(ok, o[i], 1.0) - n[i]).max())
        print(f"entry {i}: max err {err:.6f}", flush=True)

    time_op(old_path, *flat, iters=4, name=f"old gather+pcf5 ({n_entries} entries)")
    time_op(new_path, *flat, iters=4, name=f"fused pcf5 ({n_entries} entries)")


if __name__ == "__main__":
    main()
