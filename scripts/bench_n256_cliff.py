"""Diagnose the n=256 full-Bayes latency cliff (round-2 scaling table:
1.386 ms/recorded-draw at n=256 vs 0.847 at n=512 — an inversion).

Hypothesis: the bordered-Cholesky fallback factorizes an (n+2) x (n+2)
matrix; at n=256 that is 258 — just past the clean two-tile boundary, so
XLA pads the factorization to the next lane multiple and burns ~3.4x the
FLOPs. A plain Cholesky(256) + two triangular solves stays tile-aligned.

Times both formulations of the K=4 quadratics evaluation at n in
{128, 254, 256, 384, 512} with the slope protocol.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def slope(fn, args, k1=4, k2=16, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))

    def run_batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    run_batch(2)
    t1 = min(run_batch(k1) for _ in range(reps))
    t2 = min(run_batch(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from ccgp_tpu.ops import linalg

    dtype = jnp.float32
    K = 4
    rng = np.random.default_rng(0)
    for n in (128, 254, 256, 384, 512):
        a = rng.normal(size=(K, n, n)).astype(np.float32)
        grams_np = (a @ a.transpose(0, 2, 1) / n
                    + np.eye(n, dtype=np.float32))
        y_np = rng.normal(size=(n,)).astype(np.float32)
        grams = jnp.asarray(grams_np)
        yv = jnp.asarray(y_np)

        def bordered(g, y):
            q = linalg.bordered_cholesky_quadratics(g, y, jitter=1e-3)
            return q["logdet"] + q["qyy"] + q["qoy"] + q["qoo"]

        def plain(g, y):
            gj = g + 1e-3 * jnp.mean(
                jnp.diagonal(g, axis1=-2, axis2=-1), axis=-1
            )[:, None, None] * jnp.eye(n, dtype=g.dtype)
            chol = jnp.linalg.cholesky(gj)
            b = jnp.stack([jnp.broadcast_to(y, (K, n)),
                           jnp.ones((K, n), g.dtype)], -1)
            w = jax.lax.linalg.triangular_solve(chol, b, left_side=True,
                                                lower=True)
            wy, wo = w[..., 0], w[..., 1]
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(
                chol, axis1=-2, axis2=-1)), -1)
            return (logdet + jnp.sum(wy * wy, -1) + jnp.sum(wy * wo, -1)
                    + jnp.sum(wo * wo, -1))

        ms_b = slope(jax.jit(bordered), (grams, yv))
        ms_p = slope(jax.jit(plain), (grams, yv))
        print(json.dumps({"n": n, "bordered_ms": round(ms_b, 3),
                          "plain_chol_ms": round(ms_p, 3)}), flush=True)


if __name__ == "__main__":
    main()
