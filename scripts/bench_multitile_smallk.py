"""Latency of the multi-tile blocked-Schur small-K kernel vs the XLA
bordered fallback at n in {256, 300, 384, 512} (K=4 quadratics, the
full-Bayes sampler's per-round evaluation shape), slope protocol.

Round-3 extension: `_chol_quad_core_multitile` recurses 128-row panel +
MXU Schur downdate per level, lifting the Pallas cap from 256 to 512.
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

    jax.block_until_ready(fn(*args))

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
    from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

    K = 4
    rng = np.random.default_rng(0)
    for n in (256, 300, 384, 512):
        a = rng.normal(size=(K, n, n)).astype(np.float32)
        grams_np = (a @ a.transpose(0, 2, 1) / n
                    + np.eye(n, dtype=np.float32))
        y_np = rng.normal(size=(n,)).astype(np.float32)
        grams = jnp.asarray(grams_np)
        yv = jnp.asarray(y_np)

        def bordered(g, y):
            q = linalg.bordered_cholesky_quadratics(g, y, jitter=1e-3)
            return q["logdet"] + q["qyy"] + q["qoy"] + q["qoo"]

        def smallk(g, y):
            q = chol_quadratics_smallk(g, y, jitter=1e-3)
            return q["logdet"] + q["qyy"] + q["qoy"] + q["qoo"]

        ms_b = slope(jax.jit(bordered), (grams, yv))
        ms_s = slope(jax.jit(smallk), (grams, yv))
        print(json.dumps({"n": n, "bordered_ms": round(ms_b, 3),
                          "smallk_multitile_ms": round(ms_s, 3),
                          "speedup": round(ms_b / ms_s, 2)}), flush=True)


if __name__ == "__main__":
    main()
