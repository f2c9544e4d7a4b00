"""Microbench: small-batch Cholesky-quadratics latency on the TPU.

Compares, at the Metropolis hot-loop shape (n ~ 100, K = 4..32):
  * XLA bordered-Cholesky quadratics (current `chol_quadratics` XLA path)
  * the small-K latency kernel (`pallas_chol_smallk`)
  * the lane-batched kernel (throughput reference)

CAVEAT (measured): isolated slope timings of ~100 us ops on the axon
runtime are dominated by host-dispatch variance — repeated runs of this
script disagree by 2-4x and even produce negative slopes. Authoritative
comparisons for these kernels are FULL-FIT timings (the jitted
while-loop amortizes dispatch; see DESIGN.md §8's table) or the
profiler trace (results/profile). Kept for quick sanity checks only.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.ops import linalg
    from ccgp_tpu.ops.pallas_chol_lanes import chol_quadratics_lanes
    from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    n = 100
    xs = rng.uniform(size=(n, 2))
    sq = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    y_np = np.sin(5 * xs[:, 0]).astype(np.float32)

    def make_grams(k):
        rates = 1.0 + 0.3 * np.arange(k)
        g = np.exp(-rates[:, None, None] * sq[None])
        g += 1e-3 * np.eye(n)[None]
        return g.astype(np.float32)

    def slope_ms(fn, *args):
        out = jax.block_until_ready(fn(*args))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])  # fetch => true sync from here on

        def batch(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(*args)
            float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
            return time.perf_counter() - t0

        batch(2)
        k1, k2 = 4, 24
        t1 = min(batch(k1) for _ in range(3))
        t2 = min(batch(k2) for _ in range(3))
        return (t2 - t1) / (k2 - k1) * 1e3

    y = y_np  # host constant; converted inside jit

    for k in (4, 8, 16, 32):
        g_np = make_grams(k)

        xla = jax.jit(lambda g: linalg.bordered_cholesky_quadratics(
            g, jnp.asarray(y), jitter=0.0)["qyy"])
        smk = jax.jit(lambda g: chol_quadratics_smallk(
            g, jnp.asarray(y))["qyy"])
        ms_x = slope_ms(xla, jnp.asarray(g_np))
        ms_s = slope_ms(smk, jnp.asarray(g_np))
        print(f"K={k:3d}  xla_bordered={ms_x*1e3:8.1f} us   "
              f"smallk={ms_s*1e3:8.1f} us")

    g_np = make_grams(128)
    lanes = jax.jit(lambda g: chol_quadratics_lanes(
        g, jnp.asarray(y))["qyy"])
    ms_l = slope_ms(lanes, jnp.asarray(g_np))
    xla = jax.jit(lambda g: linalg.bordered_cholesky_quadratics(
        g, jnp.asarray(y), jitter=0.0)["qyy"])
    ms_x = slope_ms(xla, jnp.asarray(g_np))
    print(f"K=128  xla_bordered={ms_x*1e3:8.1f} us   lanes={ms_l*1e3:8.1f} us")


if __name__ == "__main__":
    main()
