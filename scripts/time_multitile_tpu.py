"""Timing-only sweep of the multi-tile blocked-Schur quadratics kernel
vs the XLA bordered path at n=600/768/1024 (K=4, v5e f32).

Split out of verify_multitile_tpu.py, whose 1e-3 parity gate skipped
timing: the qoy rel-err gap at these sizes is f32 cancellation where qoy
is tiny (adjudicated vs a CPU f64 oracle by verify_multitile_oracle.py),
not a miscompile — logdet/qoo agree at ~1e-5.  Uses the fetch-closed
k1/k2 slope protocol (CLAUDE.md axon traps).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp

from ccgp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from ccgp_tpu.ops.pallas_chol import chol_quadratics
from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
SIZES = (600, 768, 1024)


def make_problem(n):
    x = rng.uniform(size=(n, 3)).astype(np.float32)
    grams = []
    for t in np.linspace(1.0, 12.0, 4):
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1) * t
        grams.append(np.exp(-d2))
    grams = np.stack(grams).astype(np.float32)
    y = rng.normal(size=(n,)).astype(np.float32)
    return grams, y


def slope_time(fn, args, iters=(5, 25), reps=7):
    """Min-over-reps fetch-closed slope: a single (k1, k2) pair (the
    original protocol) is hostage to tunnel jitter — one slow dispatch
    batch produced NEGATIVE and 10x-off slopes on 2026-08-18, when a
    service-side slowdown pushed a trivial matmul+fetch to 175 s.
    Sanity-check the tunnel (one small matmul should fetch in < 1 s
    steady-state) before believing any number from this script."""
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = f(*args)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    batch(1)
    t1 = min(batch(iters[0]) for _ in range(reps))
    t2 = min(batch(iters[1]) for _ in range(reps))
    return (t2 - t1) / (iters[1] - iters[0])


for n in SIZES:
    grams_h, y_h = make_problem(n)
    grams, y = jnp.asarray(grams_h), jnp.asarray(y_h)
    tk = slope_time(lambda g, yy: chol_quadratics_smallk(g, yy, jitter=1e-4),
                    (grams, y))
    tx = slope_time(lambda g, yy: chol_quadratics(g, yy, jitter=1e-4,
                                                  use_pallas=False),
                    (grams, y))
    print(f"n={n}: kernel {tk*1e3:.3f} ms/eval vs XLA {tx*1e3:.3f} "
          f"({tx/tk:.2f}x)", flush=True)
print("DONE time_multitile_tpu")
