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


def slope_time(fn, args, iters=(5, 25)):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for k in iters:
        t0 = time.time()
        for _ in range(k):
            out = f(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.time() - t0)
    return (times[1] - times[0]) / (iters[1] - iters[0])


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
