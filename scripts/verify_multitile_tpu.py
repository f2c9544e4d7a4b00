"""On-chip validation + timing of the blocked-Schur smallk core at
n in (512, 1024] (the round-3 MAX_N=1024 extension).

1. chol_quadratics_smallk at n=600/768/1024 vs the XLA bordered path on
   the SAME f32 Grams (miscompile check: the slab core failed exactly
   here with all-NaN despite interpret-mode parity).
2. fused_mix_mh_rounds (multi-tile, stash=False) vs the XLA fallback
   rounds on identical inputs at n=600: acc/consumed flags equal,
   records close.
3. Timing: fetch-clean k1/k2 slope of the K=4 quadratics kernel vs the
   XLA bordered path at each n.
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

def make_problem(n):
    x = rng.uniform(size=(n, 3)).astype(np.float32)
    grams = []
    for t in np.linspace(1.0, 12.0, 4):
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1) * t
        grams.append(np.exp(-d2))
    grams = np.stack(grams).astype(np.float32)
    y = rng.normal(size=(n,)).astype(np.float32)
    return grams, y

# ---- 1. quadratics parity on chip ---------------------------------------
for n in (600, 768, 1024):
    grams_h, y_h = make_problem(n)
    grams, y = jnp.asarray(grams_h), jnp.asarray(y_h)
    t0 = time.time()
    qx = chol_quadratics(grams, y, jitter=1e-4, use_pallas=False)
    qs = chol_quadratics_smallk(grams, y, jitter=1e-4)
    errs = {k: float(np.max(np.abs(
        (np.asarray(qs[k]) - np.asarray(qx[k])) / np.asarray(qx[k]))))
        for k in qx}
    finite = all(np.isfinite(np.asarray(qs[k])).all() for k in qs)
    print(f"n={n} compile+run {time.time()-t0:.0f}s finite={finite} "
          f"rel errs {errs}", flush=True)

# ---- 3. timing: fetch-clean slope ----------------------------------------
def slope_time(fn, args, iters=(5, 25)):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # warm + fetch
    times = []
    for k in iters:
        t0 = time.time()
        for _ in range(k):
            out = f(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.time() - t0)
    return (times[1] - times[0]) / (iters[1] - iters[0])

for n in (600, 768, 1024):
    grams_h, y_h = make_problem(n)
    grams, y = jnp.asarray(grams_h), jnp.asarray(y_h)
    tk = slope_time(lambda g, yy: chol_quadratics_smallk(g, yy, jitter=1e-4),
                    (grams, y))
    tx = slope_time(lambda g, yy: chol_quadratics(g, yy, jitter=1e-4,
                                                  use_pallas=False),
                    (grams, y))
    print(f"n={n}: kernel {tk*1e3:.3f} ms/eval vs XLA {tx*1e3:.3f} "
          f"({tx/tk:.2f}x)", flush=True)
print("DONE quadratics")
