"""On-chip validation + timing of the blocked-Schur smallk core at
n in (512, 1024] (the round-3 MAX_N=1024 extension; run before flipping
`ops.pallas_chol_smallk.DISPATCH_N_CAP` past 512).

1. chol_quadratics_smallk at n=600/768/1024 vs the XLA bordered path on
   the SAME f32 Grams (miscompile check: the slab core failed exactly
   here with all-NaN despite interpret-mode parity).
2. fused_mix_mh_rounds (multi-tile, stash=False) vs the XLA fallback
   rounds on identical inputs at n=600: acc/consumed flags equal,
   records close (f32 — the blocked reduction order may legitimately
   flip knife-edge accepts; report, don't assert).
3. Timing: fetch-clean k1/k2 slope of the K=4 quadratics kernel vs the
   XLA bordered path at each n.

Each size runs in a try/except: n=1024's working set may exceed the
~100 MB VMEM kernel limit (est. ~120 MB at K=4), and that must surface
as a per-size FAIL line, not kill the sweep.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

from ccgp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from ccgp_tpu.ops.pallas_chol import chol_quadratics
from ccgp_tpu.ops import pallas_chol_smallk as smallk
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


# ---- 1. quadratics parity on chip ---------------------------------------
ok_sizes = []
for n in SIZES:
    grams_h, y_h = make_problem(n)
    grams, y = jnp.asarray(grams_h), jnp.asarray(y_h)
    t0 = time.time()
    try:
        qx = chol_quadratics(grams, y, jitter=1e-4, use_pallas=False)
        qs = chol_quadratics_smallk(grams, y, jitter=1e-4)
        errs = {k: float(np.max(np.abs(
            (np.asarray(qs[k]) - np.asarray(qx[k])) / np.asarray(qx[k]))))
            for k in qx}
        finite = all(np.isfinite(np.asarray(qs[k])).all() for k in qs)
        print(f"n={n} compile+run {time.time()-t0:.0f}s finite={finite} "
              f"rel errs {errs}", flush=True)
        if finite and max(errs.values()) < 1e-3:
            ok_sizes.append(n)
    except Exception:
        print(f"n={n} FAIL after {time.time()-t0:.0f}s:", flush=True)
        traceback.print_exc()

# ---- 2. multi-round MH kernel vs the XLA fallback at n=600 ---------------
if 600 in ok_sizes:
    try:
        from ccgp_tpu.models import MixtureSpec
        from ccgp_tpu.models.likelihood import make_logpost, make_mh_rounds
        from ccgp_tpu.ops import kernels

        n, d, K, R = 600, 3, 4, 20
        x_h = rng.uniform(size=(n, d)).astype(np.float32)
        y_h = (np.sin(3 * x_h[:, 0]) + x_h[:, 1] * x_h[:, 2]
               + 0.1 * rng.normal(size=n)).astype(np.float32)
        fam = kernels.sqexp_family()
        spec = MixtureSpec(fam, fam, dim=d, anisotropic=True)
        x, y = jnp.asarray(x_h), jnp.asarray(y_h)
        sigma2 = 1.0
        lp = make_logpost(spec, x, y, sigma2, jitter=3e-3)
        z0 = jnp.asarray(np.zeros(d + 2, np.float32))
        p0 = lp(z0)
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        deltas = 0.05 * jax.random.normal(k1, (R * K, d + 2),
                                          jnp.float32)
        log_u = jnp.log(jax.random.uniform(k2, (R, K), jnp.float32))

        outs = {}
        for label, cap in (("kernel", 1024), ("fallback", 0)):
            old = smallk.DISPATCH_N_CAP
            smallk.DISPATCH_N_CAP = cap
            try:
                mh = make_mh_rounds(spec, x, y, sigma2, jitter=3e-3)
                outs[label] = jax.tree_util.tree_map(
                    np.asarray, mh(z0, p0.val, p0.beta, deltas, log_u))
            finally:
                smallk.DISPATCH_N_CAP = old
        a, b = outs["kernel"], outs["fallback"]
        acc_eq = bool((a["acc"] == b["acc"]).all())
        con_eq = bool((a["consumed"] == b["consumed"]).all())
        rec_err = float(np.max(np.abs(a["rec"] - b["rec"])))
        print(f"n=600 rounds: acc equal={acc_eq} consumed equal={con_eq} "
              f"max|rec delta|={rec_err:.3g} "
              f"acc={a['acc'].sum()}/{R}", flush=True)
    except Exception:
        print("rounds comparison FAIL:", flush=True)
        traceback.print_exc()


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


for n in SIZES:
    if n not in ok_sizes:
        print(f"n={n}: skipped timing (parity failed)", flush=True)
        continue
    grams_h, y_h = make_problem(n)
    grams, y = jnp.asarray(grams_h), jnp.asarray(y_h)
    tk = slope_time(lambda g, yy: chol_quadratics_smallk(g, yy, jitter=1e-4),
                    (grams, y))
    tx = slope_time(lambda g, yy: chol_quadratics(g, yy, jitter=1e-4,
                                                  use_pallas=False),
                    (grams, y))
    print(f"n={n}: kernel {tk*1e3:.3f} ms/eval vs XLA {tx*1e3:.3f} "
          f"({tx/tk:.2f}x)", flush=True)
print("DONE verify_multitile_tpu")
