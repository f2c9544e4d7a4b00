"""HMC flagship drill (VERDICT r4 #6): the bench workload end-to-end
through `infer/hmc.py` — the documented mixing-policy fallback
(DESIGN.md §11) demonstrated on the real pipeline, not just per-draw
benchmarked.

Pipeline (mirrors bench.py's full-Bayes metric with HMC in place of the
RW-Metropolis chain): plug-in sigma^2 (kriging_mle_grid) -> Laplace
mode/cov -> preconditioned HMC (mass = Laplace cov) -> per-draw betas
from the posterior evaluations -> factor cache -> posterior-predictive
MC intervals on the 25x25 lattice. Reports RMSPE, 95% coverage, min-ESS
over the 4 transformed hyperparameters, divergences, and the slope-timed
wall-clock (fetch-closed batches, CLAUDE.md axon traps).

Usage: python scripts/run_hmc_flagship.py [--fast]   (--fast = tiny CPU smoke)
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import jax

    if args.fast:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from ccgp_tpu.eval.datasets import load_maximin_2d
    from ccgp_tpu.infer.diagnostics import effective_sample_size
    from ccgp_tpu.infer.hmc import hmc
    from ccgp_tpu.infer.laplace import laplace
    from ccgp_tpu.infer.mle import kriging_mle_grid
    from ccgp_tpu.models import (InverseGamma, LogNormal, MixtureSpec,
                                 make_logpost)
    from ccgp_tpu.models.combination import unpack
    from ccgp_tpu.ops import kernels
    from ccgp_tpu.predict.factors import build_factors
    from ccgp_tpu.predict.posterior import (posterior_predict,
                                            predictive_moments)

    dtype = jnp.float64 if args.fast else jnp.float32
    jitter = 1e-6 if args.fast else 1e-3
    n_samples = 100 if args.fast else 1000
    # leap=8 / warmup=300 / the reference start vector: the settings
    # scripts/run_hmc_comparison.py validated on v5e (leap=16 with a
    # 500-step warmup collapsed the f32 dual-averaging adaptation to
    # step_size 0 on this posterior — measured this round)
    n_warmup = 50 if args.fast else 300
    n_leapfrog = 8

    def f2_np(xy):
        a, b = xy[:, 0], xy[:, 1]
        return (((a - 0.2) ** 2 - (b - 0.7) ** 2)
                * np.exp(-5 * ((a - 0.8) ** 2 + (b - 0.1) ** 2))
                * np.cos(10 * (a - 0.5) * b))

    x_np = load_maximin_2d(100)
    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(f2_np(x_np), dtype)
    u = np.linspace(0, 1, 25)
    grid_np = np.stack(np.meshgrid(u, u), -1).reshape(-1, 2)
    grid = jnp.asarray(grid_np, dtype)

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    fam = kernels.sqexp_family()
    start_np = np.asarray([1.0, 1.0, 0.0, 0.0], np.float64)

    def fit_predict(x, y, grid, key):
        kh, kp = jax.random.split(key)
        mle = kriging_mle_grid(fam, x, y, jitter=jitter)
        s2 = mle.sigma2
        lp = make_logpost(spec, x, y, s2,
                          theta1_prior=LogNormal(-1.0, 1.0),
                          theta2_prior=InverseGamma(3, 4), jitter=jitter)
        lap = laplace(lambda z: lp(z).val, jnp.asarray(start_np, x.dtype),
                      maxiter=100)
        res = hmc(lambda z: lp(z).val, lap.mode, kh, n_samples=n_samples,
                  n_warmup=n_warmup, n_leapfrog=n_leapfrog,
                  mass_cov=lap.cov)
        zs = res.samples
        betas = jax.vmap(lambda z: lp(z).beta)(zs)
        cache = build_factors(spec, x, y, zs, betas, jitter=jitter)
        dm, dv = predictive_moments(spec, cache, x, grid, s2)
        pred = posterior_predict(kp, dm, dv)
        return (pred.mean, pred.lower, pred.upper, zs, res.accept_rate,
                res.n_divergent, res.step_size, s2)

    jf = jax.jit(fit_predict)
    key = jax.random.PRNGKey(7)
    out = jax.block_until_ready(jf(x, y, grid, key))

    def batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = jf(x, y, grid, key)
        float(o[7])
        return time.perf_counter() - t0

    if args.fast:
        ms = float("nan")
    else:
        batch(1)
        slopes = sorted((batch(3) - batch(1)) / 2 * 1e3 for _ in range(5))
        ms = float(np.median(slopes))

    mean, lo, hi, zs, acc, ndiv, eps, _ = out
    mean = np.asarray(mean)
    y_true = f2_np(grid_np)
    rmspe = float(np.sqrt(np.mean((y_true - mean) ** 2)))
    cover = float(np.mean((y_true >= np.asarray(lo))
                          & (y_true <= np.asarray(hi))))
    ess = np.asarray(effective_sample_size(jnp.asarray(np.asarray(zs))[None]))
    print(json.dumps({
        "metric": "hmc_flagship_2d_aniso_100pt",
        "backend": jax.default_backend(),
        "ms": round(ms, 1) if np.isfinite(ms) else None,
        "rmspe": round(rmspe, 5),
        "coverage95": round(cover, 3),
        "min_ess": round(float(np.min(ess)), 1),
        "mean_ess": round(float(np.mean(ess)), 1),
        "accept_rate": round(float(acc), 3),
        "n_divergent": int(ndiv),
        "step_size": round(float(eps), 4),
        "n_samples": n_samples,
    }))


if __name__ == "__main__":
    main()
