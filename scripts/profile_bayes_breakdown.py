"""Stage-by-stage slope timing of the full-Bayesian bench pipeline.

Times cumulative prefixes of bench.py's bayes_fit_predict on the real
chip with the slope protocol (fixed dispatch/fetch costs cancel), so the
difference between consecutive rows is that stage's true cost:

    mle        kriging_mle_grid plug-in sigma^2
    laplace    + Laplace mode/cov (BFGS + AD Hessian)
    mcmc       + Geweke-stopped speculative Metropolis loop
    cache      + retained-window gather + factor cache build
    moments    + per-draw predictive moments (1000 x 625)
    full       + MC aggregation (sort/quantiles)

Every stage prefix returns one scalar that depends on the stage's output
so XLA cannot dead-code it.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def slope(fn, args, k1=2, k2=8, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile

    def run_batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    run_batch(1)
    t1 = min(run_batch(k1) for _ in range(reps))
    t2 = min(run_batch(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from ccgp_tpu.eval.datasets import load_maximin_2d
    from ccgp_tpu.infer.laplace import laplace
    from ccgp_tpu.infer.metropolis import metropolis
    from ccgp_tpu.infer.mle import kriging_mle_grid
    from ccgp_tpu.models import (InverseGamma, LogNormal, MCMCConfig,
                                 MixtureSpec, make_logpost)
    from ccgp_tpu.models.combination import unpack
    from ccgp_tpu.models.likelihood import make_mh_rounds
    from ccgp_tpu.ops import kernels
    from ccgp_tpu.predict.factors import FactorCache
    from ccgp_tpu.predict.posterior import (posterior_predict,
                                            predictive_moments)

    dtype = jnp.float32
    jitter = 1e-3

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
    cfg = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=5000,
                     samp_size=1000, net_samp_size=1000, speculative=4)
    t1p, t2p = LogNormal(-1.0, 1.0), InverseGamma(3, 4)
    key = jax.random.PRNGKey(7)
    start_np = np.asarray(cfg.start, np.float32)

    def stage_mle(x, y):
        mle = kriging_mle_grid(fam, x, y, jitter=jitter)
        return mle.sigma2

    def _mle_laplace(x, y):
        mle = kriging_mle_grid(fam, x, y, jitter=jitter)
        s2 = mle.sigma2
        lp = make_logpost(spec, x, y, s2, theta1_prior=t1p,
                          theta2_prior=t2p, jitter=jitter)
        fit = laplace(lambda z: lp(z).val, jnp.asarray(start_np),
                      maxiter=100)
        return s2, lp, fit

    def stage_laplace(x, y):
        s2, _, fit = _mle_laplace(x, y)
        return fit.mode[0] + s2

    n_train = int(x.shape[0])
    stash_rows = -(-(n_train + 2) // 8) * 8

    def _mcmc(x, y, key):
        # mirrors models/combined_gp.py's TPU path: chunked multi-round
        # Pallas driver + in-sampler factor stash (the bench pipeline)
        mle = kriging_mle_grid(fam, x, y, jitter=jitter)
        s2 = mle.sigma2
        lp = make_logpost(spec, x, y, s2, theta1_prior=t1p,
                          theta2_prior=t2p, jitter=jitter)
        rnds = make_mh_rounds(spec, x, y, s2, theta1_prior=t1p,
                              theta2_prior=t2p, jitter=jitter, stash=True)
        res = metropolis(lp, jnp.asarray(start_np), key, n_max=cfg.n_max,
                         samp_size=cfg.samp_size, batch_size=cfg.batch_size,
                         alpha_geweke=cfg.alpha_geweke, record=cfg.record,
                         speculative=cfg.speculative, mh_rounds=rnds,
                         stash_rows=stash_rows)
        return s2, res

    def stage_mcmc(x, y, key):
        s2, res = _mcmc(x, y, key)
        return res.samples[0, 0] + s2

    def _cache(x, y, key):
        # the stash makes this a retained-window gather, as in
        # combined_gp.fit_combined_gp
        s2, res = _mcmc(x, y, key)
        zs_all, betas_all, _ = res.retained(cfg.samp_size)
        zs = zs_all[cfg.samp_size - cfg.net_samp_size:]
        betas = betas_all[cfg.samp_size - cfg.net_samp_size:]
        hi = jnp.maximum(res.n_recorded - 1, 0)
        idx = jnp.clip(res.n_recorded - cfg.net_samp_size
                       + jnp.arange(cfg.net_samp_size), 0, hi)
        from ccgp_tpu.predict.factors import decode_stash

        chol, wy, wo = decode_stash(res.factors[idx], n_train)
        params, _ = jax.vmap(lambda z: unpack(spec, z))(zs)
        cache = FactorCache(chol=chol, a=wy - betas[:, None] * wo, u=wo,
                            beta=betas, params=params)
        return s2, cache

    def stage_cache(x, y, key):
        s2, cache = _cache(x, y, key)
        return cache.a[0, 0] + s2

    def _moments(x, y, grid, key):
        s2, cache = _cache(x, y, key)
        dm, dv = predictive_moments(spec, cache, x, grid, s2)
        return dm, dv

    def stage_moments(x, y, grid, key):
        dm, dv = _moments(x, y, grid, key)
        return dm[0, 0] + dv[0, 0]

    def stage_full(x, y, grid, key):
        kf, kp = jax.random.split(key)
        dm, dv = _moments(x, y, grid, kf)
        pred = posterior_predict(kp, dm, dv)
        return pred.mean[0] + pred.lower[0]

    only = set(sys.argv[1:])
    rows = []
    prev = 0.0
    for name, fn, args, kk in [
        ("mle", stage_mle, (x, y), (8, 64)),
        ("laplace", stage_laplace, (x, y), (4, 16)),
        ("mcmc", stage_mcmc, (x, y, key), (1, 3)),
        ("cache", stage_cache, (x, y, key), (1, 3)),
        ("moments", stage_moments, (x, y, grid, key), (1, 3)),
        ("full", stage_full, (x, y, grid, key), (1, 3)),
    ]:
        if only and name not in only:
            continue
        ms = slope(jax.jit(fn), args, k1=kk[0], k2=kk[1])
        rows.append({"stage": name, "cum_ms": round(ms, 2),
                     "delta_ms": round(ms - prev, 2)})
        prev = ms
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"backend": jax.default_backend(), "rows": rows}))


if __name__ == "__main__":
    main()
