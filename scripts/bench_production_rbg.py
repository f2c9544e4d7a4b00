"""Production-configuration full-Bayes timing: rbg keys instead of the
bench's pinned threefry PRNGKey(7).

bench.py's second metric is PINNED to the threefry stream for
round-over-round comparability (same chain, same Geweke stop — CLAUDE.md).
Production callers who don't need a pinned chain should pass
`jax.random.key(seed, impl="rbg")` to `fit_combined_gp`: XLA's
RngBitGenerator makes each speculative round ~6 us cheaper (round-2
measurement, DESIGN.md §7). This script times that configuration on the
SAME workload with the same guards — a DIFFERENT (equally valid) chain,
so its wall-clock is not comparable draw-for-draw with the pinned metric,
only end-to-end. Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    import jax

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from ccgp_tpu.eval.datasets import load_maximin_2d
    from ccgp_tpu.models import (InverseGamma, LogNormal, MCMCConfig,
                                 MixtureSpec, fit_combined_gp,
                                 predict_combined_gp)
    from ccgp_tpu.ops import kernels

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
    cfg = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=5000,
                     samp_size=1000, net_samp_size=1000, speculative=4)

    def bayes(x, y, grid, key):
        kf, kp = jax.random.split(key)
        fit = fit_combined_gp(spec, x, y, kf, mcmc=cfg,
                              theta1_prior=LogNormal(-1.0, 1.0),
                              theta2_prior=InverseGamma(3, 4),
                              jitter=jitter, mle_method="grid")
        pred = predict_combined_gp(spec, fit, x, grid, kp)
        return (pred.mean, pred.lower, pred.upper, fit.chain_ok,
                fit.mcmc.n_recorded, fit.mcmc.n_proposals, fit.sigma2,
                fit.mcmc.n_rounds)

    jf = jax.jit(bayes)
    key = jax.random.key(7, impl="rbg")
    out = jax.block_until_ready(jf(x, y, grid, key))

    def batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = jf(x, y, grid, key)
        float(o[6])
        return time.perf_counter() - t0

    batch(1)
    slopes = sorted((batch(3) - batch(1)) / 2 * 1e3 for _ in range(5))
    ms = float(np.median(slopes))

    mean, lo, hi, ok, nrec, nprop, _, nrnd = out
    mean = np.asarray(mean)
    y_true = f2_np(grid_np)
    rmspe = float(np.sqrt(np.mean((y_true - mean) ** 2)))
    cover = float(np.mean((y_true >= np.asarray(lo))
                          & (y_true <= np.asarray(hi))))
    assert np.isfinite(mean).all() and rmspe < 0.03 and cover >= 0.80
    print(json.dumps({
        "metric": "fit_predict_bayes_2d_aniso_100pt_rbg",
        "value": round(ms, 1), "unit": "ms",
        "spread": round(slopes[-1] - slopes[0], 1),
        "rmspe": round(rmspe, 5), "coverage95": round(cover, 3),
        "n_recorded": int(nrec), "n_proposals": int(nprop),
        "n_rounds": int(nrnd),
        "us_per_round": round(ms * 1e3 / max(int(nrnd), 1), 2),
        "converged": bool(ok), "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
