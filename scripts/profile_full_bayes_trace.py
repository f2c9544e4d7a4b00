"""Trace the EXACT bench full-Bayes program and aggregate device time.

Reuses the persistent compile cache (the program is the one bench.py just
ran), captures one warm execution under the JAX profiler, and prints
total device-time per op name — the op-level answer to where the ~50 ms
goes after the chunked-driver work.
"""
from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict
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
    from ccgp_tpu.models import (MCMCConfig, InverseGamma, LogNormal,
                                 MixtureSpec, fit_combined_gp,
                                 predict_combined_gp)
    from ccgp_tpu.ops import kernels

    dtype = jnp.float32
    x_np = load_maximin_2d(100)

    def f2_np(xy):
        a, b = xy[:, 0], xy[:, 1]
        return (((a - 0.2) ** 2 - (b - 0.7) ** 2)
                * np.exp(-5 * ((a - 0.8) ** 2 + (b - 0.1) ** 2))
                * np.cos(10 * (a - 0.5) * b))

    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(f2_np(x_np), dtype)
    u = np.linspace(0, 1, 25)
    grid = jnp.asarray(np.stack(np.meshgrid(u, u), -1).reshape(-1, 2), dtype)
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    cfg = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=5000, samp_size=1000,
                     net_samp_size=1000, speculative=4)

    # IDENTICAL structure to bench.py's bayes_fit_predict => cache hit
    def bayes_fit_predict(x, y, grid, key):
        kf, kp = jax.random.split(key)
        fit = fit_combined_gp(spec, x, y, kf, mcmc=cfg,
                              theta1_prior=LogNormal(-1.0, 1.0),
                              theta2_prior=InverseGamma(3, 4),
                              jitter=1e-3, mle_method="grid")
        pred = predict_combined_gp(spec, fit, x, grid, kp)
        return (pred.mean, pred.lower, pred.upper, fit.chain_ok,
                fit.mcmc.n_recorded, fit.mcmc.n_proposals, fit.sigma2)

    bayes_j = jax.jit(bayes_fit_predict)
    key = jax.random.PRNGKey(7)
    out = bayes_j(x, y, grid, key)
    print("warm: n_rec", int(out[4]), "n_prop", int(out[5]), flush=True)

    tdir = "/tmp/full_bayes_trace"
    with jax.profiler.trace(tdir):
        out = bayes_j(x, y, grid, key)
        float(out[6])

    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    agg = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        agg[ev.get("name", "")] += ev.get("dur", 0)
        cnt[ev.get("name", "")] += 1
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3:9.2f} ms  x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
