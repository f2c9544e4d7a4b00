"""Trace the Metropolis loop and aggregate device time per op name.

Captures one warm 300-draw full-Bayes MCMC (the bench config) under the
JAX profiler, then parses the trace-event JSON and prints total device
time per XLA/Pallas op, sorted — the op-level answer to "where do the
~10 us/round of non-kernel overhead go".
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
                                 MixtureSpec, fit_combined_gp)
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
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    cfg = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=5000, samp_size=1000,
                     net_samp_size=1000, speculative=4)

    @jax.jit
    def mcmc_only(x, y, key):
        fit = fit_combined_gp(spec, x, y, key, mcmc=cfg,
                              theta1_prior=LogNormal(-1.0, 1.0),
                              theta2_prior=InverseGamma(3, 4), jitter=1e-3,
                              mle_method="grid")
        return fit.mcmc.n_recorded, fit.mcmc.n_proposals, fit.sigma2

    key = jax.random.PRNGKey(7)
    out = jax.block_until_ready(mcmc_only(x, y, key))
    print("n_recorded", int(out[0]), "n_proposals", int(out[1]))

    tdir = "/tmp/loop_trace"
    with jax.profiler.trace(tdir):
        out = mcmc_only(x, y, key)
        float(out[2])

    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    agg = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # us
        # keep only device-lane events (XLA ops); heuristics: has args.run_id
        # or looks like an HLO op name
        agg[name] += dur
        cnt[name] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    for name, dur in rows:
        print(f"{dur/1e3:9.2f} ms  x{cnt[name]:<7d} {name[:110]}")


if __name__ == "__main__":
    main()
