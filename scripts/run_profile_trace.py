"""Capture a JAX profiler trace of the north-star workload on the TPU.

Ships the per-stage trace artifact (viewable in Perfetto/TensorBoard) that
the reference has no analogue of: one warm execution of the bench MAP
fit+predict program plus one full-Bayesian fit, traced end to end. Writes
to results/profile/ and prints the trace directory.

Usage: python scripts/run_profile_trace.py
"""
from __future__ import annotations

import sys
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
    from ccgp_tpu.models import (
        MixtureSpec, MCMCConfig, InverseGamma, LogNormal, fit_combined_gp,
    )
    from ccgp_tpu.ops import kernels
    from ccgp_tpu.utils.progress import jax_trace

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

    # short chain: the trace is a per-stage artifact, not a benchmark —
    # 300 recorded draws keeps the file committable (~2 MB vs 16 MB full).
    # speculative=4 + grid MLE = the production fit path (the bench
    # config), so the trace shows the small-K Pallas kernel rounds.
    cfg = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=300, samp_size=150,
                     net_samp_size=150, speculative=4)

    def bayes(x, y, key):
        fit = fit_combined_gp(spec, x, y, key, mcmc=cfg,
                              theta1_prior=LogNormal(-1.0, 1.0),
                              theta2_prior=InverseGamma(3, 4), jitter=1e-3,
                              mle_method="grid")
        return fit.sigma2, fit.mcmc.n_recorded, fit.chain_ok

    bayes_j = jax.jit(bayes)
    key = jax.random.PRNGKey(0)
    jax.block_until_ready(bayes_j(x, y, key))   # compile outside the trace

    logdir = ROOT / "results" / "profile"
    logdir.mkdir(parents=True, exist_ok=True)
    with jax_trace(str(logdir)):
        out = bayes_j(x, y, key)
        float(out[0])  # fetch = true sync inside the trace window

    # keep only the Perfetto-viewable trace.json.gz; the raw xplane.pb is
    # ~10x bigger and redundant for inspection
    for pb in logdir.rglob("*.xplane.pb"):
        pb.unlink()

    print(f"trace written under {logdir} (backend="
          f"{jax.default_backend()}); n_recorded={int(out[1])} "
          f"chain_ok={bool(out[2])}")


if __name__ == "__main__":
    main()
