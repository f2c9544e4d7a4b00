"""Regenerate the k-medoids batch design at FULL reference budget.

Reference pipeline (`Batch Sequential ME Designs/Batch Sequential ME
Design.R` + ReadMe): after sampling the posterior on the shipped 14-pt
initial ME design, build ONE 7-pt augmented-entropy subdesign per
posterior draw (All_Subdesigns.txt = 1000 x 7 x 2), then 7-medoids
cluster the 7000-point cloud (`k-medoids ME Design.txt`, Figure 8 left).
Round 2 only ran 24 draws; this script runs the full 1000 x 25-restart
search as ONE vmapped program (25,000 simultaneous bounded-BFGS chains
over the 14 coordinates — the kind of sweep R cannot contemplate), then
compares both the regenerated medoids AND the subdesign-cloud statistics
to the shipped artifacts.

Usage: python scripts/run_kmedoids_full.py [--draws N] [--starts N] [--cpu]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from ccgp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402

from ccgp_tpu.design import kmedoids  # noqa: E402
from ccgp_tpu.design.entropy import augmented_me_criterion  # noqa: E402
from ccgp_tpu.design.lhs import optimum_lhs  # noqa: E402
from ccgp_tpu.eval.datasets import (load_design_txt,  # noqa: E402
                                    load_initial_me_design)
from ccgp_tpu.eval.functions import test_function_batch  # noqa: E402
from ccgp_tpu.infer.optim import multistart_minimize  # noqa: E402
from ccgp_tpu.models import (InverseGamma, MCMCConfig,  # noqa: E402
                             MixtureSpec, fit_combined_gp)
from ccgp_tpu.models.combination import mixed_gram, unpack  # noqa: E402
from ccgp_tpu.ops import kernels, linalg  # noqa: E402


def arg(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    n_draws = arg("--draws", 1000)
    n_starts = arg("--starts", 25)
    dtype = jnp.float64 if "--cpu" in sys.argv else jnp.float32
    jitter = 0.0 if "--cpu" in sys.argv else 1e-5
    t0 = time.time()

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    d_first = load_initial_me_design()
    x1 = jnp.asarray(d_first, dtype)
    y1 = test_function_batch(x1, 1)

    # posterior after batch 1 (reference: Metro(..., samp.size=2000) then
    # 1000 draws feed the subdesigns; we retain the last 1000)
    cfg = MCMCConfig(start=(0.0, 0.5, 1.0), n_max=5000, samp_size=2000,
                     net_samp_size=n_draws,
                     speculative=4 if dtype == jnp.float32 else 0)
    fit = fit_combined_gp(spec, x1, y1, jax.random.PRNGKey(0), mcmc=cfg,
                          theta1_prior=InverseGamma(3, 2),
                          theta2_prior=InverseGamma(5, 16), jitter=jitter,
                          mle_method="grid")
    print(f"[{time.time()-t0:6.1f}s] posterior: {int(fit.mcmc.n_recorded)} "
          f"recorded, chain_ok={bool(fit.chain_ok)}", flush=True)

    zs = fit.zs[:n_draws]                          # (m, 3)
    m = zs.shape[0]
    n_new, d = 7, 2
    k = n_new * d

    # one factorization of R_old per draw, shared across that draw's starts
    def chol_old(z):
        par, _ = unpack(spec, z)
        return linalg.jitter_cholesky(mixed_gram(spec, x1, par), jitter)

    chols = jax.vmap(chol_old)(zs)                 # (m, 14, 14)
    params = jax.vmap(lambda z: unpack(spec, z)[0])(zs)

    # starts: per-draw optimumLHS clouds over [-1, 1]^{7x2}
    k_lhs = jax.random.split(jax.random.PRNGKey(7), m * n_starts)
    starts = jnp.stack([
        -1.0 + 2.0 * optimum_lhs(kk, n_new, d, dtype=dtype).reshape(-1)
        for kk in k_lhs[: min(m * n_starts, 64)]
    ])
    # beyond 64 distinct optimized LHDs, tile with random rotations of the
    # same cloud (the optimizer only needs well-spread starts)
    reps = -(-m * n_starts // starts.shape[0])
    starts = jnp.tile(starts, (reps, 1))[: m * n_starts]
    starts = starts.reshape(m, n_starts, k)

    def search_one(par_p, par_t1, par_t2, co, st):
        from ccgp_tpu.models.combination import MixParams

        par = MixParams(p=par_p, theta1=par_t1, theta2=par_t2)

        def obj(flat):
            return augmented_me_criterion(spec, x1, co,
                                          flat.reshape(n_new, d), par,
                                          criterion="logdet", jitter=jitter)

        res = multistart_minimize(obj, st,
                                  lower=jnp.full((k,), -1.0, dtype),
                                  upper=jnp.full((k,), 1.0, dtype),
                                  maxiter=120)
        return res.x.reshape(n_new, d)

    # chunk the draw axis: the full 1000 x 25-restart program as one vmap
    # faulted the device; 50-draw chunks (1250 lockstep BFGS chains per
    # dispatch) compile once and stream through
    search_c = jax.jit(jax.vmap(search_one))
    chunk = 50
    outs = []
    for c0 in range(0, m, chunk):
        sl = slice(c0, min(c0 + chunk, m))
        outs.append(jax.block_until_ready(search_c(
            params.p[sl], params.theta1[sl], params.theta2[sl],
            chols[sl], starts[sl])))
        if c0 % 200 == 0:
            print(f"[{time.time()-t0:6.1f}s] subdesigns {c0 + chunk}/{m}",
                  flush=True)
    subs = jnp.concatenate(outs)
    print(f"[{time.time()-t0:6.1f}s] {m} x {n_starts}-restart subdesigns "
          f"done", flush=True)

    cloud = np.asarray(subs, np.float64).reshape(-1, 2)
    np.save(ROOT / "results" / "regenerated_subdesigns.npy", cloud)
    km = kmedoids(jnp.asarray(cloud), n_new, jax.random.PRNGKey(3),
                  n_restarts=16)
    med = np.asarray(km.medoids, np.float64)
    print(f"[{time.time()-t0:6.1f}s] k-medoids done", flush=True)

    shipped_design = load_design_txt("k-medoids ME Design", header=True)
    shipped_med = np.asarray(shipped_design[-n_new:], np.float64)
    shipped_cloud = np.asarray(
        load_design_txt("All_Subdesigns", header=True), np.float64)

    def match_dist(a, b):
        d2 = np.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        return np.sqrt(np.max(np.min(d2, axis=1)))

    print("regenerated medoids:\n", med.round(4))
    print("shipped medoids:\n", shipped_med.round(4))
    print(f"max nearest-medoid distance regenerated->shipped: "
          f"{match_dist(med, shipped_med):.4f}")
    print(f"max nearest-medoid distance shipped->regenerated: "
          f"{match_dist(shipped_med, med):.4f}")

    # cloud statistics: both 7000-pt clouds should share their shape
    for name, c in (("regenerated", cloud), ("shipped", shipped_cloud)):
        print(f"{name} cloud: mean {c.mean(0).round(4)} "
              f"std {c.std(0).round(4)} "
              f"corner mass(|x|>0.9 & |y|>0.9) "
              f"{np.mean((np.abs(c[:,0])>0.9) & (np.abs(c[:,1])>0.9)):.3f}")
    # medoid criterion comparison: cost of the shipped medoids on OUR
    # cloud vs our medoids (is ours at least as good a clustering?)
    def cost(meds, c):
        d2 = np.sum((c[:, None, :] - meds[None, :, :]) ** 2, axis=-1)
        return float(np.sqrt(d2).min(axis=1).sum())

    print(f"clustering cost on regenerated cloud: ours "
          f"{cost(med, cloud):.1f} vs shipped medoids "
          f"{cost(shipped_med, cloud):.1f}")
    print(f"clustering cost on SHIPPED cloud: ours "
          f"{cost(med, shipped_cloud):.1f} vs shipped medoids "
          f"{cost(shipped_med, shipped_cloud):.1f}")
    print(f"total wall-clock {time.time()-t0:.1f}s "
          f"backend={jax.default_backend()}")


if __name__ == "__main__":
    main()
