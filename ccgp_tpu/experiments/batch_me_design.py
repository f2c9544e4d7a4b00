"""Batch-sequential maximum-entropy design study (reference `Batch
Sequential ME Designs/Batch Sequential ME Design.R:963-1108`, paper sec. 7):

  1. first batch: the shipped 14-pt initial ME design for the prior means
     (p=0.5, theta1=1, theta2=4), or regenerate it with me_design;
  2. observe y, plug-in sigma2, Metropolis posterior on batch 1;
  3. plug in the posterior mean (or MAP via the stored log-posts) and find
     a 7-pt second batch by augmented entropy;
  4. optionally: the k-medoids variant — one 7-pt subdesign per posterior
     draw, clustered to 7 medoids (the reference ships only the output of
     this step; All_Subdesigns.txt / k-medoids ME Design.txt);
  5. refit on all 21 points and compare.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.design import me_design, batch_me_design, kmedoids
from ccgp_tpu.eval.datasets import load_initial_me_design
from ccgp_tpu.eval.functions import test_function_batch
from ccgp_tpu.experiments.common import run_study, StudyResult
from ccgp_tpu.models import (
    MixtureSpec, MixParams, MCMCConfig, fit_combined_gp, InverseGamma,
)
from ccgp_tpu.ops import kernels


@dataclass(frozen=True)
class Config:
    func: int = 1
    n_first: int = 14
    n_second: int = 7
    n_starts: int = 25
    plug_in: str = "posterior_mean"    # 'posterior_mean' | 'map'
    regenerate_first: bool = False
    kmedoids_draws: int = 0            # >0: k-medoids variant over draws
    n_new_axis: int = 25
    mcmc: MCMCConfig = MCMCConfig(start=(1.0, 1.0, 0.0), n_max=5000,
                                  samp_size=1000, net_samp_size=1000)


class BatchDesignResult(NamedTuple):
    d_first: np.ndarray
    d_second: np.ndarray
    plug_in_params: MixParams
    log_entropy: float
    study: Optional[StudyResult]
    d_second_kmedoids: Optional[np.ndarray]


def run(cfg: Config = Config(), key=None, dtype=jnp.float64,
        refit: bool = True) -> BatchDesignResult:
    key = jax.random.PRNGKey(0) if key is None else key
    k_first, k_fit, k_design, k_med, k_study = jax.random.split(key, 5)
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    prior_params = MixParams(p=jnp.asarray(0.5, dtype),
                             theta1=jnp.asarray(1.0, dtype),
                             theta2=jnp.asarray(4.0, dtype))

    if cfg.regenerate_first:
        first = me_design(spec, prior_params, cfg.n_first, 2, k_first,
                          n_starts=cfg.n_starts)
        d_first = np.asarray(first.design)
    else:
        d_first = load_initial_me_design()
    x1 = jnp.asarray(d_first, dtype)
    y1 = test_function_batch(x1, cfg.func)

    fit = fit_combined_gp(spec, x1, y1, k_fit, mcmc=cfg.mcmc,
                          theta1_prior=InverseGamma(3, 2),
                          theta2_prior=InverseGamma(5, 16))

    if cfg.plug_in == "map":
        zs, _, lps = fit.mcmc.retained(cfg.mcmc.samp_size)
        z_map = zs[jnp.argmax(lps)]
        from ccgp_tpu.models.combination import unpack
        plug, _ = unpack(spec, z_map)
    else:
        plug = MixParams(p=fit.params.p.mean(),
                         theta1=fit.params.theta1.mean(),
                         theta2=fit.params.theta2.mean())

    second = batch_me_design(spec, plug, x1, cfg.n_second, k_design,
                             n_starts=cfg.n_starts)
    d_second = np.asarray(second.design)

    d_km = None
    if cfg.kmedoids_draws > 0:
        # one subdesign per posterior draw, then 7-medoids over the cloud
        m = min(cfg.kmedoids_draws, fit.zs.shape[0])
        keys = jax.random.split(k_med, m)

        def one(z, kk):
            from ccgp_tpu.models.combination import unpack
            par, _ = unpack(spec, z)
            return batch_me_design(spec, par, x1, cfg.n_second, kk,
                                   n_starts=4, maxiter=80).design

        subs = jax.lax.map(lambda zk: one(zk[0], zk[1]),
                           (fit.zs[:m], keys))
        cloud = jnp.reshape(subs, (-1, 2))
        d_km = np.asarray(kmedoids(cloud, cfg.n_second, k_med).medoids)

    study = None
    if refit:
        x_all = jnp.concatenate([x1, jnp.asarray(d_second, dtype)])
        y_all = test_function_batch(x_all, cfg.func)
        u = np.linspace(-1, 1, cfg.n_new_axis)
        x_new = jnp.asarray(np.stack(np.meshgrid(u, u), -1).reshape(-1, 2),
                            dtype)
        y_true = np.asarray(test_function_batch(x_new, cfg.func))
        study = run_study(spec, x_all, y_all, x_new, y_true, k_study,
                          cfg.mcmc, theta1_prior=InverseGamma(3, 2),
                          theta2_prior=InverseGamma(5, 16),
                          single_variant="mlegp")

    return BatchDesignResult(d_first=d_first, d_second=d_second,
                             plug_in_params=plug,
                             log_entropy=float(second.log_entropy),
                             study=study, d_second_kmedoids=d_km)
