"""Fit checkpoint/resume.

The reference has no checkpointing at all (SURVEY section 5) — the closest
thing is persisting result tables. Here a fitted CombinedGP (posterior
draws, factor caches, plug-in MLE) round-trips through a single .npz so
expensive MCMC runs can be resumed / re-predicted without refitting.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ccgp_tpu.infer.laplace import LaplaceFit
from ccgp_tpu.infer.metropolis import MetropolisResult
from ccgp_tpu.infer.mle import KrigingMLE
from ccgp_tpu.models.combination import MixParams
from ccgp_tpu.models.combined_gp import CombinedGPFit
from ccgp_tpu.predict.factors import FactorCache


def save_fit(path: str | Path, fit: CombinedGPFit) -> None:
    flat = {
        "sigma2": fit.sigma2,
        "mle_beta": fit.mle.beta, "mle_sigma2": fit.mle.sigma2,
        "mle_theta": fit.mle.theta, "mle_nll": fit.mle.nll,
        "mle_chol": fit.mle.chol,
        "mcmc_samples": fit.mcmc.samples, "mcmc_betas": fit.mcmc.betas,
        "mcmc_logposts": fit.mcmc.logposts,
        "mcmc_n_recorded": fit.mcmc.n_recorded,
        "mcmc_n_proposals": fit.mcmc.n_proposals,
        "mcmc_n_accepted": fit.mcmc.n_accepted,
        "mcmc_pvalue": fit.mcmc.pvalue, "mcmc_converged": fit.mcmc.converged,
        "laplace_mode": fit.mcmc.laplace.mode,
        "laplace_cov": fit.mcmc.laplace.cov,
        "laplace_logpost": fit.mcmc.laplace.logpost,
        "cache_chol": fit.cache.chol, "cache_a": fit.cache.a,
        "cache_u": fit.cache.u, "cache_beta": fit.cache.beta,
        "params_p": fit.params.p, "params_theta1": fit.params.theta1,
        "params_theta2": fit.params.theta2,
        "zs": fit.zs,
    }
    if fit.chain_ok is not None:
        flat["chain_ok"] = fit.chain_ok
    if fit.y is not None:
        flat["y"] = fit.y
    if fit.jitter is not None:
        flat["jitter"] = fit.jitter
    np.savez_compressed(Path(path), **{k: np.asarray(v)
                                       for k, v in flat.items()})


def load_fit(path: str | Path) -> CombinedGPFit:
    z = np.load(Path(path))
    j = lambda k: jnp.asarray(z[k])
    mle = KrigingMLE(beta=j("mle_beta"), sigma2=j("mle_sigma2"),
                     theta=j("mle_theta"), nll=j("mle_nll"),
                     chol=j("mle_chol"))
    lap = LaplaceFit(mode=j("laplace_mode"), cov=j("laplace_cov"),
                     logpost=j("laplace_logpost"))
    mcmc = MetropolisResult(
        samples=j("mcmc_samples"), betas=j("mcmc_betas"),
        logposts=j("mcmc_logposts"), n_recorded=j("mcmc_n_recorded"),
        n_proposals=j("mcmc_n_proposals"), n_accepted=j("mcmc_n_accepted"),
        pvalue=j("mcmc_pvalue"), converged=j("mcmc_converged"), laplace=lap)
    params = MixParams(p=j("params_p"), theta1=j("params_theta1"),
                       theta2=j("params_theta2"))
    cache = FactorCache(chol=j("cache_chol"), a=j("cache_a"),
                        u=j("cache_u"), beta=j("cache_beta"), params=params)
    return CombinedGPFit(sigma2=j("sigma2"), mle=mle, mcmc=mcmc,
                         cache=cache, zs=j("zs"), params=params,
                         chain_ok=j("chain_ok") if "chain_ok" in z else None,
                         y=j("y") if "y" in z else None,
                         jitter=j("jitter") if "jitter" in z else None)
