"""Shared study runner: fit combined GP + both baselines, compare.

This is the framework's `compare.GP` + `Comparison.Summary` equivalent
(`1D Codes and Designs/1D Combined GP Public.R:854-903`): fit the combined
GP (plug-in sigma^2 -> Metropolis -> posterior predictive), ordinary
kriging with t-intervals, and the composite GP on the same data, then
produce the RMSPE / coverage / calibration table.
"""
from __future__ import annotations

import warnings
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.eval.compare import comparison_summary, ComparisonSummary, ModelPrediction
from ccgp_tpu.infer.mle import kriging_mle, mlegp_fit
from ccgp_tpu.models import (
    MixtureSpec, MCMCConfig, fit_combined_gp, predict_combined_gp,
    kriging_predict, cgp_fit, cgp_predict,
)
from ccgp_tpu.models.combined_gp import CombinedGPFit
from ccgp_tpu.ops.kernels import KernelFamily


class StudyResult(NamedTuple):
    summary: ComparisonSummary
    fit: CombinedGPFit
    predictions: dict     # model name -> ModelPrediction
    y_true: np.ndarray
    # min-over-parameters ESS of the retained window: Geweke convergence
    # alone can hide RW-MH mixing collapse (the flagship 2-D aniso
    # posterior converges with min ESS ~9/1000); see DESIGN.md "Mixing
    # policy" for when to prefer infer/hmc.py.
    min_ess: float = float("nan")


def run_study(
    spec: MixtureSpec,
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_new: jnp.ndarray,
    y_true: np.ndarray,
    key: jax.Array,
    mcmc: MCMCConfig,
    theta1_prior,
    theta2_prior,
    alpha: float = 0.05,
    quant_vs_truth: bool = False,     # 1-D reference computes Quant vs y_true
    sigma2=None,
    mle_family: Optional[KernelFamily] = None,
    mle_ard: bool = False,
    run_cgp: bool = True,
    run_single: bool = True,
    cgp_candidates: int = 505,
    jitter: float = 0.0,
    on_unconverged: str = "warn",     # 'warn' | 'raise' | 'ignore'
    single_variant: str = "reference",  # 'reference' (1-D) | 'mlegp' (>=2-D)
    single_fit=None,                  # precomputed mlegp/kriging fit to reuse
) -> StudyResult:
    if on_unconverged not in ("warn", "raise", "ignore"):
        raise ValueError(on_unconverged)
    k_fit, k_pred, k_cgp, k_single = jax.random.split(key, 4)

    kfit = single_fit
    if (single_variant == "mlegp" and kfit is None
            and (sigma2 is None or run_single)):
        # the >=2-D scripts take BOTH the sigma^2 plug-in and the single-GP
        # baseline from one mlegp fit (`2D...Isotropic Public.R:743-744`,
        # `Ground Vibrations...R:720-721`): fit it once, reuse below.
        # Callers that already fitted one (e.g. the heat-exchanger EB
        # path) pass it via single_fit instead of paying a second
        # multistart; skipped entirely when neither consumer needs it.
        fam = mle_family or spec.kernel1
        kfit = mlegp_fit(fam, x, y, k_single, jitter=jitter)
    if single_variant == "mlegp" and sigma2 is None:
        sigma2 = kfit.sigma2

    fit = fit_combined_gp(spec, x, y, k_fit, mcmc=mcmc,
                          theta1_prior=theta1_prior,
                          theta2_prior=theta2_prior, sigma2=sigma2,
                          mle_family=mle_family, mle_ard=mle_ard,
                          jitter=jitter)
    if on_unconverged != "ignore" and not bool(fit.chain_ok):
        msg = (
            "MCMC chain unhealthy: converged="
            f"{bool(fit.mcmc.converged)} (Geweke p={float(fit.mcmc.pvalue):.3f}"
            f" < alpha={mcmc.alpha_geweke}), n_recorded="
            f"{int(fit.mcmc.n_recorded)} vs samp_size={mcmc.samp_size} after "
            f"{int(fit.mcmc.n_proposals)} proposals; the retained window "
            "duplicates draws if under-filled. Raise n_max/max_proposals or "
            "pass on_unconverged='ignore'.")
        if on_unconverged == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    quant_ref = jnp.asarray(y_true, x.dtype) if quant_vs_truth else None
    pred = predict_combined_gp(spec, fit, x, x_new, k_pred, alpha=alpha,
                               quant_ref=quant_ref)
    predictions = {
        "combined": ModelPrediction(np.asarray(pred.mean),
                                    np.asarray(pred.lower),
                                    np.asarray(pred.upper),
                                    np.asarray(pred.quant)),
    }

    if run_single:
        fam = mle_family or spec.kernel1
        if kfit is None:
            kfit = kriging_mle(fam, x, y, k_single, ard=mle_ard,
                               jitter=jitter)
        kpred = kriging_predict(fam, x, y, kfit, x_new, alpha=alpha,
                                variant=("mlegp"
                                         if single_variant == "mlegp"
                                         else "reference"))
        predictions["single"] = ModelPrediction(np.asarray(kpred.mean),
                                                np.asarray(kpred.lower),
                                                np.asarray(kpred.upper))
    if run_cgp:
        cfit = cgp_fit(x, y, k_cgp, n_candidates=cgp_candidates)
        cpred = cgp_predict(cfit, x_new)
        predictions["cgp"] = ModelPrediction(np.asarray(cpred.mean),
                                             np.asarray(cpred.lower),
                                             np.asarray(cpred.upper))

    summary = comparison_summary(np.asarray(y_true), predictions)
    from ccgp_tpu.infer.diagnostics import effective_sample_size

    min_ess = float(np.min(np.asarray(
        effective_sample_size(jnp.asarray(fit.zs)[None]))))
    return StudyResult(summary=summary, fit=fit, predictions=predictions,
                       y_true=np.asarray(y_true), min_ess=min_ess)
