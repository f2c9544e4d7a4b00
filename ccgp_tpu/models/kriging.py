"""Ordinary-kriging (single GP) fit + prediction with Student-t intervals.

This is the framework's `mlegp` replacement and the reference's
single-GP competitor:

* predictor mean beta + r'R^{-1}(y - beta 1)
  (`1D Codes and Designs/1D Combined GP Public.R:548-567`);
* universal-kriging predictive variance
  sigma2 (1 - r'R^{-1}r + (1 - 1'R^{-1}r)^2 / 1'R^{-1}1)
  (`1D...Public.R:481-492`);
* unknown-sigma2 Student-t correction (Santner/Williams/Notz):
  Q^2 = y'(R^{-1} - u u'/1'u) y with u = R^{-1}1, then
  var_post = Q^2 var / (sigma2 (n-1)) and t_{n-1} quantile intervals
  (`1D...Public.R:504-539`);
* the >=2-D scripts instead take mlegp's se.fit and build t intervals with
  df = n-1 (`2D Codes and Designs/2D Combined GP Isotropic Public.R:665-669`)
  — same formula with Q^2/(sigma2 (n-1)) ~ n/(n-1).

All Cholesky-based and batched over test blocks; no explicit inverses.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ccgp_tpu.ops import linalg
from ccgp_tpu.ops.kernels import KernelFamily

# NOTE: the `fit` argument below is an ccgp_tpu.infer.mle.KrigingMLE; it is
# duck-typed here to keep models/ free of an import cycle with infer/.


class KrigingPrediction(NamedTuple):
    mean: jnp.ndarray      # (t,)
    var: jnp.ndarray       # (t,) t-corrected predictive variance
    lower: jnp.ndarray     # (t,)
    upper: jnp.ndarray     # (t,)


def _t_quantile(p: float, df: int) -> float:
    """Student-t quantile via scipy (static args only — trace-time const)."""
    import scipy.stats

    return float(scipy.stats.t.ppf(p, df))


def kriging_predict(
    family: KernelFamily,
    x: jnp.ndarray,
    y: jnp.ndarray,
    fit: KrigingMLE,
    x_new: jnp.ndarray,
    alpha: float = 0.05,
    variant: str = "reference",     # 'reference' (1-D script) | 'mlegp'
) -> KrigingPrediction:
    """variant='reference': the 1-D script's universal-kriging variance with
    the Q^2 Student-t correction (`1D...Public.R:481-539`).

    variant='mlegp': mlegp::predict.gp(se.fit=TRUE) semantics — the >=2-D
    scripts' single-GP baseline (`Ground Vibrations Emulator/Combined GP
    Ground Vibrations.R:662-666`): se = sqrt(sig2 (1 - r'R^{-1}r)) with NO
    GLS mean-correction term and NO Q^2 rescaling, intervals mean +/-
    qt(1-alpha/2, n-1) * se. Identified by least-squares recovery of
    mlegp's exact fit from the archived GV table
    (`scripts/recover_mlegp_fit.py`: se-formula residual 1.7e-7 for this
    variant vs 3e-2 with the mean-correction term).
    """
    n = y.shape[-1]
    chol = fit.chol
    a = linalg.tri_solve(chol, y - fit.beta)       # L^{-1}(y - beta 1)
    u = linalg.tri_solve(chol, jnp.ones_like(y))   # L^{-1} 1

    r = family.cross(x, x_new, fit.theta)          # (n, t)
    v = linalg.tri_solve(chol, r)                  # (n, t)
    mean = fit.beta + jnp.einsum("n,nt->t", a, v)

    rinv_quad = jnp.einsum("nt,nt->t", v, v)
    df = n - 1
    tq = _t_quantile(1.0 - alpha / 2.0, df)

    if variant == "mlegp":
        var_post = fit.sigma2 * (1.0 - rinv_quad)
        sd_post = jnp.sqrt(jnp.maximum(var_post, 0.0))
        return KrigingPrediction(mean=mean, var=var_post,
                                 lower=mean - tq * sd_post,
                                 upper=mean + tq * sd_post)
    if variant != "reference":
        raise ValueError(variant)

    one_rinv_r = jnp.einsum("n,nt->t", u, v)
    denom = jnp.sum(u * u)
    var = fit.sigma2 * (1.0 - rinv_quad + (1.0 - one_rinv_r) ** 2 / denom)

    # Student-t correction: Q^2 = y'(R^{-1} - uu'/(1'R^{-1}1))y = n*sigma2_hat
    w = linalg.tri_solve(chol, y)
    q_sq = jnp.sum(w * w) - jnp.sum(u * w) ** 2 / denom
    var_post = q_sq * var / (fit.sigma2 * df)
    sd_post = jnp.sqrt(jnp.maximum(var_post, 0.0))
    return KrigingPrediction(mean=mean, var=var_post,
                             lower=mean - tq * sd_post,
                             upper=mean + tq * sd_post)
