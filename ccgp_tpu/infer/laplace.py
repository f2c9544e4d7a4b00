"""Laplace approximation of the transformed posterior.

The reference seeds its Metropolis proposal with `LearnBayes::laplace`
(`1D Codes and Designs/1D Combined GP Public.R:669`): posterior mode via a
quasi-Newton optimization plus the inverse negative Hessian as proposal
covariance. Here the mode comes from on-device BFGS on -logpost and the
curvature from `jax.hessian` (exact second-order AD through the Cholesky
and the Bessel/spline kernels — no finite differences).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ccgp_tpu.infer.optim import minimize_bfgs


class LaplaceFit(NamedTuple):
    mode: jnp.ndarray      # posterior mode in the unconstrained space
    cov: jnp.ndarray       # inverse negative Hessian at the mode
    logpost: jnp.ndarray   # posterior value at the mode


def laplace(logpost_val: Callable, start: jnp.ndarray,
            maxiter: int = 100) -> LaplaceFit:
    """logpost_val: z -> scalar log-posterior (higher is better)."""

    def neg(z):
        return -logpost_val(z)

    mode, fmin = minimize_bfgs(neg, start, maxiter=maxiter)
    # BFGS can return NaN when the posterior surface itself NaNs (singular
    # Grams at extreme parameters); fall back to the user's start so the
    # chain still has a finite anchor instead of silently sampling nothing.
    ok = jnp.all(jnp.isfinite(mode))
    mode = jnp.where(ok, mode, start)
    fmin = jnp.where(ok, fmin, -logpost_val(start))
    hess = jax.hessian(logpost_val)(mode)
    prec = -hess
    # Symmetrize and clip eigenvalues to positive: if BFGS stalls at a
    # saddle or ridge (indefinite Hessian), the raw inverse would be an
    # invalid (non-PSD) proposal covariance and every Metropolis proposal
    # would NaN-reject (the reference would error out inside `laplace`).
    prec = 0.5 * (prec + prec.T)
    # non-finite Hessian (posterior NaNs nearby) -> identity fallback
    prec = jnp.where(jnp.all(jnp.isfinite(prec)), prec,
                     jnp.eye(prec.shape[-1], dtype=prec.dtype))
    w, q = jnp.linalg.eigh(prec)
    # Cap the covariance condition number at 1e4: a nearly-flat Hessian
    # direction (BFGS stalling short of the mode) would otherwise give the
    # random-walk proposal an absurdly wide axis and collapse the
    # acceptance rate to ~0 (observed on the 9-D ground-vibrations n=90
    # posterior). Well-conditioned fits are unaffected.
    w_floor = jnp.maximum(jnp.max(jnp.abs(w)) * 1e-4, 1e-12)
    w = jnp.maximum(w, w_floor)
    cov = (q / w) @ q.T
    return LaplaceFit(mode=mode, cov=cov, logpost=-fmin)
