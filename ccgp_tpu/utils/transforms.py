"""Unconstrained reparameterizations and their log-Jacobians.

The reference samples in transformed space — psi = log(theta),
phi = logit(p), zeta = log(lambda) — and adds the change-of-variables
log-Jacobian to the posterior (`1D Codes and Designs/1D Combined GP
Public.R:609-641`):

    log|d theta / d psi|   =  psi
    log|d p / d phi|       = -phi - 2 log(1 + e^{-phi})
                           =  log sigmoid(phi) + log sigmoid(-phi)

These helpers provide numerically stable versions (log-sigmoid instead of
the literal expression, which overflows for large |phi|).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def log_to_positive(psi):
    """theta = exp(psi); returns (theta, log_jacobian)."""
    return jnp.exp(psi), psi


def logit_to_unit(phi):
    """p = sigmoid(phi); returns (p, log_jacobian).

    log-Jacobian = log p + log(1-p), computed via log_sigmoid for stability.
    """
    p = jax.nn.sigmoid(phi)
    log_jac = jax.nn.log_sigmoid(phi) + jax.nn.log_sigmoid(-phi)
    return p, log_jac


def positive_to_log(theta):
    return jnp.log(theta)


def unit_to_logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def tanh_box(z, lower, upper):
    """Map R^k -> (lower, upper)^k smoothly: x = mid + half*tanh(z).

    Used to run unconstrained L-BFGS on box-constrained problems (design
    search on [-1,1]^d, the CGP baseline's bounded hyperparameters).
    """
    mid = 0.5 * (upper + lower)
    half = 0.5 * (upper - lower)
    return mid + half * jnp.tanh(z)


def tanh_box_inverse(x, lower, upper):
    mid = 0.5 * (upper + lower)
    half = 0.5 * (upper - lower)
    u = jnp.clip((x - mid) / half, -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.arctanh(u)
