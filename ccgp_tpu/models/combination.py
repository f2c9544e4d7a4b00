"""Convex-combination covariance: the heart of the framework.

Model prior: Y(x) = beta + sigma (p Z1(x) + (1-p) Z2(x)) with independent
unit GPs Z1 (smooth), Z2 (rough), giving

    R_mix = (p^2 R1 + (1-p)^2 R2) / (p^2 + (1-p)^2),
    marginal variance (p^2 + (1-p)^2) sigma^2.

Reference constructions being covered:

* shared family, independent rates (1-D Matern, all isotropic SE cases):
  `1D Codes and Designs/1D Combined GP Public.R:577-600`,
  `2D Codes and Designs/2D Combined GP Isotropic Public.R:400-424`.
* two families (Matern smooth + cubic-spline rough):
  `1D Codes and Designs/1D Combined GP Two Families Public.R:454-481`.
* anisotropic with tied rough rates theta_rough = (1+lambda) * theta:
  `2D Codes and Designs/2D Combined GP Anisotropic Public.R:399-423`.
* "advanced" variant where MCMC treats the rough rate as a free lambda but
  prediction evaluates it at theta1*(1+lambda) — a reference inconsistency
  (`2D...Isotropic Advanced.R:456 vs :672`) reproduced only under
  compat="reference".

TPU-first notes: when both components share a distance structure (same
`raw_kind`), the O(n^2 d) pairwise-distance pass (an MXU matmul) is done
once and both correlation maps are fused elementwise on top — 2x HBM-traffic
saving over the reference's two independent Gram builds. All outputs
broadcast over leading batch axes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp

from ccgp_tpu.ops import distance
from ccgp_tpu.ops.kernels import KernelFamily
from ccgp_tpu.utils import transforms


class MixParams(NamedTuple):
    """Constrained mixture parameters.

    p       mixing weight in (0,1)
    theta1  smooth-component rate/scale (scalar, or (d,) when anisotropic)
    theta2  rough-component parameter:
              rough="free"   -> the rate/scale itself
              rough="tied"   -> lambda, with effective rate (1+lambda)*theta1
              rough="lambda" -> lambda used *directly* as the training rate
                                (the Advanced-script quirk)
    """

    p: jnp.ndarray
    theta1: jnp.ndarray
    theta2: jnp.ndarray


@dataclass(frozen=True)
class MixtureSpec:
    """Static description of a combined-GP covariance (hashable; safe as a
    jit static argument)."""

    kernel1: KernelFamily
    kernel2: KernelFamily
    dim: int = 1
    rough: str = "free"          # 'free' | 'tied' | 'lambda'
    anisotropic: bool = False    # theta1 is a per-axis (dim,) vector

    @property
    def n_params(self) -> int:
        """Length of the unconstrained sampling vector z."""
        d = self.dim if self.anisotropic else 1
        return d + 2  # (psi_1..psi_d, [psi2|zeta... see unpack], phi) layout

    def __post_init__(self):
        if self.rough not in ("free", "tied", "lambda"):
            raise ValueError(f"unknown rough mode {self.rough!r}")
        if self.rough in ("tied", "lambda") and self.kernel1.name != self.kernel2.name:
            raise ValueError("tied/lambda rough modes require a shared family")


def mix_weights(p):
    """(w1, w2, s) with w1 = p^2, w2 = (1-p)^2, s = w1 + w2."""
    w1 = p * p
    w2 = (1.0 - p) * (1.0 - p)
    return w1, w2, w1 + w2


def _effective_rates(spec: MixtureSpec, params: MixParams, predict: bool):
    """Rates fed to (kernel1, kernel2) for Gram / cross construction."""
    th1, th2 = params.theta1, params.theta2
    if spec.rough == "free":
        return th1, th2
    if spec.rough == "tied":
        lam1 = 1.0 + th2
        if spec.anisotropic:
            lam1 = lam1[..., None]  # broadcast over the per-axis rates
        return th1, lam1 * th1
    # 'lambda': training covariance uses lambda directly; the reference's
    # prediction path evaluates theta1*(1+lambda) instead (quirk 2.7-3).
    if predict:
        return th1, th1 * (1.0 + th2)
    return th1, th2


def _mixed_from_shared_raw(spec, raw, p, r1_theta, r2_theta):
    w1, w2, s = mix_weights(p)
    r1 = spec.kernel1.corr_from_raw(raw, r1_theta)
    r2 = spec.kernel2.corr_from_raw(raw, r2_theta)
    return (w1 * r1 + w2 * r2) / s


def _shareable(spec: MixtureSpec, th1, th2) -> bool:
    if spec.kernel1.raw_kind != spec.kernel2.raw_kind:
        return False
    if spec.kernel1.raw_kind == "sqdist":
        # corr_from_raw for sqexp only supports scalar rates
        return not spec.anisotropic
    return True


def mixed_gram(spec: MixtureSpec, x: jnp.ndarray, params: MixParams,
               predict: bool = False) -> jnp.ndarray:
    """R_mix on a point set x: (..., n, d) -> (..., n, n)."""
    th1, th2 = _effective_rates(spec, params, predict)
    if spec.rough == "tied" and spec.kernel1.raw_kind == "sqdist":
        # one weighted-distance matmul; rough component scales it by (1+lam)
        d1 = distance.pairwise_sqdist(x, th1)
        w1, w2, s = mix_weights(params.p)
        scale = jnp.reshape(1.0 + params.theta2, jnp.shape(params.theta2) + (1, 1))
        return (w1 * jnp.exp(-d1) + w2 * jnp.exp(-scale * d1)) / s
    if _shareable(spec, th1, th2):
        raw = spec.kernel1.raw(x)
        return _mixed_from_shared_raw(spec, raw, params.p, th1, th2)
    w1, w2, s = mix_weights(params.p)
    return (w1 * spec.kernel1.gram(x, th1) + w2 * spec.kernel2.gram(x, th2)) / s


def mixed_cross(spec: MixtureSpec, x: jnp.ndarray, y: jnp.ndarray,
                params: MixParams, predict: bool = True,
                normalized: bool = True) -> jnp.ndarray:
    """Cross-correlation between point sets x (n) and y (m) -> (..., n, m).

    `normalized=False` reproduces the reference's two-families bug where the
    correlation *vector* misses the 1/(p^2+(1-p)^2) normalization
    (`1D...Two Families Public.R:479`, the division sits outside `return`).
    """
    th1, th2 = _effective_rates(spec, params, predict)
    w1, w2, s = mix_weights(params.p)
    if _shareable(spec, th1, th2):
        raw = spec.kernel1.raw_cross(x, y)
        r1 = spec.kernel1.corr_from_raw(raw, th1)
        r2 = spec.kernel2.corr_from_raw(raw, th2)
    else:
        r1 = spec.kernel1.cross(x, y, th1)
        r2 = spec.kernel2.cross(x, y, th2)
    out = w1 * r1 + w2 * r2
    return out / s if normalized else out


# --------------------------------------------------------------------------
# unconstrained parameterization (the MCMC sampling space)
# --------------------------------------------------------------------------

def unpack(spec: MixtureSpec, z: jnp.ndarray):
    """Unconstrained z -> (MixParams, log_jacobian).

    Layouts (matching the reference start vectors):
      iso / 1-D:       z = (psi1, psi2, phi)            theta_i = e^psi_i
      anisotropic:     z = (psi_1..psi_d, phi, zeta)    lambda  = e^zeta
      'lambda' mode:   z = (psi1, psi2, phi)            lambda  = e^psi2
    """
    if spec.anisotropic:
        d = spec.dim
        psis, phi, zeta = z[..., :d], z[..., d], z[..., d + 1]
        theta1, jac1 = transforms.log_to_positive(psis)
        lam, jac_l = transforms.log_to_positive(zeta)
        p, jac_p = transforms.logit_to_unit(phi)
        log_jac = jnp.sum(jac1, axis=-1) + jac_l + jac_p
        return MixParams(p=p, theta1=theta1, theta2=lam), log_jac
    psi1, psi2, phi = z[..., 0], z[..., 1], z[..., 2]
    theta1, jac1 = transforms.log_to_positive(psi1)
    theta2, jac2 = transforms.log_to_positive(psi2)
    p, jac_p = transforms.logit_to_unit(phi)
    return MixParams(p=p, theta1=theta1, theta2=theta2), jac1 + jac2 + jac_p


def pack(spec: MixtureSpec, params: MixParams) -> jnp.ndarray:
    """Constrained MixParams -> unconstrained z (inverse of unpack)."""
    phi = transforms.unit_to_logit(params.p)
    if spec.anisotropic:
        return jnp.concatenate([
            jnp.log(jnp.atleast_1d(params.theta1)),
            phi[..., None],
            jnp.log(params.theta2)[..., None],
        ], axis=-1)
    return jnp.stack([
        jnp.log(params.theta1), jnp.log(params.theta2), phi
    ], axis=-1)
