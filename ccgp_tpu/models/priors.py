"""Prior library for the combined-GP hyperparameters.

Priors are expressed as densities of the *constrained* parameter (theta, p,
lambda); the sampling-space change-of-variables Jacobian is accounted for
separately by the parameter transforms (mirroring the reference's split into
`log.prior` and `log.jacob`, `1D Codes and Designs/1D Combined GP
Public.R:633-636`).

`log_kernel` drops additive constants (all the posterior needs);
`log_prob` is fully normalized (for prior/posterior density overlays and the
EB machinery). Reference prior choices per case study:

* 1-D / 2-D iso / batch: theta1 ~ IG(3, 2), theta2 ~ IG(5, 16)
  (`1D...Public.R:636,1008-1009`)
* ground vibrations: IG(3, 1), IG(5, 75) (`Ground Vibrations
  Emulator/Combined GP Ground Vibrations.R:450`)
* heat exchanger: parameterized, defaults IG(7, 3), IG(3, 28)
  (`Heat Exchanger Emulator/Combined GP Heat Exchanger.R:462,774-775`)
* 2-D anisotropic: log theta ~ N(-1, 1) per axis, lambda ~ IG(3, 4)
  (`2D Codes and Designs/2D Combined GP Anisotropic Public.R:462`)
* p: flat on (0,1); optional Jeffreys term (commented out in every
  reference script).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class InverseGamma:
    """IG(a, b): density ∝ x^{-(a+1)} e^{-b/x}."""

    a: float
    b: float

    def log_kernel(self, x):
        return -(self.a + 1.0) * jnp.log(x) - self.b / x

    def log_prob(self, x):
        c = self.a * math.log(self.b) - math.lgamma(self.a)
        return c + self.log_kernel(x)

    def prob(self, x):
        return jnp.exp(self.log_prob(x))


@dataclass(frozen=True)
class LogNormal:
    """log x ~ N(mu, sigma^2)."""

    mu: float = 0.0
    sigma: float = 1.0

    def log_kernel(self, x):
        lx = jnp.log(x)
        return -lx - 0.5 * ((lx - self.mu) / self.sigma) ** 2

    def log_prob(self, x):
        c = -math.log(self.sigma) - 0.5 * math.log(2.0 * math.pi)
        return c + self.log_kernel(x)

    def prob(self, x):
        return jnp.exp(self.log_prob(x))


@dataclass(frozen=True)
class Uniform01:
    """Flat prior on (0, 1)."""

    def log_kernel(self, x):
        return jnp.zeros_like(x)

    def log_prob(self, x):
        return jnp.zeros_like(x)

    def prob(self, x):
        return jnp.ones_like(x)


@dataclass(frozen=True)
class JeffreysUnit:
    """p^{-1/2}(1-p)^{-1/2} — the commented-out Jeffreys option."""

    def log_kernel(self, x):
        return -0.5 * (jnp.log(x) + jnp.log1p(-x))

    def log_prob(self, x):
        return -math.log(math.pi) + self.log_kernel(x)

    def prob(self, x):
        return jnp.exp(self.log_prob(x))
