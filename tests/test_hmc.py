"""HMC sampler tests (`infer.hmc`) — Gaussian moment oracles, dual-
averaging adaptation, divergence rejection, and agreement with the
random-walk Metropolis sampler on a real combined-GP posterior.

HMC is a NEW capability (the reference's only sampler is random-walk
Metropolis, `1D...Public.R:657-719`), so there is no reference output to
match; the oracle is the target distribution itself.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccgp_tpu.infer import hmc, laplace, metropolis
from ccgp_tpu.models import MixtureSpec, InverseGamma, LogNormal, make_logpost
from ccgp_tpu.ops import kernels


def test_hmc_gaussian_moments_preconditioned():
    """Correlated Gaussian with the true covariance as mass_cov: draws
    must reproduce mean and covariance within MC error."""
    mu = jnp.asarray([1.0, -2.0, 0.5])
    a = jnp.asarray([[2.0, 0.5, 0.0], [0.5, 1.0, 0.3], [0.0, 0.3, 0.8]])
    cov = a @ a.T

    def lp(z):
        d = z - mu
        return -0.5 * d @ jnp.linalg.solve(cov, d)

    res = jax.jit(lambda k: hmc(lp, jnp.zeros(3), k, n_samples=3000,
                                n_warmup=300, n_leapfrog=8, mass_cov=cov)
                  )(jax.random.PRNGKey(0))
    zs = np.asarray(res.samples)
    assert int(res.n_divergent) == 0
    assert 0.6 < float(res.accept_rate) <= 1.0
    assert np.allclose(zs.mean(0), np.asarray(mu), atol=0.15)
    assert np.allclose(np.cov(zs.T), np.asarray(cov), atol=0.5)


def test_hmc_dual_averaging_adapts_identity_mass():
    """Badly scaled target (variances 1 vs 100) with identity mass: dual
    averaging must find a step size that keeps acceptance near target."""
    var = jnp.asarray([1.0, 100.0])

    def lp(z):
        return -0.5 * jnp.sum(z * z / var)

    res = hmc(lp, jnp.zeros(2), jax.random.PRNGKey(1), n_samples=4000,
              n_warmup=800, n_leapfrog=32)
    assert np.isfinite(float(res.step_size)) and float(res.step_size) > 0
    assert 0.6 < float(res.accept_rate) <= 0.95
    zs = np.asarray(res.samples)
    assert abs(zs[:, 0].std() - 1.0) < 0.25
    assert abs(zs[:, 1].std() - 10.0) < 2.5


def test_hmc_nan_region_rejected():
    """Trajectories entering a NaN region of the posterior (the
    framework's singular-Gram dataflow) must be rejected, never
    recorded."""

    def lp(z):
        v = -0.5 * jnp.sum(z * z)
        return jnp.where(jnp.all(jnp.abs(z) < 2.5), v, jnp.nan)

    res = hmc(lp, jnp.zeros(2), jax.random.PRNGKey(2), n_samples=2000,
              n_warmup=200, n_leapfrog=8, init_step_size=0.5)
    zs = np.asarray(res.samples)
    assert np.all(np.isfinite(zs))
    assert np.all(np.abs(zs) < 2.5)
    assert np.all(np.isfinite(np.asarray(res.logposts)))


def test_hmc_matches_metropolis_on_gp_posterior():
    """Same combined-GP posterior, two samplers: posterior means of the
    unconstrained parameters must agree within joint MC error."""
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(16, 2)))
    y = jnp.sin(5 * x[:, 0]) + jnp.cos(3 * x[:, 1])
    lp = make_logpost(spec, x, y, jnp.asarray(0.05),
                      theta1_prior=LogNormal(-1, 1),
                      theta2_prior=InverseGamma(3, 4), jitter=1e-9)

    def lp_val(z):
        return lp(z).val

    start = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    lap = laplace(lp_val, start)
    hres = jax.jit(lambda k: hmc(lp_val, lap.mode, k, n_samples=1500,
                                 n_warmup=300, n_leapfrog=8,
                                 mass_cov=lap.cov))(jax.random.PRNGKey(3))
    # alpha_geweke=0.99: nearly-unreachable stopping threshold, so the
    # chain runs to n_max and the retained window is a long-run sample
    mres = metropolis(lp, start, jax.random.PRNGKey(4), n_max=4000,
                      samp_size=1500, alpha_geweke=0.99)
    zs_m, _, _ = mres.retained(1500)
    mh = np.asarray(hres.samples).mean(0)
    mm = np.asarray(zs_m).mean(0)
    assert int(hres.n_divergent) == 0
    assert float(hres.accept_rate) > 0.5
    assert np.allclose(mh, mm, atol=0.3), (mh, mm)


def test_hmc_vmap_chains():
    """Multi-chain HMC is a vmap over (start, key), like metropolis."""

    def lp(z):
        return -0.5 * jnp.sum(z * z)

    starts = jnp.asarray([[0.5, 0.0], [-0.5, 0.2], [0.0, -0.3]])
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    res = jax.vmap(lambda s, k: hmc(lp, s, k, n_samples=500,
                                    n_warmup=100, n_leapfrog=8))(starts, keys)
    assert res.samples.shape == (3, 500, 2)
    zs = np.asarray(res.samples).reshape(-1, 2)
    assert np.allclose(zs.mean(0), 0.0, atol=0.2)
