import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.models import (
    MixtureSpec, MCMCConfig, fit_combined_gp, predict_combined_gp,
    InverseGamma,
)
from ccgp_tpu.models.serialize import save_fit, load_fit
from ccgp_tpu.ops import kernels
import pytest


@pytest.mark.slow
def test_fit_roundtrip_predicts_identically(tmp_path, rng):
    x = jnp.asarray(rng.uniform(size=(8, 2)))
    y = jnp.sin(6 * x[:, 0])
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    fit = fit_combined_gp(
        spec, x, y, jax.random.PRNGKey(0),
        mcmc=MCMCConfig(start=(1.0, 1.0, 0.0), n_max=500, samp_size=150,
                        net_samp_size=100),
        theta1_prior=InverseGamma(3, 2), theta2_prior=InverseGamma(5, 16))
    path = tmp_path / "fit.npz"
    save_fit(path, fit)
    fit2 = load_fit(path)
    xn = jnp.asarray(rng.uniform(size=(5, 2)))
    p1 = predict_combined_gp(spec, fit, x, xn, jax.random.PRNGKey(1))
    p2 = predict_combined_gp(spec, fit2, x, xn, jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(p1.mean), np.asarray(p2.mean), atol=1e-12)
    assert np.allclose(np.asarray(p1.lower), np.asarray(p2.lower), atol=1e-12)
    assert bool(fit2.mcmc.converged) == bool(fit.mcmc.converged)


@pytest.mark.slow
def test_roundtrip_preserves_all_fields(tmp_path, rng):
    """Every serialized field survives byte-exactly, including the round-2
    chain_ok flag and the Laplace proposal state needed to extend a chain."""
    x = jnp.asarray(rng.uniform(size=(8, 2)))
    y = jnp.cos(4 * x[:, 1])
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    fit = fit_combined_gp(
        spec, x, y, jax.random.PRNGKey(2),
        mcmc=MCMCConfig(start=(1.0, 1.0, 0.0), n_max=400, samp_size=120,
                        net_samp_size=80),
        theta1_prior=InverseGamma(3, 2), theta2_prior=InverseGamma(5, 16))
    path = tmp_path / "fit.npz"
    save_fit(path, fit)
    fit2 = load_fit(path)

    assert bool(fit2.chain_ok) == bool(fit.chain_ok)
    for a, b in [(fit.mcmc.samples, fit2.mcmc.samples),
                 (fit.mcmc.logposts, fit2.mcmc.logposts),
                 (fit.mcmc.laplace.mode, fit2.mcmc.laplace.mode),
                 (fit.mcmc.laplace.cov, fit2.mcmc.laplace.cov),
                 (fit.mle.theta, fit2.mle.theta),
                 (fit.cache.chol, fit2.cache.chol),
                 (fit.zs, fit2.zs),
                 (fit.params.theta2, fit2.params.theta2)]:
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(fit2.mcmc.n_recorded) == int(fit.mcmc.n_recorded)
    assert int(fit2.mcmc.n_proposals) == int(fit.mcmc.n_proposals)


@pytest.mark.slow
def test_resume_extends_chain_from_checkpoint(tmp_path, rng):
    """Checkpoint/resume the reference never had: a saved fit carries the
    Laplace mode/cov and the last retained draw, so sampling can continue
    from the checkpoint (fresh proposals from the saved proposal
    covariance, started at the saved last state) without refitting."""
    from ccgp_tpu.infer.metropolis import metropolis
    from ccgp_tpu.models import make_logpost

    x = jnp.asarray(rng.uniform(size=(8, 2)))
    y = jnp.sin(6 * x[:, 0])
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    fit = fit_combined_gp(
        spec, x, y, jax.random.PRNGKey(0),
        mcmc=MCMCConfig(start=(1.0, 1.0, 0.0), n_max=300, samp_size=100,
                        net_samp_size=80),
        theta1_prior=InverseGamma(3, 2), theta2_prior=InverseGamma(5, 16))
    path = tmp_path / "ck.npz"
    save_fit(path, fit)
    ck = load_fit(path)

    lp = make_logpost(spec, x, y, ck.sigma2,
                      theta1_prior=InverseGamma(3, 2),
                      theta2_prior=InverseGamma(5, 16))
    z_last = ck.zs[-1]
    res = metropolis(lp, z_last, jax.random.PRNGKey(9), n_max=200,
                     samp_size=80, laplace_fit=ck.mcmc.laplace)
    assert int(res.n_recorded) > 0
    assert np.all(np.isfinite(np.asarray(res.retained(80)[0])))
    # resume really started from the checkpointed state, not a new mode
    # search: the first recorded draw is reachable from z_last, and the
    # proposal covariance is the checkpointed one
    assert np.array_equal(np.asarray(res.laplace.cov),
                          np.asarray(ck.mcmc.laplace.cov))
