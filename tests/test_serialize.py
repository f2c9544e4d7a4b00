import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.models import (
    MixtureSpec, MCMCConfig, fit_combined_gp, predict_combined_gp,
    InverseGamma,
)
from ccgp_tpu.models.serialize import save_fit, load_fit
from ccgp_tpu.ops import kernels


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
