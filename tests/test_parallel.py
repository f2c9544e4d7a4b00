"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccgp_tpu.models import MixtureSpec, InverseGamma
from ccgp_tpu.ops import kernels
from ccgp_tpu.parallel import (
    make_mesh, sharded_hyperpar_scan, multi_chain_metropolis,
    distributed_train_step,
)


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _spec():
    return MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["mp"] == 8


def test_sharded_hyperpar_scan_matches_serial(rng):
    x = jnp.asarray(rng.uniform(size=(10, 2)))
    y = jnp.asarray(rng.normal(size=10))
    grid = np.array([[3.0, 2.0, 5.0, 16.0], [3.0, 1.0, 5.0, 75.0],
                     [7.0, 3.0, 3.0, 28.0]])
    mesh = make_mesh(8)
    pars, likes = sharded_hyperpar_scan(_spec(), x, y, grid, 1.0, mesh,
                                        n_nodes=64, tau=50.0)
    from ccgp_tpu.eb import choose_hyperpars
    serial = choose_hyperpars(_spec(), x, y, grid, 1.0, n_nodes=64, tau=50.0)
    assert np.allclose(likes, np.asarray(serial.likelihoods), rtol=1e-10)
    assert np.allclose(pars, np.asarray(serial.pars))


def test_multi_chain_sharded(rng):
    from ccgp_tpu.models import make_logpost
    x = jnp.asarray(rng.uniform(size=(8, 2)))
    y = jnp.asarray(rng.normal(size=8))
    lp = make_logpost(_spec(), x, y, 1.0, theta1_prior=InverseGamma(3, 2),
                      theta2_prior=InverseGamma(5, 16))
    mesh = make_mesh(8)
    starts = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (8, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    res = multi_chain_metropolis(lp, starts, keys, mesh, n_max=200,
                                 samp_size=100, alpha_geweke=0.9)
    assert res.samples.shape == (8, 200, 3)
    assert np.all(np.asarray(res.n_recorded) > 0)
    # chains are independent: different keys -> different draws
    assert not np.allclose(np.asarray(res.samples[0]),
                           np.asarray(res.samples[1]))


def test_sharded_posterior_predict_matches_serial(rng):
    """Draws sharded over the 8-device mesh must reproduce the serial
    predictive_moments path exactly (wrong shardings/collectives change
    numbers, not shapes). 13 draws exercises the ragged pad (13 -> 16)."""
    from ccgp_tpu.parallel import sharded_posterior_predict
    from ccgp_tpu.predict.factors import build_factors
    from ccgp_tpu.predict.posterior import predictive_moments

    spec = _spec()
    x = jnp.asarray(rng.uniform(size=(9, 2)))
    y = jnp.asarray(rng.normal(size=9))
    xt = jnp.asarray(rng.uniform(size=(6, 2)))
    zs = jnp.asarray(0.2 * rng.normal(size=(13, 3)))
    betas = jnp.asarray(0.1 * rng.normal(size=13))
    mesh = make_mesh(8)
    dm, dv, mu0 = sharded_posterior_predict(spec, x, y, xt, zs, betas, 0.7,
                                            mesh, jitter=1e-8)
    cache = build_factors(spec, x, y, zs, betas, jitter=1e-8)
    dm_s, dv_s = predictive_moments(spec, cache, x, xt, 0.7)
    assert dm.shape == (13, 6) and dv.shape == (13, 6)
    assert np.allclose(np.asarray(dm), np.asarray(dm_s), rtol=1e-12)
    assert np.allclose(np.asarray(dv), np.asarray(dv_s), rtol=1e-10)
    assert np.allclose(np.asarray(mu0), np.asarray(dm_s).mean(0), rtol=1e-12)


def test_sharded_design_sweep(rng):
    """The 100-design simulation-study axis: one kriging fit per design,
    designs sharded over the mesh."""
    from ccgp_tpu.parallel import sharded_design_sweep
    from ccgp_tpu.infer import kriging_mle
    from ccgp_tpu.eval.functions import test_function_2d

    mesh = make_mesh(8)
    designs = jnp.asarray(rng.uniform(size=(10, 9, 2)))  # 10 designs, pad->16

    def fit_one(design, key):
        y = test_function_2d(design, 3)
        fit = kriging_mle(kernels.sqexp_family(), design, y, key,
                          n_starts=4, maxiter=30)
        return fit.sigma2, fit.theta

    keys = jax.random.split(jax.random.PRNGKey(0), 10)
    s2, th = sharded_design_sweep(fit_one, designs, keys, mesh)
    assert s2.shape == (10,)
    assert np.all(np.isfinite(np.asarray(s2)))
    # spot-check one lane against a direct fit
    y3 = test_function_2d(designs[3], 3)
    direct = kriging_mle(kernels.sqexp_family(), designs[3], y3, keys[3],
                         n_starts=4, maxiter=30)
    assert np.isclose(float(s2[3]), float(direct.sigma2), rtol=1e-8)


def test_distributed_train_step(rng):
    x = jnp.asarray(rng.uniform(size=(8, 2)))
    y = jnp.asarray(rng.normal(size=8))
    x_eval = jnp.asarray(rng.uniform(size=(16, 2)))
    mesh = make_mesh(8)
    step, make_state = distributed_train_step(
        _spec(), x, y, x_eval, 1.0, 0.1 * jnp.eye(3), mesh,
        theta1_prior=InverseGamma(3, 2), theta2_prior=InverseGamma(5, 16))
    state = make_state(jax.random.PRNGKey(0), 8, jnp.asarray([0.0, 1.0, 0.0]))
    for _ in range(3):
        state, metrics = step(state)
    assert np.isfinite(float(metrics["mean_logpost"]))
    assert metrics["grid_mean"].shape == (16,)
    assert 0.0 <= float(metrics["acc_rate"]) <= 1.0


@pytest.mark.slow
def test_sim_2d_sweep_mesh_matches_single():
    """The CLI-exposed sweep (designs sharded over the mesh) returns the
    same per-design results as the unsharded run."""
    from ccgp_tpu.experiments import sim_2d_sweep
    from ccgp_tpu.models import MCMCConfig

    cfg = dict(func=2, n_designs=8, n_new_axis=5,
               mcmc=MCMCConfig(start=(1.0, 1.0, 0.0), n_max=300,
                               samp_size=100, net_samp_size=80))
    key = jax.random.PRNGKey(0)
    # f64: in f32 the sharded/unsharded compilation variants round
    # differently and the MCMC accept chain amplifies one flipped
    # comparison into a different trajectory
    r1 = sim_2d_sweep.run(sim_2d_sweep.Config(mesh_devices=0, **cfg),
                          key=key, dtype=jnp.float64)
    r8 = sim_2d_sweep.run(sim_2d_sweep.Config(mesh_devices=8, **cfg),
                          key=key, dtype=jnp.float64)
    assert np.allclose(r1.rmspe, r8.rmspe, rtol=1e-9)
    assert np.allclose(r1.coverage, r8.coverage)
    assert np.array_equal(r1.chain_ok, r8.chain_ok)
