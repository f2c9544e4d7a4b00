"""Coverage for the reference-quirk compat switches (SURVEY section 2.7 /
PARITY.md quirk dispositions)."""
import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.models import (
    MixtureSpec, MixParams, MCMCConfig, fit_combined_gp, predict_combined_gp,
    mixed_cross, InverseGamma,
)
from ccgp_tpu.ops import kernels
from ccgp_tpu.predict import predictive_moments, posterior_predict
import pytest


def _data(rng, n=10):
    x = jnp.asarray(rng.uniform(size=(n, 1)))
    y = jnp.sin(10 * x[:, 0])
    return x, y


def _fast_fit(spec, x, y, **kw):
    return fit_combined_gp(
        spec, x, y, jax.random.PRNGKey(0),
        mcmc=MCMCConfig(start=(0.0, 1.0, 0.0), n_max=600, samp_size=200,
                        net_samp_size=100),
        theta1_prior=InverseGamma(3, 2), theta2_prior=InverseGamma(5, 16),
        **kw)


@pytest.mark.slow
def test_quirk2_unnormalized_cross_changes_prediction(rng):
    """Two-families corr-vec bug: the unnormalized path must scale the
    cross-correlations by (p^2+(1-p)^2) and shift predictions."""
    x, y = _data(rng)
    spec = MixtureSpec(kernels.matern_family(5.0), kernels.spline_family(),
                       dim=1)
    fit = _fast_fit(spec, x, y, mle_family=kernels.matern_family(5.0))
    xn = jnp.asarray(rng.uniform(size=(6, 1)))
    dm_fix, _ = predictive_moments(spec, fit.cache, x, xn, fit.sigma2)
    dm_bug, _ = predictive_moments(spec, fit.cache, x, xn, fit.sigma2,
                                   normalized_cross=False)
    # bug path multiplies r by s = p^2+(1-p)^2 < 1 -> shrunk deviations
    assert not np.allclose(np.asarray(dm_fix), np.asarray(dm_bug))


def test_quirk_var_scale_marginal(rng):
    x, y = _data(rng)
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=1)
    fit = _fast_fit(spec, x, y)
    xn = jnp.asarray(rng.uniform(size=(5, 1)))
    _, dv_ref = predictive_moments(spec, fit.cache, x, xn, fit.sigma2)
    _, dv_marg = predictive_moments(spec, fit.cache, x, xn, fit.sigma2,
                                    var_scale="marginal")
    s = (np.asarray(fit.params.p) ** 2
         + (1 - np.asarray(fit.params.p)) ** 2)[:, None]
    assert np.allclose(np.asarray(dv_marg), np.asarray(dv_ref) * s,
                       rtol=1e-10)


def test_quirk3_lambda_mode_cross_uses_scaled_rate(rng):
    """Advanced-script mismatch: rough='lambda' trains at rate lambda but
    predicts at theta1*(1+lambda)."""
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="lambda")
    params = MixParams(p=jnp.asarray(0.5), theta1=jnp.asarray(2.0),
                       theta2=jnp.asarray(3.0))
    x = jnp.asarray(rng.uniform(size=(6, 2)))
    ycross_train = mixed_cross(spec, x, x[:2], params, predict=False)
    ycross_pred = mixed_cross(spec, x, x[:2], params, predict=True)
    # training rough rate = 3.0; prediction rough rate = 2*(1+3) = 8
    import scipy.spatial.distance as ssd
    d2 = ssd.cdist(np.asarray(x), np.asarray(x[:2])) ** 2
    want_train = (0.25 * np.exp(-2 * d2) + 0.25 * np.exp(-3 * d2)) / 0.5
    want_pred = (0.25 * np.exp(-2 * d2) + 0.25 * np.exp(-8 * d2)) / 0.5
    assert np.allclose(np.asarray(ycross_train), want_train, atol=1e-12)
    assert np.allclose(np.asarray(ycross_pred), want_pred, atol=1e-12)


def test_quirk6_negative_variance_toggle(rng):
    dm = jnp.asarray(rng.normal(size=(50, 2)))
    dv = jnp.asarray(rng.uniform(0.1, 1.0, size=(50, 2)))
    dv = dv.at[:10, 0].set(-0.5)
    kept = posterior_predict(jax.random.PRNGKey(0), dm, dv,
                             drop_negative_var=True)
    raw = posterior_predict(jax.random.PRNGKey(0), dm, dv,
                            drop_negative_var=False)
    # unmasked mean includes the negative-variance draws' means
    assert not np.isclose(float(kept.mean[0]), float(raw.mean[0]))
    assert np.isclose(float(kept.mean[1]), float(raw.mean[1]))


def test_record_all_vs_accepted_distribution(rng):
    """Both recording modes must target the same posterior, but produce
    different chains (quirk 1)."""
    from types import SimpleNamespace
    from ccgp_tpu.infer import metropolis

    prec = jnp.asarray([[1.0]])

    def lp(z):
        return SimpleNamespace(val=-0.5 * (z[0] - 2.0) ** 2, beta=z[0])

    res_a = metropolis(lp, jnp.zeros(1), jax.random.PRNGKey(0), n_max=3000,
                       samp_size=2000, alpha_geweke=0.95)
    res_s = metropolis(lp, jnp.zeros(1), jax.random.PRNGKey(0), n_max=3000,
                       samp_size=2000, alpha_geweke=0.95, record="all")
    za, _, _ = res_a.retained(2000)
    zs, _, _ = res_s.retained(2000)
    # both roughly centered at 2 (same stationary distribution)
    assert abs(float(jnp.mean(za)) - 2.0) < 0.25
    assert abs(float(jnp.mean(zs)) - 2.0) < 0.25
    # accepted-only chains mix "faster" per recorded draw: lag-1 autocorr
    # of the accepted-only chain is lower
    def lag1(v):
        v = np.asarray(v)[:, 0]
        v = v - v.mean()
        return float(np.dot(v[:-1], v[1:]) / np.dot(v, v))
    assert lag1(za) < lag1(zs)
