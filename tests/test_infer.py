from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ccgp_tpu.infer import (
    minimize_bfgs, multistart_minimize, laplace, kriging_mle,
    geweke_z, geweke_pvalue, spectrum0_ar, metropolis,
)
from ccgp_tpu.ops import kernels, linalg
from ccgp_tpu.models.likelihood import profile_nll
import pytest


def test_minimize_bfgs_quadratic():
    a = jnp.asarray([1.0, -2.0, 3.0])
    x, f = minimize_bfgs(lambda z: jnp.sum((z - a) ** 2), jnp.zeros(3))
    assert np.allclose(np.asarray(x), np.asarray(a), atol=1e-6)
    assert float(f) < 1e-10


def test_multistart_box():
    # minimum of (x-2)^2 constrained to [-1, 1] is at x = 1
    starts = jnp.asarray([[-0.9], [0.0], [0.5]])
    res = multistart_minimize(lambda z: jnp.sum((z - 2.0) ** 2), starts,
                              lower=jnp.asarray([-1.0]), upper=jnp.asarray([1.0]))
    assert abs(float(res.x[0]) - 1.0) < 1e-3


def test_multistart_picks_global(rng):
    # double-well: global min at +2, local at -1
    def f(z):
        x = z[0]
        return (x * x - 1) ** 2 + 0.3 * (x - 2) ** 2

    starts = jnp.asarray(rng.uniform(-3, 3, size=(8, 1)))
    res = multistart_minimize(f, starts)
    xs = np.asarray(res.xs).ravel()
    assert np.any(np.abs(xs - 1.07) < 0.5)  # some find the global basin
    best_by_scan = xs[np.argmin(np.asarray(res.funs))]
    assert np.isclose(float(res.x[0]), best_by_scan)


def test_laplace_gaussian_exact():
    mu = jnp.asarray([1.0, -2.0])
    prec = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])

    def lp(z):
        d = z - mu
        return -0.5 * d @ prec @ d

    fit = laplace(lp, jnp.zeros(2))
    assert np.allclose(np.asarray(fit.mode), np.asarray(mu), atol=1e-6)
    assert np.allclose(np.asarray(fit.cov), np.linalg.inv(np.asarray(prec)),
                       atol=1e-5)


def test_kriging_mle_beats_fixed_theta(rng):
    # data from a known SE GP; the fitted profile NLL must be <= NLL at
    # arbitrary thetas (it is the minimizer)
    x = jnp.asarray(rng.uniform(size=(25, 2)))
    g = kernels.sqexp_gram(x, 6.0)
    chol = np.linalg.cholesky(np.asarray(g) + 1e-10 * np.eye(25))
    y = jnp.asarray(2.0 + 1.5 * chol @ rng.normal(size=25))
    fam = kernels.sqexp_family()
    fit = kriging_mle(fam, x, y, jax.random.PRNGKey(0), n_starts=8)
    assert np.isfinite(float(fit.nll))
    for th in [0.1, 1.0, 6.0, 30.0]:
        other = float(profile_nll(linalg.jitter_cholesky(fam.gram(x, th)), y))
        if np.isfinite(other):  # tiny theta -> singular Gram -> NaN
            assert float(fit.nll) <= other + 1e-6, th
    # sigma2/beta in a sane range
    assert 0.1 < float(fit.sigma2) < 50.0
    assert 0.0 < float(fit.beta) < 4.0


def test_spectrum0_matches_direct_yw(rng):
    # AR(1) series; compare Levinson-Durbin result against a direct
    # Yule-Walker solve at the AIC-chosen order
    n = 400
    x = np.zeros(n)
    e = rng.normal(size=n)
    for t in range(1, n):
        x[t] = 0.6 * x[t - 1] + e[t]
    got = float(spectrum0_ar(jnp.asarray(x)))

    # direct: for each order solve Toeplitz YW, pick AIC-min
    xc = x - x.mean()
    km = min(n - 1, int(10 * np.log10(n)))
    c = np.array([np.dot(xc[: n - l], xc[l:]) / n for l in range(km + 1)])
    best, best_aic = 0, n * np.log(c[0])
    spec = c[0]
    for k in range(1, km + 1):
        phi = scipy.linalg.solve_toeplitz(c[:k], c[1:k + 1])
        v = c[0] - phi @ c[1:k + 1]
        aic = n * np.log(v) + 2 * k
        if aic < best_aic:
            best_aic, best = aic, k
            spec = (v * n / (n - (k + 1))) / (1 - phi.sum()) ** 2
    if best == 0:
        spec = (c[0] * n / (n - 1)) / 1.0
    assert np.isclose(got, spec, rtol=1e-6)


def test_geweke_stationary_vs_drift(rng):
    n = 2000
    white = jnp.asarray(rng.normal(size=n))
    z_w = float(geweke_z(white))
    assert abs(z_w) < 4.0
    drift = jnp.asarray(rng.normal(size=n) + np.linspace(0, 5, n))
    z_d = float(geweke_z(drift))
    assert abs(z_d) > 4.0
    pv = float(geweke_pvalue(jnp.stack([white, drift], axis=1)))
    assert pv < 0.01  # min over params dominated by the drifting one


def _gaussian_logpost(mu, cov):
    prec = jnp.linalg.inv(cov)

    def lp(z):
        d = z - mu
        return SimpleNamespace(val=-0.5 * d @ prec @ d, beta=z[0])

    return lp


def test_metropolis_samples_gaussian():
    mu = jnp.asarray([0.5, -1.0])
    cov = jnp.asarray([[1.0, 0.3], [0.3, 0.5]])
    lp = _gaussian_logpost(mu, cov)
    res = metropolis(lp, jnp.zeros(2), jax.random.PRNGKey(1),
                     n_max=4000, samp_size=1000, alpha_geweke=0.5)
    assert int(res.n_recorded) >= 1000
    zs, bs, ls = res.retained(1000)
    m = np.mean(np.asarray(zs), axis=0)
    assert np.allclose(m, np.asarray(mu), atol=0.25)
    # betas recorded correctly (here beta := z[0])
    assert np.allclose(np.asarray(bs), np.asarray(zs)[:, 0], atol=1e-12)
    # logposts recorded
    assert np.all(np.isfinite(np.asarray(ls)))
    # laplace found the mode
    assert np.allclose(np.asarray(res.laplace.mode), np.asarray(mu), atol=1e-4)


def test_metropolis_accepted_only_semantics():
    mu = jnp.zeros(2)
    cov = jnp.eye(2)
    lp = _gaussian_logpost(mu, cov)
    res = metropolis(lp, jnp.zeros(2), jax.random.PRNGKey(2),
                     n_max=300, samp_size=200, alpha_geweke=0.99)
    zs = np.asarray(res.samples[: int(res.n_recorded)])
    # accepted-only: consecutive recorded draws always differ
    diffs = np.abs(np.diff(zs, axis=0)).sum(axis=1)
    assert np.all(diffs > 0)
    # acceptance count equals recorded count in 'accepted' mode
    assert int(res.n_accepted) == int(res.n_recorded)
    assert int(res.n_proposals) >= int(res.n_accepted)


def test_metropolis_record_all_repeats():
    lp = _gaussian_logpost(jnp.zeros(2), jnp.eye(2))
    res = metropolis(lp, jnp.zeros(2), jax.random.PRNGKey(3),
                     n_max=300, samp_size=200, alpha_geweke=0.99,
                     record="all")
    zs = np.asarray(res.samples[: int(res.n_recorded)])
    diffs = np.abs(np.diff(zs, axis=0)).sum(axis=1)
    assert np.any(diffs == 0)  # rejections duplicate the current state
    assert int(res.n_recorded) == 300


def test_metropolis_vmap_chains():
    lp = _gaussian_logpost(jnp.zeros(2), jnp.eye(2))
    keys = jax.random.split(jax.random.PRNGKey(4), 4)
    starts = jnp.zeros((4, 2))
    run = jax.vmap(lambda s, k: metropolis(lp, s, k, n_max=500,
                                           samp_size=300, alpha_geweke=0.3))
    res = run(starts, keys)
    assert res.samples.shape == (4, 500, 2)
    assert np.all(np.asarray(res.n_recorded) >= 300)


@pytest.mark.slow
def test_kriging_mle_grid_matches_bfgs(rng):
    """The batched-grid plug-in lands on the same profile-ML optimum as the
    sequential BFGS fit (same sigma^2 to ~0.1%, same NLL to 1e-4 rel)."""
    from ccgp_tpu.infer.mle import kriging_mle, kriging_mle_grid
    from ccgp_tpu.ops import kernels

    x = jnp.asarray(rng.uniform(size=(20, 2)))
    y = jnp.sin(5 * x[:, 0]) + 0.3 * jnp.cos(9 * x[:, 1])
    fam = kernels.sqexp_family()
    a = kriging_mle(fam, x, y, jax.random.PRNGKey(0), jitter=1e-10)
    b = kriging_mle_grid(fam, x, y, jitter=1e-10)
    assert np.isclose(float(a.nll), float(b.nll), rtol=1e-4)
    assert np.isclose(float(a.sigma2), float(b.sigma2), rtol=2e-3)
    assert np.isclose(float(a.theta), float(b.theta), rtol=0.05)


def test_metropolis_speculative_matches_sequential_law():
    """speculative=K batches K proposals per loop iteration but is the
    identical Markov kernel (rejections don't move the state): same
    stationary distribution and acceptance rate as the sequential path."""
    from typing import NamedTuple

    class LP(NamedTuple):
        val: jnp.ndarray
        beta: jnp.ndarray

    mu = jnp.asarray([1.0, -2.0])

    def lp(z):
        return LP(val=-0.5 * jnp.sum((z - mu) ** 2), beta=jnp.asarray(0.0))

    start = jnp.zeros(2)
    seq = metropolis(lp, start, jax.random.PRNGKey(0), n_max=4000,
                     samp_size=3000, alpha_geweke=1.1)
    spec = metropolis(lp, start, jax.random.PRNGKey(1), n_max=4000,
                      samp_size=3000, alpha_geweke=1.1, speculative=4)
    zs_seq = np.asarray(seq.retained(3000)[0])
    zs_spec = np.asarray(spec.retained(3000)[0])
    assert np.allclose(zs_spec.mean(0), mu, atol=0.15)
    assert np.allclose(zs_spec.std(0), 1.0, atol=0.15)
    a_seq = float(seq.n_accepted) / float(seq.n_proposals)
    a_spec = float(spec.n_accepted) / float(spec.n_proposals)
    assert abs(a_seq - a_spec) < 0.05
    # speculative requires accepted-only recording
    import pytest as _pytest
    with _pytest.raises(ValueError):
        metropolis(lp, start, jax.random.PRNGKey(2), n_max=100,
                   samp_size=50, record="all", speculative=4)


def test_metropolis_accepts_typed_rbg_key():
    """The sampler is PRNG-impl agnostic: a typed rbg key (the documented
    fast-stream option, bench.py) must run the same Markov kernel."""
    from typing import NamedTuple

    from ccgp_tpu.infer.metropolis import metropolis

    class LP(NamedTuple):
        val: jnp.ndarray
        beta: jnp.ndarray

    def lp(z):
        return LP(val=-0.5 * jnp.sum(z ** 2), beta=jnp.asarray(0.0))

    key = jax.random.key(3, impl="rbg")
    res = metropolis(lp, jnp.zeros(2), key, n_max=2000, samp_size=1500,
                     alpha_geweke=1.1, speculative=4)
    zs = np.asarray(res.retained(1500)[0])
    assert int(res.n_recorded) == 2000
    assert np.all(np.isfinite(zs))
    assert abs(zs.mean()) < 0.2 and abs(zs.std() - 1.0) < 0.2
