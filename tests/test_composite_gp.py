import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.eval.functions import test_function_1d as f1d, test_function_2d as f2d
from ccgp_tpu.models import cgp_fit, cgp_predict
from ccgp_tpu.models.composite_gp import _objective, _standardize, _bounds, _lhd
import pytest


def test_objective_matches_reference_algebra(rng):
    """var.MLE.DK transcription check: literal numpy version of the
    reference's 4-iteration loop (`1D Combined GP Public.R:106-137`)."""
    n, p = 12, 2
    x = rng.uniform(size=(n, p))
    y = rng.normal(size=n)
    x_std = (x - x.min(0)) / (x.max(0) - x.min(0))
    w = np.array([0.4, 3.0, 5.0, 20.0, 0.5])  # (lam, th1, th2, kappa, bw)

    def psi(rates):
        d2 = ((x_std[:, None, :] - x_std[None, :, :]) ** 2 * rates).sum(-1)
        return np.exp(-d2)

    lam, theta, kappa, bw = w[0], w[1:3], w[3], w[4]
    alpha = kappa + theta
    G, L, Gbw = psi(theta), psi(alpha), psi(theta * bw)
    one = np.ones(n)
    Sig = np.eye(n)
    for _ in range(4):
        Q = G + lam * np.sqrt(Sig) @ L @ np.sqrt(Sig)
        invQ = np.linalg.inv(Q)
        beta = one @ invQ @ y / (one @ invQ @ one)
        temp = invQ @ (y - beta)
        gip = beta + G @ temp
        e = y - gip
        Sig = np.diag(Gbw @ e**2 / (Gbw @ one))
        Sig = Sig / np.mean(np.diag(Sig))
    Q = G + lam * np.sqrt(Sig) @ L @ np.sqrt(Sig)
    invQ = np.linalg.inv(Q)
    beta = one @ invQ @ y / (one @ invQ @ one)
    tau2 = (y - beta) @ invQ @ (y - beta) / n
    want = np.log(np.linalg.det(Q)) + n * np.log(tau2)

    got = float(_objective(jnp.asarray(w), jnp.asarray(x_std), jnp.asarray(y)))
    assert np.isclose(got, want, rtol=1e-8)


def test_bounds_match_reference(rng):
    x = rng.uniform(size=(10, 2))
    xs, scales = _standardize(jnp.asarray(x))
    lower, upper = _bounds(xs, 2, 0.001, None, None, None, jnp.float64)
    import scipy.spatial.distance as ssd
    mean_inv = np.mean(1.0 / ssd.pdist(np.asarray(xs)) ** 2)
    assert np.isclose(float(upper[1]), np.log(100) * mean_inv, rtol=1e-10)
    assert np.isclose(float(upper[3]), np.log(1e6) * mean_inv, rtol=1e-10)
    assert float(lower[0]) == 0.001 and float(upper[0]) == 1.0
    assert float(lower[-1]) == 0.0 and float(upper[-1]) == 1.0


def test_lhd_properties():
    x = _lhd(jax.random.PRNGKey(0), 20, 3, jnp.float64)
    assert x.shape == (20, 3)
    # midpoint LHD: each column a permutation of (i+0.5)/n
    for j in range(3):
        col = np.sort(np.asarray(x[:, j]))
        assert np.allclose(col, (np.arange(20) + 0.5) / 20)


@pytest.mark.slow
def test_cgp_fit_predict_1d():
    x = jnp.asarray(np.linspace(0, 1, 10)[:, None])
    y = f1d(x[:, 0], 1)
    fit = cgp_fit(x, y, jax.random.PRNGKey(0), n_candidates=105)
    assert np.isfinite(float(fit.objval))
    assert np.isfinite(float(fit.rmscv))
    assert float(fit.lam) >= 0.001 and float(fit.lam) <= 1.0
    pred = cgp_predict(fit, x)
    # near-interpolation at training points (lambda adds slight smoothing)
    assert float(jnp.max(jnp.abs(pred.mean - y))) < 0.05
    xg = jnp.asarray(np.linspace(0.02, 0.98, 31)[:, None])
    pg = cgp_predict(fit, xg)
    yt = np.asarray(f1d(xg[:, 0], 1))
    rmspe = np.sqrt(np.mean((yt - np.asarray(pg.mean)) ** 2))
    assert rmspe < 0.4  # function range ~[-1, 1]
    cov = np.mean((yt >= np.asarray(pg.lower)) & (yt <= np.asarray(pg.upper)))
    assert cov > 0.5


@pytest.mark.slow
def test_cgp_fit_2d():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(14, 2)))
    y = f2d(x, 3)
    fit = cgp_fit(x, y, jax.random.PRNGKey(1), n_candidates=105)
    pred = cgp_predict(fit, x)
    assert float(jnp.max(jnp.abs(pred.mean - y))) < 0.2
    assert np.all(np.asarray(pred.upper) >= np.asarray(pred.lower))
