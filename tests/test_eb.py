import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps
import scipy.stats

from ccgp_tpu.eb import halton, marginal_likelihood, choose_hyperpars
from ccgp_tpu.models import MixtureSpec
from ccgp_tpu.ops import kernels
from ccgp_tpu.ops.special import gammaincinv, invgamma_quantile


def test_gammaincinv_matches_scipy():
    for a in [0.5, 1.0, 3.0, 7.0, 20.0]:
        q = np.linspace(0.001, 0.999, 50)
        got = np.asarray(gammaincinv(a, jnp.asarray(q)))
        want = sps.gammaincinv(a, q)
        assert np.allclose(got, want, rtol=1e-10), a


def test_invgamma_quantile_matches_scipy():
    for a, b in [(3.0, 2.0), (5.0, 16.0), (7.0, 3.0)]:
        p = np.linspace(0.01, 0.99, 30)
        got = np.asarray(invgamma_quantile(jnp.asarray(p), a, b))
        want = scipy.stats.invgamma.ppf(p, a, scale=b)
        assert np.allclose(got, want, rtol=1e-9), (a, b)


def test_halton_base2_prefix():
    h = halton(8, 1)[:, 0]
    want = np.array([1/2, 1/4, 3/4, 1/8, 5/8, 3/8, 7/8, 1/16])
    assert np.allclose(h, want)
    h2 = halton(5, 2)
    assert np.allclose(h2[:, 1], [1/3, 2/3, 1/9, 4/9, 7/9])


def test_marginal_likelihood_positive(rng):
    x = jnp.asarray(rng.uniform(size=(12, 2)))
    y = jnp.asarray(rng.normal(size=12))
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    nodes = jnp.asarray(halton(64, 1)[:, 0])
    ml = marginal_likelihood(spec, x, y, (3.0, 2.0), (5.0, 16.0), 1.0,
                             nodes, tau=100.0)
    assert np.isfinite(float(ml))  # log marginal likelihood


def test_choose_hyperpars_prefers_matching_prior(rng):
    """Generate data from a mixture with known rates; the EB search should
    prefer a hyperprior concentrated near the truth over an absurd one."""
    x = jnp.asarray(rng.uniform(size=(16, 2)))
    from ccgp_tpu.models import MixParams, mixed_gram
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    params = MixParams(p=jnp.asarray(0.6), theta1=jnp.asarray(1.0),
                       theta2=jnp.asarray(10.0))
    r = np.asarray(mixed_gram(spec, x, params))
    chol = np.linalg.cholesky(r + 1e-10 * np.eye(16))
    y = jnp.asarray(3.0 + 1.2 * chol @ rng.normal(size=16))

    # IG(a, b) has mode b/(a+1): rows concentrated near (1, 10) vs far off
    grid = np.array([
        [3.0, 4.0, 5.0, 55.0],    # modes ~ (1, 9.2) - near truth
        [30.0, 1.0, 30.0, 1.0],   # modes ~ (0.03, 0.03) - absurd
    ])
    choice = choose_hyperpars(spec, x, y, grid, 1.44, n_nodes=128, tau=50.0)
    assert int(choice.index) == 0
    likes = np.asarray(choice.likelihoods)
    assert likes[0] > likes[1]


def test_marginal_likelihood_matches_reference_transcription(rng):
    """T1 parity: literal numpy transcription of likeli.hyperpars
    (`2D...Isotropic Advanced.R:552-579`) — theta_i = qigamma(p; a_i, b_i)
    at Halton p-nodes, cond.like = N(y; 0, sigma2_t R_mix + tau^2 J),
    marginal = node mean. The repo returns the LOG of that mean."""
    from scipy.stats import multivariate_normal, invgamma
    import scipy.spatial.distance as ssd

    x_np = rng.uniform(size=(10, 2))
    y_np = rng.normal(size=10)
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    a1, b1, a2, b2 = 3.0, 2.0, 5.0, 16.0
    sigma2, tau = 1.3, 50.0
    nodes_np = np.asarray(halton(32, 1)[:, 0])

    d2 = ssd.cdist(x_np, x_np) ** 2
    dens = []
    for p in nodes_np:
        t1 = invgamma.ppf(p, a1, scale=b1)
        t2 = invgamma.ppf(p, a2, scale=b2)
        r = (p**2 * np.exp(-t1 * d2) + (1 - p) ** 2 * np.exp(-t2 * d2)) \
            / (p**2 + (1 - p) ** 2)
        s2t = sigma2 * (p**2 + (1 - p) ** 2)
        cov = s2t * r + tau**2 * np.ones((10, 10))
        dens.append(multivariate_normal.pdf(y_np, mean=np.zeros(10), cov=cov))
    want = np.log(np.mean(dens))

    got = float(marginal_likelihood(spec, jnp.asarray(x_np),
                                    jnp.asarray(y_np), (a1, b1), (a2, b2),
                                    sigma2, jnp.asarray(nodes_np), tau=tau))
    assert np.isclose(got, want, rtol=1e-9), (got, want)
