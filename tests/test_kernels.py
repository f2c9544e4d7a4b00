import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps
import scipy.spatial.distance as ssd

from ccgp_tpu.ops import distance, kernels


def ref_matern(h, theta, nu):
    h = np.abs(h)
    s = 2 * np.sqrt(nu) * h / theta
    out = np.where(
        h == 0, 1.0,
        s ** nu * sps.kv(nu, np.where(s == 0, 1.0, s)) / (sps.gamma(nu) * 2 ** (nu - 1)),
    )
    return out


def ref_spline(h, theta):
    u = np.abs(h) / theta
    out = np.where(u <= 0.5, 1 - 6 * u**2 + 6 * u**3,
                   np.where(u <= 1.0, 2 * (1 - u) ** 3, 0.0))
    return out


def test_pairwise_sqdist_matches_scipy(rng):
    x = rng.uniform(size=(20, 3))
    th = np.array([0.7, 1.3, 2.2])
    got = np.asarray(distance.pairwise_sqdist(jnp.asarray(x), jnp.asarray(th)))
    want = ssd.squareform(ssd.pdist(x * np.sqrt(th)) ** 2)
    assert np.allclose(got, want, atol=1e-12)


def test_cross_sqdist(rng):
    x = rng.uniform(size=(7, 2))
    y = rng.uniform(size=(5, 2))
    got = np.asarray(distance.cross_sqdist(jnp.asarray(x), jnp.asarray(y), 1.5))
    want = ssd.cdist(x * np.sqrt(1.5), y * np.sqrt(1.5)) ** 2
    assert np.allclose(got, want, atol=1e-12)


def test_matern_corr_matches_reference(rng):
    h = np.concatenate([[0.0], rng.uniform(0.001, 2.0, size=50)])
    for nu in [0.5, 2.5, 5.0]:
        for theta in [0.1, 0.5, 2.0]:
            got = np.asarray(kernels.matern_corr(jnp.asarray(h), theta, nu))
            want = ref_matern(h, theta, nu)
            assert np.allclose(got, want, rtol=1e-10), (nu, theta)
    # h = 0 exactly 1
    assert float(kernels.matern_corr(jnp.asarray(0.0), 0.5, 5.0)) == 1.0


def test_matern_gram_psd(rng):
    x = jnp.asarray(rng.uniform(size=(12,)))
    g = kernels.matern_gram(x, 0.4, 5.0)
    w = np.linalg.eigvalsh(np.asarray(g))
    assert w.min() > -1e-10
    assert np.allclose(np.diag(np.asarray(g)), 1.0)
    assert np.allclose(np.asarray(g), np.asarray(g).T)


def test_spline_corr_matches_reference(rng):
    h = np.concatenate([[0.0, 0.25, 0.5, 0.75, 1.0, 1.5], rng.uniform(0, 2, 50)])
    for theta in [0.3, 1.0, 1.7]:
        got = np.asarray(kernels.spline_corr(jnp.asarray(h), theta))
        want = ref_spline(h, theta)
        assert np.allclose(got, want, atol=1e-12), theta


def test_spline_compact_support():
    assert float(kernels.spline_corr(jnp.asarray(1.2), 1.0)) == 0.0
    assert float(kernels.spline_corr(jnp.asarray(0.0), 1.0)) == 1.0


def test_sqexp_gram_matches_direct(rng):
    x = rng.uniform(size=(14, 2))
    theta = 3.3
    got = np.asarray(kernels.sqexp_gram(jnp.asarray(x), theta))
    want = np.exp(-ssd.squareform(ssd.pdist(x) ** 2) * theta)
    assert np.allclose(got, want, atol=1e-12)
    # anisotropic
    th = np.array([0.5, 4.0])
    got = np.asarray(kernels.sqexp_gram(jnp.asarray(x), jnp.asarray(th)))
    want = np.exp(-ssd.squareform(ssd.pdist(x * np.sqrt(th)) ** 2))
    assert np.allclose(got, want, atol=1e-12)


def test_gram_batching(rng):
    xb = jnp.asarray(rng.uniform(size=(4, 10, 2)))
    g = kernels.sqexp_gram(xb, 2.0)
    assert g.shape == (4, 10, 10)
    single = kernels.sqexp_gram(xb[1], 2.0)
    assert np.allclose(np.asarray(g[1]), np.asarray(single))


def test_matern_kernel_grads_finite(rng):
    x = jnp.asarray(rng.uniform(size=(8,)))

    def loss(theta):
        g = kernels.matern_gram(x, theta, 5.0)
        return jnp.sum(g)

    g = jax.grad(loss)(jnp.asarray(0.7))
    assert np.isfinite(float(g))
    # finite differences
    eps = 1e-6
    fd = (loss(jnp.asarray(0.7 + eps)) - loss(jnp.asarray(0.7 - eps))) / (2 * eps)
    assert np.isclose(float(g), float(fd), rtol=1e-5)


def test_kernel_families(rng):
    x = jnp.asarray(rng.uniform(size=(9, 1)))
    y = jnp.asarray(rng.uniform(size=(4, 1)))
    for fam in [kernels.matern_family(5.0), kernels.spline_family()]:
        g = fam.gram(x, 0.6)
        c = fam.cross(x, y, 0.6)
        assert g.shape == (9, 9) and c.shape == (9, 4)
    fam = kernels.sqexp_family()
    x2 = jnp.asarray(rng.uniform(size=(9, 3)))
    y2 = jnp.asarray(rng.uniform(size=(4, 3)))
    assert fam.gram(x2, 1.1).shape == (9, 9)
    assert fam.cross(x2, y2, 1.1).shape == (9, 4)
