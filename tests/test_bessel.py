import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from ccgp_tpu.ops.bessel import bessel_kv, bessel_kve, log_bessel_kv


ORDERS = [0.0, 0.3, 0.5, 1.0, 1.7, 2.5, 5.0, 7.25, 10.0]


@pytest.mark.parametrize("v", ORDERS)
def test_kv_matches_scipy(v):
    x = np.concatenate([
        np.geomspace(1e-6, 1.999, 40),
        np.linspace(2.0, 30.0, 40),
        np.geomspace(30.0, 600.0, 10),
    ])
    got = np.asarray(bessel_kv(v, jnp.asarray(x)))
    want = sps.kv(v, x)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
    assert np.max(rel) < 5e-12, (v, np.max(rel))


@pytest.mark.parametrize("v", [0.5, 2.5, 5.0])
def test_kve_matches_scipy(v):
    x = np.geomspace(1e-4, 700.0, 60)
    got = np.asarray(bessel_kve(v, jnp.asarray(x)))
    want = sps.kve(v, x)
    rel = np.abs(got - want) / np.abs(want)
    assert np.max(rel) < 5e-12


def test_log_kv_large_x_no_underflow():
    x = jnp.asarray([800.0, 2000.0])
    lg = log_bessel_kv(5.0, x)
    assert np.all(np.isfinite(np.asarray(lg)))
    # log K_v(x) ~ 0.5 log(pi/2x) - x for large x
    approx = 0.5 * np.log(np.pi / (2 * np.asarray(x))) - np.asarray(x)
    assert np.allclose(np.asarray(lg), approx, rtol=1e-2)


@pytest.mark.parametrize("v", [0.5, 1.0, 5.0])
def test_kv_gradient(v):
    # dK_v/dx = (v/x) K_v - K_{v+1}
    for x0 in [0.3, 1.5, 2.0, 5.0, 20.0]:
        g = jax.grad(lambda x: bessel_kv(v, x))(jnp.asarray(x0))
        want = (v / x0) * sps.kv(v, x0) - sps.kv(v + 1, x0)
        assert np.isclose(float(g), want, rtol=1e-10), (v, x0)


def test_kv_vectorized_shapes():
    x = jnp.ones((3, 4, 5)) * 1.3
    assert bessel_kv(2.5, x).shape == (3, 4, 5)
