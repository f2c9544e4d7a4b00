"""Pallas fused Cholesky/NLL kernel vs the XLA reference path (interpret
mode on CPU; the real-TPU path is exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.ops import kernels, linalg
from ccgp_tpu.ops.gp import profile_nll
from ccgp_tpu.ops.pallas_chol import (
    chol_quadratics, profile_nll_from_quadratics, mvn_nll_from_quadratics,
)


def _batch(rng, b=3, n=20):
    x = rng.uniform(size=(n, 2))
    thetas = np.linspace(1.0, 12.0, b)
    grams = jnp.stack([kernels.sqexp_gram(jnp.asarray(x), t) for t in thetas])
    y = jnp.asarray(rng.normal(size=n))
    return grams, y


def test_quadratics_xla_path_matches_dense(rng):
    grams, y = _batch(rng)
    q = chol_quadratics(grams, y, jitter=1e-10, use_pallas=False)
    for i in range(grams.shape[0]):
        r = np.asarray(grams[i]) + 1e-10 * np.eye(grams.shape[-1])
        rinv = np.linalg.inv(r)
        ones = np.ones_like(np.asarray(y))
        assert np.isclose(float(q["logdet"][i]), np.linalg.slogdet(r)[1],
                          rtol=1e-9)
        assert np.isclose(float(q["qyy"][i]), np.asarray(y) @ rinv @ np.asarray(y), rtol=1e-8)
        assert np.isclose(float(q["qoy"][i]), ones @ rinv @ np.asarray(y), rtol=1e-8)
        assert np.isclose(float(q["qoo"][i]), ones @ rinv @ ones, rtol=1e-8)


def test_pallas_interpret_matches_xla(rng):
    grams, y = _batch(rng, b=4, n=33)
    qx = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    qp = chol_quadratics(grams, y, jitter=1e-8, use_pallas=True,
                         interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qp[k]),
                           rtol=2e-5), k


def test_profile_nll_from_quadratics_matches_reference(rng):
    grams, y = _batch(rng)
    n = y.shape[0]
    q = chol_quadratics(grams, y, use_pallas=False)
    got = profile_nll_from_quadratics(q, n)
    for i in range(grams.shape[0]):
        ch = linalg.jitter_cholesky(grams[i])
        want = float(profile_nll(ch, y))
        assert np.isclose(float(got[i]), want, rtol=1e-9)


def test_mvn_nll_from_quadratics(rng):
    grams, y = _batch(rng, b=2)
    n = y.shape[0]
    q = chol_quadratics(grams, y, use_pallas=False)
    ls = 0.7
    got = mvn_nll_from_quadratics(q, n, ls)
    import scipy.stats
    for i in range(2):
        r = np.asarray(grams[i])
        rinv = np.linalg.inv(r)
        ones = np.ones(n)
        beta = ones @ rinv @ np.asarray(y) / (ones @ rinv @ ones)
        # -2 loglike - n log 2pi = logdet + n ls + quad
        ll = scipy.stats.multivariate_normal(
            mean=beta * ones, cov=np.exp(ls) * r).logpdf(np.asarray(y))
        want = -2.0 * ll - n * np.log(2 * np.pi)
        assert np.isclose(float(got[i]), want, rtol=1e-8)


def test_full_128_no_padding(rng):
    x = rng.uniform(size=(128, 2))
    grams = kernels.sqexp_gram(jnp.asarray(x), 8.0)[None]
    y = jnp.asarray(rng.normal(size=128))
    qx = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    qp = chol_quadratics(grams, y, jitter=1e-6, use_pallas=True,
                         interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qp[k]), rtol=2e-5), k


def test_lanes_kernel_interpret_matches_xla(rng):
    from ccgp_tpu.ops.pallas_chol_lanes import chol_quadratics_lanes

    grams, y = _batch(rng, b=5, n=33)  # odd batch -> exercises B padding
    qx = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    ql = chol_quadratics_lanes(grams, y, jitter=1e-8, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(ql[k]),
                           rtol=2e-5), k


def test_lanes_kernel_full_128(rng):
    from ccgp_tpu.ops.pallas_chol_lanes import chol_quadratics_lanes

    x = rng.uniform(size=(128, 2))
    grams = kernels.sqexp_gram(jnp.asarray(x), 8.0)[None]
    y = jnp.asarray(rng.normal(size=128))
    qx = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    ql = chol_quadratics_lanes(grams, y, jitter=1e-6, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(ql[k]), rtol=2e-5), k


def test_fused_gram_chol_interpret_matches_xla(rng):
    from ccgp_tpu.ops.pallas_gram_chol import fused_mix_quadratics

    n, d, b = 26, 3, 5
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    ps = jnp.asarray(rng.uniform(0.3, 0.8, b))
    r1 = jnp.asarray(rng.uniform(0.5, 2.0, (b, d)))
    r2 = jnp.asarray(rng.uniform(4.0, 12.0, (b, d)))
    scale = jnp.asarray(rng.uniform(0.5, 2.0, b))
    shift = jnp.asarray(rng.uniform(0.0, 3.0, b))

    def gram_one(p_i, r1_i, r2_i):
        w1, w2 = p_i**2, (1 - p_i) ** 2
        return (w1 * kernels.sqexp_gram(x, r1_i)
                + w2 * kernels.sqexp_gram(x, r2_i)) / (w1 + w2)

    import jax
    covs = (scale[:, None, None] * jax.vmap(gram_one)(ps, r1, r2)
            + shift[:, None, None])
    qx = chol_quadratics(covs, y, jitter=1e-8, use_pallas=False)
    qf = fused_mix_quadratics(x, y, r1, r2, ps, scale=scale, shift=shift,
                              jitter=1e-8, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qf[k]),
                           rtol=2e-5), k


def test_tpu_dispatch_guard_large_n(rng, monkeypatch):
    """TPU auto-dispatch must NOT route n > 128 to the lanes kernel (its
    tile limit, ops/pallas_chol_lanes.py) — it falls back to XLA instead of
    raising. Regression for the (n=256, B=128) crash."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    n, b = 256, 128
    x = jnp.asarray(rng.uniform(size=(n, 2)))
    thetas = np.linspace(1.0, 4.0, b)
    grams = jax.vmap(lambda t: kernels.sqexp_gram(x, t))(jnp.asarray(thetas))
    y = jnp.asarray(rng.normal(size=n))
    q = chol_quadratics(grams, y, jitter=1e-6, use_pallas=None)
    assert np.all(np.isfinite(np.asarray(q["logdet"])))
    want = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    for k in q:
        assert np.allclose(np.asarray(q[k]), np.asarray(want[k])), k
