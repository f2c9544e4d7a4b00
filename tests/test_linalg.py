import jax.numpy as jnp
import numpy as np

from ccgp_tpu.ops import linalg


def make_psd(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_chol_solve_and_logdet(rng):
    a = make_psd(rng, 12)
    b = rng.normal(size=(12,))
    ch = linalg.jitter_cholesky(jnp.asarray(a))
    x = np.asarray(linalg.chol_solve(ch, jnp.asarray(b)))
    assert np.allclose(a @ x, b, atol=1e-8)
    ld = float(linalg.chol_logdet(ch))
    assert np.isclose(ld, np.linalg.slogdet(a)[1], rtol=1e-10)


def test_solve_psd_matrix_rhs(rng):
    a = make_psd(rng, 9)
    b = rng.normal(size=(9, 4))
    x = np.asarray(linalg.solve_psd(jnp.asarray(a), jnp.asarray(b)))
    assert np.allclose(a @ x, b, atol=1e-8)


def test_jitter_rescues_singular():
    a = np.ones((5, 5))  # rank-1, singular
    ch0 = linalg.jitter_cholesky(jnp.asarray(a))
    assert not bool(jnp.all(jnp.isfinite(ch0)))
    ch = linalg.jitter_cholesky(jnp.asarray(a), jitter=1e-6)
    assert bool(jnp.all(jnp.isfinite(ch)))


def test_schur_and_augmented_logdet(rng):
    n_old, m = 10, 4
    big = make_psd(rng, n_old + m)
    r_old = big[:n_old, :n_old]
    r_cross = big[n_old:, :n_old]
    r_new = big[n_old:, n_old:]
    ch_old = linalg.jitter_cholesky(jnp.asarray(r_old))
    s = np.asarray(linalg.schur_complement(jnp.asarray(r_new), jnp.asarray(r_cross), ch_old))
    want = r_new - r_cross @ np.linalg.solve(r_old, r_cross.T)
    assert np.allclose(s, want, atol=1e-8)
    ld = float(linalg.augmented_logdet(jnp.asarray(r_new), jnp.asarray(r_cross), ch_old))
    want_ld = np.linalg.slogdet(big)[1] - np.linalg.slogdet(r_old)[1]
    assert np.isclose(ld, want_ld, rtol=1e-9)


def test_batched(rng):
    a = np.stack([make_psd(rng, 6) for _ in range(3)])
    b = rng.normal(size=(3, 6))
    ch = linalg.jitter_cholesky(jnp.asarray(a))
    x = np.asarray(linalg.chol_solve(ch, jnp.asarray(b)))
    for i in range(3):
        assert np.allclose(a[i] @ x[i], b[i], atol=1e-8)
    ld = np.asarray(linalg.chol_logdet(ch))
    assert ld.shape == (3,)
