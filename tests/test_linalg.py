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


def test_bordered_quadratics_match_direct(rng):
    n = 14
    a = make_psd(rng, n)
    y = rng.normal(size=(n,))
    q = linalg.bordered_cholesky_quadratics(jnp.asarray(a), jnp.asarray(y))
    ai = np.linalg.inv(a)
    ones = np.ones(n)
    assert np.isclose(float(q["logdet"]), np.linalg.slogdet(a)[1], rtol=1e-10)
    assert np.isclose(float(q["qyy"]), y @ ai @ y, rtol=1e-9)
    assert np.isclose(float(q["qoy"]), ones @ ai @ y, rtol=1e-9)
    assert np.isclose(float(q["qoo"]), ones @ ai @ ones, rtol=1e-9)
    # the embedded factor block is exactly chol(A)
    assert np.allclose(np.asarray(q["chol"]), np.linalg.cholesky(a),
                       atol=1e-10)


def test_bordered_quadratics_batched_and_jitter(rng):
    n = 8
    a = np.stack([make_psd(rng, n) for _ in range(4)])
    y = rng.normal(size=(n,))
    q = linalg.bordered_cholesky_quadratics(jnp.asarray(a), jnp.asarray(y),
                                            jitter=1e-8)
    assert q["qyy"].shape == (4,)
    for i in range(4):
        scale = np.mean(np.diag(a[i]))
        aj = a[i] + 1e-8 * scale * np.eye(n)
        assert np.isclose(float(q["qyy"][i]),
                          y @ np.linalg.solve(aj, y), rtol=1e-8)


def test_bordered_quadratics_singular_is_nan(rng):
    # singular Gram -> NaN quadratics -> downstream -inf/reject dataflow
    a = np.ones((6, 6))
    y = rng.normal(size=(6,))
    q = linalg.bordered_cholesky_quadratics(jnp.asarray(a), jnp.asarray(y))
    assert not bool(jnp.isfinite(q["qyy"]))


def test_jitter_cholesky_traced_jitter(rng):
    """jitter may be a TRACED scalar (CombinedGPFit.jitter consumed by
    the jitted lazy-predict program — the n=2048 scaling row's path);
    only a static Python 0.0 may skip the add. Regression for the
    round-5 TracerBoolConversionError."""
    import jax

    a = jnp.asarray(make_psd(rng, 7))
    want = np.asarray(linalg.jitter_cholesky(a, 1e-6))
    got = np.asarray(jax.jit(
        lambda j: linalg.jitter_cholesky(a, j))(jnp.asarray(1e-6)))
    assert np.allclose(got, want, rtol=1e-12)
    # traced zero == static zero numerically
    got0 = np.asarray(jax.jit(
        lambda j: linalg.jitter_cholesky(a, j))(jnp.asarray(0.0)))
    assert np.array_equal(got0, np.asarray(linalg.jitter_cholesky(a, 0.0)))
