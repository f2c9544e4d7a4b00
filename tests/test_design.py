import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.design import (
    me_criterion, augmented_me_criterion, me_design, batch_me_design,
    random_lhs, maximin_lhs, kmedoids,
)
from ccgp_tpu.eval import load_initial_me_design, load_design_txt
from ccgp_tpu.models import MixtureSpec, MixParams
from ccgp_tpu.ops import kernels, linalg
import pytest


SPEC = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
# the reference's prior-mean plug-in used for the initial ME design:
# p = 0.5, theta1 = 1, theta2 = 4 (reference ReadMe)
PARAMS = MixParams(p=jnp.asarray(0.5), theta1=jnp.asarray(1.0),
                   theta2=jnp.asarray(4.0))


def test_me_criterion_det_vs_logdet(rng):
    d = jnp.asarray(rng.uniform(-1, 1, size=(8, 2)))
    sc_det = float(me_criterion(SPEC, d, PARAMS, criterion="det"))
    sc_log = float(me_criterion(SPEC, d, PARAMS, criterion="logdet"))
    from ccgp_tpu.models import mixed_gram
    r = np.asarray(mixed_gram(SPEC, d, PARAMS))
    assert np.isclose(sc_det, -np.linalg.det(r), rtol=1e-10)
    assert np.isclose(sc_log, -np.linalg.slogdet(r)[1], rtol=1e-10)


def test_augmented_criterion_is_conditional_logdet(rng):
    d_old = jnp.asarray(rng.uniform(-1, 1, size=(10, 2)))
    d_new = jnp.asarray(rng.uniform(-1, 1, size=(4, 2)))
    from ccgp_tpu.models import mixed_gram
    chol_old = linalg.jitter_cholesky(mixed_gram(SPEC, d_old, PARAMS))
    got = float(augmented_me_criterion(SPEC, d_old, chol_old, d_new, PARAMS))
    both = jnp.concatenate([d_old, d_new])
    r_all = np.asarray(mixed_gram(SPEC, both, PARAMS))
    r_old = np.asarray(mixed_gram(SPEC, d_old, PARAMS))
    want = -(np.linalg.slogdet(r_all)[1] - np.linalg.slogdet(r_old)[1])
    assert np.isclose(got, want, rtol=1e-8)


def test_reference_initial_design_scores_well():
    """The shipped Initial ME Design should score close to what our search
    finds for the same plug-in parameters (sanity parity on the criterion)."""
    d_ref = jnp.asarray(load_initial_me_design())
    ref_score = float(me_criterion(SPEC, d_ref, PARAMS))
    res = me_design(SPEC, PARAMS, 14, 2, jax.random.PRNGKey(0), n_starts=6,
                    maxiter=150)
    assert np.isfinite(ref_score)
    # our logdet search should land within a modest gap of the reference's
    # det-criterion design (different optimizer, same landscape)
    assert float(res.score) <= ref_score + 1.0
    # design stays inside the box
    assert np.all(np.abs(np.asarray(res.design)) <= 1.0 + 1e-9)


@pytest.mark.slow
def test_batch_me_design_improves_entropy():
    d_old = jnp.asarray(load_initial_me_design())
    res = batch_me_design(SPEC, PARAMS, d_old, 7, jax.random.PRNGKey(1),
                          n_starts=6, maxiter=150)
    assert np.isfinite(float(res.log_entropy))
    assert res.design.shape == (7, 2)
    assert np.all(np.abs(np.asarray(res.design)) <= 1.0 + 1e-9)
    # adding the found batch increases total logdet over a random batch
    rand = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (7, 2)))
    from ccgp_tpu.models import mixed_gram
    chol_old = linalg.jitter_cholesky(mixed_gram(SPEC, d_old, PARAMS))
    sc_rand = float(augmented_me_criterion(SPEC, d_old, chol_old, rand, PARAMS))
    sc_opt = float(augmented_me_criterion(SPEC, d_old, chol_old,
                                          jnp.asarray(res.design), PARAMS))
    assert sc_opt < sc_rand


def test_lhs_properties():
    x = random_lhs(jax.random.PRNGKey(0), 20, 3)
    assert x.shape == (20, 3)
    for j in range(3):
        strata = np.floor(np.sort(np.asarray(x[:, j])) * 20).astype(int)
        assert (strata == np.arange(20)).all()  # one point per stratum
    xm = maximin_lhs(jax.random.PRNGKey(1), 10, 2, n_candidates=16)
    xr = random_lhs(jax.random.PRNGKey(2), 10, 2)

    def min_d(a):
        from scipy.spatial.distance import pdist
        return pdist(np.asarray(a)).min()

    assert min_d(xm) >= min_d(xr) * 0.8  # typically much better


def test_kmedoids_clusters_blobs(rng):
    centers = np.array([[0, 0], [5, 5], [-5, 5]])
    pts = np.concatenate([
        c + 0.3 * rng.normal(size=(40, 2)) for c in centers
    ])
    res = kmedoids(jnp.asarray(pts), 3, jax.random.PRNGKey(0))
    med = np.sort(np.asarray(res.medoids), axis=0)
    want = np.sort(centers, axis=0)
    assert np.allclose(med, want, atol=0.6)
    assert len(np.unique(np.asarray(res.labels))) == 3


@pytest.mark.slow
def test_kmedoids_on_reference_subdesigns():
    """Cluster the shipped 1000 stacked subdesigns (7000 x 2 points) into 7
    medoids like the reference's k-medoids ME Design construction.

    slow: 8-restart PAM over 7000 points is ~4.5 min on the CPU lane; the
    cheap blob test above keeps k-medoids in the default lane, and this
    exact-reproduction golden runs under RUN_SLOW=1."""
    sub = load_design_txt("All_Subdesigns", header=True)
    assert sub.shape == (7000, 2)
    res = kmedoids(jnp.asarray(sub), 7, jax.random.PRNGKey(3), n_iters=40,
                   n_restarts=8)
    got = np.asarray(res.medoids)
    ref = load_design_txt("k-medoids ME Design", header=True)[-7:]
    # with multi-restart the PAM optimum reproduces the reference's shipped
    # medoid set exactly (they are actual data points)
    from scipy.spatial.distance import cdist
    d = cdist(got, ref)
    assert d.min(axis=0).max() < 1e-9
