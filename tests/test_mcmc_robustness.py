"""Regression tests for the GV-n=90 failure mode (bad Laplace conditioning
+ silent zero-row retained windows)."""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.infer import laplace, metropolis


def test_laplace_condition_cap():
    # a posterior with one nearly-flat direction: curvature 1 vs 1e-10
    def lp(z):
        return -0.5 * (z[0] ** 2 + 1e-10 * z[1] ** 2)

    fit = laplace(lp, jnp.asarray([0.5, 0.5]))
    w = np.linalg.eigvalsh(np.asarray(fit.cov))
    assert w.max() / w.min() < 1.1e4  # condition capped


def test_retained_clamps_when_underfilled():
    # target so peaked that almost nothing is accepted far away: force an
    # unconverged chain by capping proposals
    def lp(z):
        return SimpleNamespace(val=-0.5 * jnp.sum((z / 1e-4) ** 2),
                               beta=z[0])

    res = metropolis(lp, jnp.asarray([5.0, 5.0]), jax.random.PRNGKey(0),
                     n_max=500, samp_size=200, alpha_geweke=0.99,
                     max_proposals=300)
    zs, bs, ls = res.retained(200)
    n_rec = int(res.n_recorded)
    assert n_rec < 200  # the premise: chain underfilled
    # every returned row is a real recorded draw (or the start state was
    # never recorded -> rows repeat the earliest recorded draws), never the
    # zero-initialized buffer tail
    recorded = np.asarray(res.samples[:max(n_rec, 1)])
    for row in np.asarray(zs):
        assert any(np.allclose(row, r) for r in recorded) or n_rec == 0
