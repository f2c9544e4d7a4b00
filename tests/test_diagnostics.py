import numpy as np
import jax.numpy as jnp

from ccgp_tpu.infer.diagnostics import gelman_rubin, effective_sample_size


def test_rhat_converged_vs_split(rng):
    # well-mixed chains from the same target -> R-hat ~ 1
    good = rng.normal(size=(4, 1000, 2))
    r = np.asarray(gelman_rubin(jnp.asarray(good)))
    assert np.all(r < 1.02), r
    # chains at different locations -> R-hat >> 1
    bad = good + np.arange(4)[:, None, None] * 3.0
    r = np.asarray(gelman_rubin(jnp.asarray(bad)))
    assert np.all(r > 1.5), r


def test_ess_iid_vs_correlated(rng):
    iid = rng.normal(size=(2, 2000, 1))
    ess_iid = float(effective_sample_size(jnp.asarray(iid))[0])
    assert ess_iid > 2500  # ~ c*n for iid draws
    # AR(1) with phi=0.9 -> tau ~ 19 -> ess ~ c*n/19
    n = 2000
    ar = np.zeros((2, n, 1))
    e = rng.normal(size=(2, n))
    for t in range(1, n):
        ar[:, t, 0] = 0.9 * ar[:, t - 1, 0] + e[:, t]
    ess_ar = float(effective_sample_size(jnp.asarray(ar))[0])
    assert ess_ar < 600, ess_ar
