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


# ---------------------------------------------------------------------------
# coda::spectrum0.ar / geweke.diag parity goldens (VERDICT r1 item 7).
# No R runtime exists here, so the oracle is a literal numpy transcription
# of the documented algorithm (stats::ar.yw -> coda::spectrum0.ar), solving
# each order's Yule-Walker system DIRECTLY (Toeplitz solve) — an independent
# derivation path from the Levinson-Durbin scan in ccgp_tpu.infer.geweke.
# ---------------------------------------------------------------------------
from ccgp_tpu.infer.geweke import spectrum0_ar, geweke_z, geweke_pvalue


def _oracle_spectrum0_ar(x):
    """stats::ar.yw + coda::spectrum0.ar semantics: demeaned autocovariances
    with denominator n; per order k the YW coefficients solve the kxk
    Toeplitz system; v_k = c0 - phi.c[1:k]; AIC = n log v_k + 2k; the
    selected v is rescaled by n/(n-(k+1)); spec0 = v/(1 - sum phi)^2."""
    x = np.asarray(x, float)
    n = len(x)
    km = min(n - 1, int(10 * np.log10(n)))
    xc = x - x.mean()
    c = np.array([xc[:n - l] @ xc[l:] / n for l in range(km + 1)])
    vs, sums = [c[0]], [0.0]
    for k in range(1, km + 1):
        toep = np.array([[c[abs(i - j)] for j in range(k)] for i in range(k)])
        phi = np.linalg.solve(toep, c[1:k + 1])
        vs.append(c[0] - phi @ c[1:k + 1])
        sums.append(phi.sum())
    vs, sums = np.array(vs), np.array(sums)
    aic = n * np.log(vs) + 2 * np.arange(km + 1)
    b = int(np.argmin(aic))
    return vs[b] * (n / (n - (b + 1))) / (1 - sums[b]) ** 2


def _pinned_series(n=200):
    rng = np.random.default_rng(42)
    e = rng.normal(size=n)
    ar1 = np.zeros(n)
    for t in range(1, n):
        ar1[t] = 0.8 * ar1[t - 1] + e[t]
    e2 = rng.normal(size=n)
    ar2 = np.zeros(n)
    for t in range(2, n):
        ar2[t] = 0.5 * ar2[t - 1] - 0.3 * ar2[t - 2] + e2[t]
    wn = rng.normal(size=50)
    return ar1, ar2, wn


def test_spectrum0_ar_matches_direct_yule_walker_oracle():
    ar1, ar2, wn = _pinned_series()
    for x in (ar1, ar2, wn):
        want = _oracle_spectrum0_ar(x)
        got = float(spectrum0_ar(jnp.asarray(x)))
        assert np.isclose(got, want, rtol=1e-12), (got, want)


def test_spectrum0_ar_pinned_goldens():
    """Regression pins (f64 CPU, seed 42): semantic drift in the AR-fit /
    AIC / rescale chain moves these in the ~1e-15 digits."""
    ar1, ar2, wn = _pinned_series()
    assert np.isclose(float(spectrum0_ar(jnp.asarray(ar1))),
                      9.878394792895238, rtol=1e-10)
    assert np.isclose(float(spectrum0_ar(jnp.asarray(ar2))),
                      1.4767343898990068, rtol=1e-10)
    assert np.isclose(float(spectrum0_ar(jnp.asarray(wn))),
                      0.9205891754447687, rtol=1e-10)


def test_geweke_matches_oracle_and_pins():
    """geweke.diag semantics: z = (mean(first 10%) - mean(last 50%)) /
    sqrt(s0_a/n_a + s0_b/n_b), p = 2(1 - Phi(|z|)), min over columns."""
    from scipy.stats import norm

    ar1, ar2, _ = _pinned_series()
    n = len(ar1)
    n1, n2 = int(0.1 * n), int(0.5 * n)

    def oracle_z(x):
        xa, xb = x[:n1], x[n - n2:]
        return (xa.mean() - xb.mean()) / np.sqrt(
            _oracle_spectrum0_ar(xa) / n1 + _oracle_spectrum0_ar(xb) / n2)

    z_got = float(geweke_z(jnp.asarray(ar1)))
    assert np.isclose(z_got, oracle_z(ar1), rtol=1e-12)
    assert np.isclose(z_got, -0.23292440259239625, rtol=1e-10)  # pin

    w = np.stack([ar1, ar2 + 0.1], axis=1)
    pv_want = min(2 * (1 - norm.cdf(abs(oracle_z(c)))) for c in (w[:, 0], w[:, 1]))
    pv_got = float(geweke_pvalue(jnp.asarray(w)))
    assert np.isclose(pv_got, pv_want, rtol=1e-12)
    assert np.isclose(pv_got, 0.330153257478093, rtol=1e-10)  # pin
