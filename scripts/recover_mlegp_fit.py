"""Reverse-engineer the reference's mlegp fit from the archived table.

The archived `Ground Vibrations Emulator/Results/Size 50 Results 1.txt`
records mlegp's predictions (`y.hat.single`) and t-intervals
(`LL.single`/`UL.single`, `Combined GP Ground Vibrations.R:662-666`) at
150 test points. The single-GP predictor has ~12 unknowns (9 ARD rates,
constant mean, sig2, optional nugget), so the 300 archived values
overdetermine mlegp's exact fitted parameters. This script recovers them
by least squares and reports:

  * the recovered (beta, mu, sig2, nugget) and the residual fit quality;
  * which se.fit formula matches (with / without the GLS mean-correction
    term) — mlegp's `predict.gp(..., se.fit=TRUE)` implementation detail;
  * the profile-NLL value at the recovered rates vs our optimizer's
    optimum, answering whether mlegp found a different local optimum or a
    loosely-converged point.

Everything CPU float64.
"""
from __future__ import annotations

import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import scipy.optimize
import scipy.stats

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ccgp_tpu.eval.datasets import (load_ground_vibrations,
                                    load_gv_archived_results)


def main():
    data = load_ground_vibrations(50, 1)
    x, y = data["x_train"], data["y_train"]
    xt, yt = data["x_test"], data["y_test"]
    cols, tab = load_gv_archived_results()
    # _read_table drops the row-name column; cols keeps header names
    idx = {c: i for i, c in enumerate(cols)}
    yhat = tab[:, idx["y.hat.single"]]
    ll = tab[:, idx["LL.single"]]
    ul = tab[:, idx["UL.single"]]
    n = x.shape[0]
    tq = scipy.stats.t.ppf(0.975, n - 1)
    se_arch = (ul - ll) / (2.0 * tq)

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    xt = jnp.asarray(xt)
    yhat_j = jnp.asarray(yhat)
    se_j = jnp.asarray(se_arch)

    d2 = (x[:, None, :] - x[None, :, :]) ** 2          # (n, n, 9)
    d2c = (x[:, None, :] - xt[None, :, :]) ** 2        # (n, t, 9)

    def predict(log_beta, log_nug, mean_corr: bool):
        """mlegp model: V = sig2 (R + nug I); mu, sig2 profiled by GLS/MLE."""
        beta = jnp.exp(log_beta)
        nug = jnp.exp(log_nug)
        r = jnp.exp(-jnp.einsum("ijk,k->ij", d2, beta))
        rn = r + nug * jnp.eye(x.shape[0])
        chol = jnp.linalg.cholesky(rn)
        sol = lambda b: jax.scipy.linalg.cho_solve((chol, True), b)
        one = jnp.ones_like(y)
        ri1 = sol(one)
        mu = (ri1 @ y) / (ri1 @ one)
        resid = y - mu
        alpha = sol(resid)
        sig2 = (resid @ sol(resid)) / x.shape[0]
        rc = jnp.exp(-jnp.einsum("ijk,k->ij", d2c, beta))   # (n, t)
        mean = mu + rc.T @ alpha
        quad = jnp.einsum("nt,nt->t", rc, sol(rc))
        base = 1.0 + nug - quad
        if mean_corr:
            onr = jnp.einsum("n,nt->t", ri1, rc)
            base = base + (1.0 - onr) ** 2 / (ri1 @ one)
        var = sig2 * base
        return mean, jnp.sqrt(jnp.maximum(var, 1e-30)), sig2, mu

    def loss(params, mean_corr, use_nug):
        log_beta = params[:9]
        log_nug = params[9] if use_nug else -jnp.inf
        mean, se, _, _ = predict(log_beta, log_nug, mean_corr)
        return (jnp.sum((mean - yhat_j) ** 2)
                + jnp.sum((se - se_j) ** 2))

    rng = np.random.default_rng(0)
    for mean_corr in (False, True):
        for use_nug in (False, True):
            best = None
            for trial in range(12):
                p0 = np.concatenate([
                    rng.uniform(-4, 1, size=9), [rng.uniform(-12, -2)]])
                f = lambda p: float(loss(jnp.asarray(p), mean_corr, use_nug))
                g = jax.grad(lambda p: loss(p, mean_corr, use_nug))
                gf = lambda p: np.asarray(g(jnp.asarray(p)))
                res = scipy.optimize.minimize(f, p0, jac=gf, method="L-BFGS-B",
                                              options={"maxiter": 500})
                if best is None or res.fun < best.fun:
                    best = res
            mean, se, sig2, mu = predict(
                jnp.asarray(best.x[:9]),
                jnp.asarray(best.x[9]) if use_nug else -jnp.inf, mean_corr)
            rmse_mean = float(np.sqrt(np.mean((np.asarray(mean) - yhat) ** 2)))
            rmse_se = float(np.sqrt(np.mean((np.asarray(se) - se_arch) ** 2)))
            print(f"mean_corr={mean_corr} nugget={use_nug}: "
                  f"loss={best.fun:.3e} rmse_mean={rmse_mean:.2e} "
                  f"rmse_se={rmse_se:.2e}")
            print(f"  betas={np.exp(best.x[:9]).round(4)}")
            if use_nug:
                print(f"  nugget={np.exp(best.x[9]):.3e}")
            print(f"  sig2={float(sig2):.4f} mu={float(mu):.4f}")
            # accuracy of the recovered fit vs the truth
            rmspe = float(np.sqrt(np.mean((np.asarray(mean)
                                           - np.asarray(yt)) ** 2)))
            lo = np.asarray(mean) - tq * np.asarray(se)
            hi = np.asarray(mean) + tq * np.asarray(se)
            cov = float(np.mean((np.asarray(yt) >= lo)
                                & (np.asarray(yt) <= hi)))
            print(f"  -> rmspe={rmspe:.3f} coverage={cov:.3f} "
                  f"(archived 2.687 / 0.867)")


if __name__ == "__main__":
    main()
