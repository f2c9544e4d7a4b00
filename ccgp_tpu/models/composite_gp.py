"""Composite Gaussian process (Ba & Joseph 2012) — competitor baseline.

Re-derivation of the reference's vendored-and-patched `CGP`/`predict.CGP`
(`1D Codes and Designs/1D Combined GP Public.R:62-321`, identical copies in
all eight scripts). The model is a global smooth GP plus a local rough GP
whose variance varies over space:

    Q(w) = G(theta) + lambda sqrt(S) L(alpha) sqrt(S),  alpha = kappa + theta
    S    = spatially-varying local variance, re-estimated from smoothed
           squared residuals with bandwidth bw for 4 fixed-point iterations
    objective(w) = log det Q + n log tau2(w),  w = (lambda, theta, kappa, bw)

Fit protocol mirrored from the reference: 505 LHD candidate starts scored,
top-`num_starts` refined by bounded quasi-Newton, leave-one-out jackknife
RMSCV at the optimum, and the predictor with local-variance weighting and
1.96-sigma intervals.

TPU-first rewrite:
* the 4-iteration local-variance re-estimation is a static `fori`-style
  unroll inside one objective kernel (the reference's inner `for (rep in
  1:4)` loop, `:116-127`);
* all 505 candidate evaluations run as ONE vmapped batch; the top-k
  refinements run as one vmapped bounded-BFGS batch (the reference loops
  `apply(starts, 1, var.MLE.DK)` then refines serially, `:153-161`);
* the n leave-one-out refits are a single vmapped gather over per-point
  index masks (the reference's serial `for (jf in 1:n)` with full matrix
  rebuilds, `:171-199`);
* prediction is one batched kernel over all test points (the reference's
  per-point double loop, `:291-305`).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccgp_tpu.infer.optim import multistart_minimize
from ccgp_tpu.ops import linalg
from ccgp_tpu.ops.distance import pairwise_sqdist, cross_sqdist


class CGPFit(NamedTuple):
    x: jnp.ndarray            # original-scale design (n, p)
    y: jnp.ndarray            # (n,)
    lam: jnp.ndarray          # nugget ratio lambda
    theta: jnp.ndarray        # (p,) global rates (original scale)
    alpha: jnp.ndarray        # (p,) local rates (original scale)
    bandwidth: jnp.ndarray    # bw
    sig: jnp.ndarray          # (n,) normalized local variances (diag of S)
    sf: jnp.ndarray           # normalizing factor mean(diag S) pre-division
    res2: jnp.ndarray         # (n,) squared residuals at the fit
    temp: jnp.ndarray         # (n,) Q^{-1}(y - beta 1)
    invq_chol: jnp.ndarray    # (n, n) Cholesky of Q
    beta: jnp.ndarray
    tau2: jnp.ndarray
    objval: jnp.ndarray
    rmscv: jnp.ndarray        # leave-one-out RMS cross-validation error


class CGPPrediction(NamedTuple):
    mean: jnp.ndarray         # Yp: composite prediction
    global_mean: jnp.ndarray  # gp: global-component prediction
    local_var: jnp.ndarray    # v(x)
    lower: jnp.ndarray
    upper: jnp.ndarray


def _se_gram(x, rates):
    g = jnp.exp(-pairwise_sqdist(x, rates))
    n = x.shape[-2]
    eye = jnp.eye(n, dtype=x.dtype)
    return g * (1.0 - eye) + eye


def _sigma_iterations(q_of_sig, g, gbw, y, n_iter: int = 4):
    """The reference's fixed-point local-variance loop (`:116-127`).

    Returns (sig, sf, beta, e) after `n_iter` rounds starting from S = I.
    """
    n = y.shape[-1]
    ones = jnp.ones_like(y)

    def body(sig, _):
        q = q_of_sig(sig)
        chol = linalg.jitter_cholesky(q)
        u = linalg.tri_solve(chol, ones)
        w = linalg.tri_solve(chol, y)
        beta = jnp.sum(u * w) / jnp.sum(u * u)
        temp = linalg.chol_solve(chol, y - beta)
        gip = beta + g @ temp
        e = y - gip
        sig_new = (gbw @ (e * e)) / (gbw @ ones)
        sf = jnp.mean(sig_new)
        return sig_new / sf, (sf, beta, e)

    sig, (sfs, betas, es) = jax.lax.scan(body, jnp.ones_like(y),
                                         jnp.arange(n_iter))
    return sig, sfs[-1], betas[-1], es[-1]


def _objective(w, x_std, y, n_iter: int = 4):
    """var.MLE.DK (`:106-137`): w = (lambda, theta_1..theta_p, kappa, bw)."""
    n, p = x_std.shape
    lam = w[0]
    theta = w[1:p + 1]
    kappa = w[p + 1]
    bw = w[p + 2]
    alpha = kappa + theta
    g = _se_gram(x_std, theta)
    l = _se_gram(x_std, alpha)
    gbw = _se_gram(x_std, theta * bw)

    def q_of_sig(sig):
        rs = jnp.sqrt(sig)
        return g + lam * (rs[:, None] * l * rs[None, :])

    sig, _, _, _ = _sigma_iterations(q_of_sig, g, gbw, y, n_iter)
    q = q_of_sig(sig)
    chol = linalg.jitter_cholesky(q)
    ones = jnp.ones_like(y)
    u = linalg.tri_solve(chol, ones)
    wv = linalg.tri_solve(chol, y)
    beta = jnp.sum(u * wv) / jnp.sum(u * u)
    r = linalg.tri_solve(chol, y - beta)
    tau2 = jnp.sum(r * r) / n
    val = linalg.chol_logdet(chol) + n * jnp.log(tau2)
    return jnp.where(jnp.isfinite(val), val, jnp.asarray(1e6, val.dtype))


def _standardize(x):
    lo = jnp.min(x, axis=0)
    hi = jnp.max(x, axis=0)
    scales = hi - lo
    return (x - lo) / scales, scales


def _bounds(x_std, p, nugget_l, theta_l, alpha_l, kappa_u, dtype):
    """Hyperparameter box from the data scale (`:81-93`)."""
    d2 = pairwise_sqdist(x_std)
    n = x_std.shape[0]
    iu = jnp.triu_indices(n, k=1)
    mean_inv_d2 = jnp.mean(1.0 / d2[iu])
    if theta_l is None:
        theta_l = 1e-4
    if alpha_l is None:
        alpha_l = math.log(10.0 ** 2) * mean_inv_d2
    else:
        alpha_l = jnp.asarray(alpha_l, dtype)
    kappa_l = alpha_l
    if kappa_u is None:
        kappa_u = math.log(10.0 ** 6) * mean_inv_d2
    lower = jnp.concatenate([
        jnp.asarray([nugget_l], dtype), jnp.full((p,), theta_l, dtype),
        jnp.atleast_1d(jnp.asarray(kappa_l, dtype)), jnp.asarray([0.0], dtype)])
    upper = jnp.concatenate([
        jnp.asarray([1.0], dtype), jnp.full((p,), 1.0, dtype) * alpha_l,
        jnp.atleast_1d(jnp.asarray(kappa_u, dtype)), jnp.asarray([1.0], dtype)])
    return lower, upper


def _lhd(key, n, k, dtype):
    """Midpoint Latin hypercube (the reference's `LHD`, `:141-146`)."""
    cols = []
    keys = jax.random.split(key, k)
    base = (jnp.arange(n, dtype=dtype) + 0.5) / n
    for j in range(k):
        cols.append(jax.random.permutation(keys[j], base))
    return jnp.stack(cols, axis=1)


def cgp_fit(
    x: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    nugget_l: float = 0.001,
    num_starts: int = 5,
    theta_l=None,
    alpha_l=None,
    kappa_u=None,
    n_candidates: int = 505,
    jackknife: bool = True,
) -> CGPFit:
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    dtype = x.dtype
    x_std, scales = _standardize(x)
    lower, upper = _bounds(x_std, p, nugget_l, theta_l, alpha_l, kappa_u,
                           dtype)

    obj = lambda w: _objective(w, x_std, y)

    # 1) candidate sweep: one vmapped batch over the LHD starts
    starts01 = _lhd(key, n_candidates, p + 3, dtype)
    cand = starts01 * (upper - lower) + lower
    cand_obj = jax.vmap(obj)(cand)
    _, top_idx = jax.lax.top_k(-cand_obj, num_starts)
    top = cand[top_idx]

    # 2) bounded refinement of the top starts, one vmapped batch
    res = multistart_minimize(obj, top, lower=lower, upper=upper)
    w_opt, objval = res.x, res.fun

    lam = w_opt[0]
    theta_std = w_opt[1:p + 1]
    kappa = w_opt[p + 1]
    bwv = w_opt[p + 2]
    alpha_std = kappa + theta_std
    theta = theta_std / scales ** 2
    alpha = alpha_std / scales ** 2

    # 3) final assembly at the optimum (original-scale kernels, `:204-225`)
    g = _se_gram(x, theta)
    l = _se_gram(x, alpha)
    gbw = _se_gram(x, theta * bwv)

    def q_of_sig(sig):
        rs = jnp.sqrt(sig)
        return g + lam * (rs[:, None] * l * rs[None, :])

    ones = jnp.ones_like(y)
    sig, sf, _, e = _sigma_iterations(q_of_sig, g, gbw, y)
    q = q_of_sig(sig)
    chol = linalg.jitter_cholesky(q)
    u = linalg.tri_solve(chol, ones)
    wv = linalg.tri_solve(chol, y)
    beta = jnp.sum(u * wv) / jnp.sum(u * u)
    temp = linalg.chol_solve(chol, y - beta)
    tau2 = jnp.sum((y - beta) * temp) / n
    res2 = e * e

    # 4) jackknife LOO (`:171-199`): vmapped over held-out index
    if jackknife:
        idx = jnp.arange(n)
        keep = jax.vmap(lambda j: jnp.nonzero(idx != j, size=n - 1)[0])(idx)

        def loo(j, keep_j):
            xs = x[keep_j]
            ys = y[keep_j]
            gj = _se_gram(xs, theta)
            lj = _se_gram(xs, alpha)
            gbwj = _se_gram(xs, theta * bwv)

            def qj_of_sig(sig):
                rs = jnp.sqrt(sig)
                return gj + lam * (rs[:, None] * lj * rs[None, :])

            onesj = jnp.ones_like(ys)
            sigj, sfj, _, ej = _sigma_iterations(qj_of_sig, gj, gbwj, ys)
            qj = qj_of_sig(sigj)
            cholj = linalg.jitter_cholesky(qj)
            uj = linalg.tri_solve(cholj, onesj)
            wj = linalg.tri_solve(cholj, ys)
            betaj = jnp.sum(uj * wj) / jnp.sum(uj * uj)
            tempj = linalg.chol_solve(cholj, ys - betaj)
            xj = x[j]
            gv = jnp.exp(-jnp.sum(theta * (xs - xj) ** 2, axis=-1))
            lv = jnp.exp(-jnp.sum(alpha * (xs - xj) ** 2, axis=-1))
            gbv = jnp.exp(-jnp.sum(theta * bwv * (xs - xj) ** 2, axis=-1))
            vj = (gbv @ (ej * ej)) / (gbv @ onesj) / sfj
            qv = gv + lam * jnp.sqrt(vj) * jnp.sqrt(sigj) * lv
            return betaj + qv @ tempj

        yjf = jax.vmap(loo)(idx, keep)
        rmscv = jnp.sqrt(jnp.mean((y - yjf) ** 2))
    else:
        rmscv = jnp.asarray(jnp.nan, dtype)

    return CGPFit(x=x, y=y, lam=lam, theta=theta, alpha=alpha,
                  bandwidth=bwv, sig=sig, sf=sf, res2=res2, temp=temp,
                  invq_chol=chol, beta=beta, tau2=tau2, objval=objval,
                  rmscv=rmscv)


def cgp_predict(fit: CGPFit, x_new: jnp.ndarray,
                alpha_level: float = 0.05) -> CGPPrediction:
    """predict.CGP (`:249-321`), batched over test points.

    Intervals use the reference's fixed +-1.96 multiplier (`:308`) for any
    alpha; alpha_level is accepted for interface uniformity but the
    reference hard-codes 95%.
    """
    x, y = fit.x, fit.y
    n = y.shape[-1]
    ones = jnp.ones_like(y)
    g = jnp.exp(-cross_sqdist(x, x_new, fit.theta))        # (n, t)
    l = jnp.exp(-cross_sqdist(x, x_new, fit.alpha))
    gbw = jnp.exp(-cross_sqdist(x, x_new, fit.theta * fit.bandwidth))

    v = (gbw.T @ fit.res2) / (gbw.T @ ones) / fit.sf        # (t,)
    rs = jnp.sqrt(fit.sig)
    q = g + fit.lam * jnp.sqrt(v)[None, :] * (rs[:, None] * l)  # (n, t)
    mean = fit.beta + q.T @ fit.temp
    gmean = fit.beta + g.T @ fit.temp

    w = linalg.tri_solve(fit.invq_chol, q)                  # (n, t)
    u = linalg.tri_solve(fit.invq_chol, ones)
    quad = jnp.sum(w * w, axis=0)
    one_q = u @ w
    ppp = 1.0 + fit.lam * v - quad + (1.0 - one_q) ** 2 / jnp.sum(u * u)
    ppp = jnp.maximum(ppp, 0.0)
    ka = 1.96
    half = ka * jnp.sqrt(fit.tau2 * ppp)
    return CGPPrediction(mean=mean, global_mean=gmean, local_var=v,
                         lower=mean - half, upper=mean + half)
