"""Profile likelihood and transformed log-posterior for the combined GP.

Reference semantics (`1D Codes and Designs/1D Combined GP Public.R:397-444,
609-641`):

    beta_hat   = 1'R^{-1}y / 1'R^{-1}1                    (GLS intercept)
    sigma2_hat = (y-beta 1)'R^{-1}(y-beta 1) / n          (plug-in variance)
    loglike    = dmnorm(y; beta 1, (p^2+(1-p)^2) sigma2 R)
    logpost    = loglike + log-Jacobian + log-prior

TPU-first: everything is one Cholesky + triangular solves (no explicit
R^{-1}); a singular R yields NaN which flows to logpost = -inf, turning the
reference's try/retry exception handling (`1D...Public.R:687-693`) into pure
dataflow that the Metropolis kernel treats as a rejection.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccgp_tpu.models.combination import (
    MixtureSpec, MixParams, _effective_rates, mixed_gram, mix_weights, unpack)
from ccgp_tpu.ops import linalg
from ccgp_tpu.ops.gp import gls_beta, sigma2_mle, profile_nll  # re-export


class LogPost(NamedTuple):
    """Value + per-evaluation byproducts cached for downstream prediction."""

    val: jnp.ndarray      # log-posterior (non-finite == invalid proposal)
    beta: jnp.ndarray     # GLS intercept at these parameters
    chol: jnp.ndarray     # lower Cholesky of R_mix (the factor cache)
    params: MixParams     # constrained parameters


def make_logpost(
    spec: MixtureSpec,
    x: jnp.ndarray,
    y: jnp.ndarray,
    sigma2,
    theta1_prior=None,
    theta2_prior=None,
    p_prior=None,
    jitter: float = 0.0,
    whiten: bool = False,
):
    """Build logpost(z) for unconstrained z, closing over data and priors.

    * theta1_prior / theta2_prior apply to the constrained theta1/theta2
      entries of MixParams (theta2 is lambda in tied/lambda modes);
      anisotropic theta1 priors apply elementwise (the reference uses iid
      per-axis lognormals, `2D...Anisotropic Public.R:462`).
    * p_prior defaults to flat on (0,1).
    * whiten=True computes the Gaussian quadratic form by whitening the
      centered residual explicitly — one extra triangular solve of
      y - beta*1 — instead of the bordered identity qyy - qoy^2/qoo.
      The bordered form subtracts two large near-equal sums, which in f32
      at n >= 768 loses ~0.17 relative digits of quad to cancellation
      (DESIGN.md; adjudicated vs a CPU-f64 oracle in
      scripts/verify_whiten_oracle.py); the whitened form squares a
      residual that is computed BEFORE it becomes small, so it keeps full
      relative accuracy. Default off: at the bench sizes (n <= 512 f32)
      the bordered path is exact enough and one solve cheaper.
    """
    y = jnp.asarray(y)
    n = y.shape[-1]

    log2pi = math.log(2.0 * math.pi)

    def logpost(z: jnp.ndarray) -> LogPost:
        params, log_jac = unpack(spec, z)
        r = mixed_gram(spec, x, params)
        # ONE bordered factorization yields the factor, logdet and all
        # quadratic forms — no triangular solves in this hot path (the
        # Metropolis loop evaluates this thousands of times sequentially,
        # and on TPU a batched triangular solve is as latency-bound as the
        # factorization itself). Algebra identical to gls_beta +
        # mvn_logpdf_chol: beta = qoy/qoo, quad = qyy - qoy^2/qoo.
        q = linalg.bordered_cholesky_quadratics(r, y, jitter)
        chol = q["chol"]
        beta = q["qoy"] / q["qoo"]
        if whiten:
            w = linalg.tri_solve(chol, y - beta)
            quad = jnp.sum(w * w, axis=-1)
        else:
            quad = q["qyy"] - q["qoy"] ** 2 / q["qoo"]
        _, _, s = mix_weights(params.p)
        log_scale = jnp.log(s * sigma2)
        loglike = -0.5 * (n * log2pi + q["logdet"] + n * log_scale
                          + quad * jnp.exp(-log_scale))

        log_prior = jnp.zeros_like(loglike)
        if theta1_prior is not None:
            lp1 = theta1_prior.log_kernel(params.theta1)
            log_prior = log_prior + (jnp.sum(lp1, axis=-1)
                                     if spec.anisotropic else lp1)
        if theta2_prior is not None:
            log_prior = log_prior + theta2_prior.log_kernel(params.theta2)
        if p_prior is not None:
            log_prior = log_prior + p_prior.log_kernel(params.p)

        val = loglike + log_jac + log_prior
        # non-finite Cholesky (singular R) => -inf: proposal auto-rejected
        ok = jnp.isfinite(val)
        val = jnp.where(ok, val, -jnp.inf)
        return LogPost(val=val, beta=beta, chol=chol, params=params)

    return logpost


def make_logpost_batch(
    spec: MixtureSpec,
    x: jnp.ndarray,
    y: jnp.ndarray,
    sigma2,
    theta1_prior=None,
    theta2_prior=None,
    p_prior=None,
    jitter: float = 0.0,
    whiten: bool = False,
):
    """Batched sibling of `make_logpost`: f(Z (K, dim)) -> (vals, betas).

    whiten=True (see `make_logpost`): the cancellation-free whitened
    quadratic — batched explicit factorization + triangular solves instead
    of the quadratics kernels (which accumulate the same bordered sums
    in-register). For f32 chains at n >= 768 where qoy cancellation costs
    ~0.17 relative; slower, so default off.

    Same math, but the K Gram factorizations go through the
    `chol_quadratics` dispatcher as ONE explicit batch instead of a vmap of
    single evaluations. That routing matters on TPU: `jax.vmap` of a Pallas
    call serializes matrices across grid programs, while the small-K
    latency kernel (`ops/pallas_chol_smallk.py`) factorizes all K
    simultaneously — this is the hot evaluation inside the speculative
    Metropolis loop (`infer/metropolis.py` body_spec, K sequential-depth-
    critical calls per round).

    Only (val, beta) are returned — exactly what the sampler consumes;
    rejected candidates' factors are never materialized.
    """
    from ccgp_tpu.ops.pallas_chol import chol_quadratics

    y = jnp.asarray(y)
    n = y.shape[-1]
    log2pi = math.log(2.0 * math.pi)

    n_dim = x.shape[-1]
    se_mix = (spec.kernel1.raw_kind == "sqdist"
              and spec.kernel2.raw_kind == "sqdist")

    def logpost_batch(zs: jnp.ndarray):
        params, log_jac = jax.vmap(lambda z: unpack(spec, z))(zs)
        kk = zs.shape[0]
        if whiten:
            # cancellation-free path: explicit batched factorization +
            # whitened residual (the quadratics kernels accumulate the
            # same bordered sums the default path subtracts, so opting
            # out of cancellation means opting out of them too)
            r = jax.vmap(lambda p: mixed_gram(spec, x, p))(params)
            chol = linalg.jitter_cholesky(r, jitter)
            wy = linalg.tri_solve(chol, jnp.broadcast_to(y, (kk, n)))
            wo = linalg.tri_solve(chol, jnp.ones((kk, n), y.dtype))
            beta = jnp.sum(wo * wy, axis=-1) / jnp.sum(wo * wo, axis=-1)
            # center BEFORE whitening (third solve): `wy - beta*wo`
            # subtracts two large near-equal whitened vectors and loses
            # the same digits the bordered form does — centering y in the
            # original space first keeps the residual O(signal) before any
            # large value is formed (oracle-measured 7x at y-offset 1000,
            # scripts/verify_whiten_oracle.py)
            w = linalg.tri_solve(chol, y[None, :] - beta[:, None])
            quad = jnp.sum(w * w, axis=-1)
            logdet = linalg.chol_logdet(chol)
        elif (se_mix and jax.default_backend() == "tpu"
                and x.shape[-2] <= 256 and kk <= 16):
            # SE mixture: build the Gram INSIDE the latency kernel — the
            # per-axis sq-diff stack is a loop invariant, so each round
            # ships only the (K, d) rate rows (no Gram in HBM at all)
            from ccgp_tpu.ops.pallas_chol_smallk import (
                fused_mix_quadratics_smallk)

            th1, th2 = _effective_rates(spec, params, predict=False)
            r1 = jnp.broadcast_to(jnp.reshape(th1, (kk, -1)), (kk, n_dim))
            r2 = jnp.broadcast_to(jnp.reshape(th2, (kk, -1)), (kk, n_dim))
            q = fused_mix_quadratics_smallk(x, y, r1, r2, params.p,
                                            jitter=jitter)
        else:
            r = jax.vmap(lambda p: mixed_gram(spec, x, p))(params)  # (K,n,n)
            # R_mix is a correlation matrix (unit diagonal), so the
            # dispatcher's absolute jitter equals make_logpost's
            # mean-diagonal-relative jitter exactly.
            q = chol_quadratics(r, y, jitter=jitter)
        if not whiten:
            beta = q["qoy"] / q["qoo"]
            quad = q["qyy"] - q["qoy"] ** 2 / q["qoo"]
            logdet = q["logdet"]
        _, _, s = mix_weights(params.p)
        log_scale = jnp.log(s * sigma2)
        loglike = -0.5 * (n * log2pi + logdet + n * log_scale
                          + quad * jnp.exp(-log_scale))

        log_prior = jnp.zeros_like(loglike)
        if theta1_prior is not None:
            lp1 = theta1_prior.log_kernel(params.theta1)
            log_prior = log_prior + (jnp.sum(lp1, axis=-1)
                                     if spec.anisotropic else lp1)
        if theta2_prior is not None:
            log_prior = log_prior + theta2_prior.log_kernel(params.theta2)
        if p_prior is not None:
            log_prior = log_prior + p_prior.log_kernel(params.p)

        val = loglike + log_jac + log_prior
        val = jnp.where(jnp.isfinite(val), val, -jnp.inf)
        return val, beta

    return logpost_batch


def make_mh_round(
    spec: MixtureSpec,
    x: jnp.ndarray,
    y: jnp.ndarray,
    sigma2,
    theta1_prior=None,
    theta2_prior=None,
    p_prior=None,
    jitter: float = 0.0,
    whiten: bool = False,
):
    """One WHOLE speculative Metropolis round as a single evaluation:
    f(z, lp_val, lp_beta, cands (K, dim), log_u (K,)) ->
    (z_new, val_new, beta_new, any_acc, consumed).

    On TPU for SE/SE mixtures (n <= 256, K <= 16) this is ONE Pallas
    kernel — Gram builds, factorizations, log-posteriors AND the
    first-acceptance scan (`ops/pallas_chol_smallk.fused_mix_mh_round`);
    the profiler trace showed the unfused round spending ~12 of 33 us in
    ~30 tiny XLA selection/reduction ops. Elsewhere it reduces to the
    batched-logpost evaluation plus the same selection in XLA — the
    evaluation order and random-stream consumption are identical, so the
    chain matches the unfused speculative body draw-for-draw (up to
    float-associativity rounding).
    """
    y = jnp.asarray(y)
    n = y.shape[-1]
    log2pi = math.log(2.0 * math.pi)
    n_dim = x.shape[-1]
    se_mix = (spec.kernel1.raw_kind == "sqdist"
              and spec.kernel2.raw_kind == "sqdist")
    lp_batch = make_logpost_batch(spec, x, y, sigma2,
                                  theta1_prior=theta1_prior,
                                  theta2_prior=theta2_prior,
                                  p_prior=p_prior, jitter=jitter,
                                  whiten=whiten)

    def prior_terms(params, log_jac):
        log_prior = jnp.zeros_like(log_jac)
        if theta1_prior is not None:
            lp1 = theta1_prior.log_kernel(params.theta1)
            log_prior = log_prior + (jnp.sum(lp1, axis=-1)
                                     if spec.anisotropic else lp1)
        if theta2_prior is not None:
            log_prior = log_prior + theta2_prior.log_kernel(params.theta2)
        if p_prior is not None:
            log_prior = log_prior + p_prior.log_kernel(params.p)
        return log_jac + log_prior

    def mh_round(z, lp_val, lp_beta, cands, log_u):
        kk = cands.shape[0]
        # whiten opts out of the fused kernel: its factorization core
        # accumulates the bordered quadratics whose cancellation whiten
        # exists to avoid (lp_batch carries the whitened math instead)
        if (not whiten and se_mix and jax.default_backend() == "tpu"
                and x.shape[-2] <= 256 and kk <= 16):
            from ccgp_tpu.ops.pallas_chol_smallk import fused_mix_mh_round

            params, log_jac = jax.vmap(lambda c: unpack(spec, c))(cands)
            th1, th2 = _effective_rates(spec, params, predict=False)
            r1 = jnp.broadcast_to(jnp.reshape(th1, (kk, -1)), (kk, n_dim))
            r2 = jnp.broadcast_to(jnp.reshape(th2, (kk, -1)), (kk, n_dim))
            _, _, s = mix_weights(params.p)
            return fused_mix_mh_round(
                x, y, r1, r2, params.p, prior_terms(params, log_jac),
                jnp.log(s * sigma2), cands, lp_val, lp_beta, log_u,
                jitter=jitter)
        vals, betas = lp_batch(cands)
        acc = (vals - lp_val) > log_u
        any_acc = jnp.any(acc)
        first = jnp.argmax(acc)
        consumed = jnp.where(any_acc, first + 1, kk).astype(jnp.int32)
        z_new = jnp.where(any_acc, cands[first], z)
        val_new = jnp.where(any_acc, vals[first], lp_val)
        beta_new = jnp.where(any_acc, betas[first], lp_beta)
        return z_new, val_new, beta_new, any_acc, consumed

    return mh_round


def make_mh_rounds(
    spec: MixtureSpec,
    x: jnp.ndarray,
    y: jnp.ndarray,
    sigma2,
    theta1_prior=None,
    theta2_prior=None,
    p_prior=None,
    jitter: float = 0.0,
    stash: bool = False,
    whiten: bool = False,
):
    """R whole speculative Metropolis rounds per evaluation:
    f(z, lp_val, lp_beta, deltas (R*K, dim), log_u (R, K)) -> dict (see
    `ops.pallas_chol_smallk.fused_mix_mh_rounds`).

    On TPU for SE/SE mixtures with any (n, K) inside
    `pallas_chol_smallk.dispatch_ok`'s envelope (n <= 1024 via the
    multi-tile blocked Schur core) the R rounds run as ONE Pallas
    kernel with the candidate transform, priors and Jacobians evaluated
    IN-KERNEL via the lane-space closure below — the per-round XLA
    overhead (~30 tiny unpack/prior/operand-prep ops plus a kernel
    launch, measured ~10 us of the ~28 us round) collapses into one
    launch per R rounds. Elsewhere it falls back to a lax.scan of the
    batched-logpost evaluation with identical random-stream consumption
    and record semantics, so chains match draw-for-draw.

    stash=True (TPU path only) additionally emits each accepted record's
    prediction factor [L | L^{-1}y | L^{-1}1] — free byproducts of the
    factorization (row-scaled transpose convention, decode via
    `predict.factors.decode_stash`) — replacing the posterior
    factor-cache rebuild; since round 4 this covers the multi-tile core
    too (assembled factors, 128 < n <= 1024).
    """
    from ccgp_tpu.utils import transforms

    y = jnp.asarray(y)
    n = y.shape[-1]
    n_dim = x.shape[-1]
    se_mix = (spec.kernel1.raw_kind == "sqdist"
              and spec.kernel2.raw_kind == "sqdist")
    lp_batch = make_logpost_batch(spec, x, y, sigma2,
                                  theta1_prior=theta1_prior,
                                  theta2_prior=theta2_prior,
                                  p_prior=p_prior, jitter=jitter,
                                  whiten=whiten)

    def cand_model(cz, iilane, s2sc):
        """Lane-space `unpack` + priors: cz (K, 1, tile) with the
        unconstrained candidate in lanes < dim. Every formula below calls
        the SAME transform/prior functions as the XLA path on values
        extracted exactly, so the results are bit-identical (Mosaic and
        XLA lower exp/log/sigmoid/rsqrt to the same TPU ops — verified
        elementwise on v5e)."""

        def lane_scalar(v, i):
            return jnp.sum(jnp.where(iilane == i, v, 0.0), axis=2,
                           keepdims=True)                    # (K, 1, 1)

        if spec.anisotropic:
            dd = spec.dim
            in_axes = iilane < dd
            th1_row = jnp.where(in_axes, jnp.exp(cz), 0.0)
            psi_sum = jnp.sum(jnp.where(in_axes, cz, 0.0), axis=2,
                              keepdims=True)
            phi = lane_scalar(cz, dd)
            zeta = lane_scalar(cz, dd + 1)
            theta2, jac_l = transforms.log_to_positive(zeta)
            p, jac_p = transforms.logit_to_unit(phi)
            log_jac = psi_sum + jac_l + jac_p
            theta1_scalar = None
        else:
            in_axes = iilane < n_dim
            psi1 = lane_scalar(cz, 0)
            psi2 = lane_scalar(cz, 1)
            phi = lane_scalar(cz, 2)
            theta1_scalar, jac1 = transforms.log_to_positive(psi1)
            theta2, jac2 = transforms.log_to_positive(psi2)
            p, jac_p = transforms.logit_to_unit(phi)
            log_jac = jac1 + jac2 + jac_p
            th1_row = jnp.where(in_axes,
                                jnp.broadcast_to(theta1_scalar, cz.shape),
                                0.0)

        # effective rates (models.combination._effective_rates, predict=False)
        if spec.rough == "tied":
            lam1 = 1.0 + theta2
            r2_row = lam1 * th1_row
        else:   # 'free' and 'lambda' training covariances use theta2 direct
            r2_row = jnp.where(in_axes,
                               jnp.broadcast_to(theta2, cz.shape), 0.0)

        log_prior = jnp.zeros_like(log_jac)
        if theta1_prior is not None:
            if spec.anisotropic:
                lp_row = theta1_prior.log_kernel(th1_row)
                lp1 = jnp.sum(jnp.where(in_axes, lp_row, 0.0), axis=2,
                              keepdims=True)
            else:
                lp1 = theta1_prior.log_kernel(theta1_scalar)
            log_prior = log_prior + lp1
        if theta2_prior is not None:
            log_prior = log_prior + theta2_prior.log_kernel(theta2)
        if p_prior is not None:
            log_prior = log_prior + p_prior.log_kernel(p)
        extra = log_jac + log_prior

        _, _, s = mix_weights(p)
        log_scale = jnp.log(s * s2sc)
        return th1_row, r2_row, p, extra, log_scale

    def mh_rounds(z, lp_val, lp_beta, deltas, log_u):
        rr, kk = log_u.shape
        # 128 < n runs the blocked multi-tile Schur core up to the
        # dispatch envelope (dispatch_ok: n <= 1024, K <= 16,
        # K*tiles^2 <= 256); its ASSEMBLED factor byproducts support the
        # stash at every size (round 4)
        from ccgp_tpu.ops.pallas_chol_smallk import dispatch_ok
        n = x.shape[-2]
        # whiten routes to the XLA fallback: the fused kernel's in-register
        # quadratics are the bordered form whiten exists to avoid
        if (not whiten and se_mix and jax.default_backend() == "tpu"
                and dispatch_ok(n, kk)):
            from ccgp_tpu.ops.pallas_chol_smallk import fused_mix_mh_rounds

            return fused_mix_mh_rounds(x, y, z, lp_val, lp_beta, sigma2,
                                       deltas, log_u, cand_model,
                                       jitter=jitter, stash=stash)
        if stash:
            # The stash contract (an extra 'stash' output the caller
            # lands into its slab) is only implemented by the fused
            # kernel; silently returning a stash-less dict would crash
            # the caller with an opaque KeyError at trace time.
            raise ValueError(
                f"make_mh_rounds(stash=True) requires the fused TPU "
                f"kernel path (SE/SE mixture, dispatch_ok envelope: "
                f"n <= 1024, K <= 16); got n={n}, K={kk}, "
                f"backend={jax.default_backend()!r}")

        # XLA fallback: identical chain, scan over rounds
        dt = z.dtype

        def step(carry, rk):
            zc, lpv, lpb = carry
            drow, lu = rk
            cands = zc[None, :] + drow
            vals, betas = lp_batch(cands)
            acc = (vals - lpv) > lu
            any_acc = jnp.any(acc)
            first = jnp.argmax(acc)
            consumed = jnp.where(any_acc, first + 1, kk).astype(jnp.int32)
            z_n = jnp.where(any_acc, cands[first], zc)
            v_n = jnp.where(any_acc, vals[first], lpv)
            b_n = jnp.where(any_acc, betas[first], lpb)
            row = jnp.concatenate([z_n, b_n[None], v_n[None]])
            out = (row, any_acc, consumed)
            return (z_n, v_n, b_n), out

        (zf, vf, bf), (rows, accs, cons) = jax.lax.scan(
            step, (z, lp_val, lp_beta),
            (deltas.reshape(rr, kk, -1), log_u))
        # per-round post-state rows, matching the kernel's contract (row r
        # repeats the previous state when round r rejected)
        return {"rec": rows, "acc": accs, "consumed": cons,
                "z_fin": zf, "val_fin": vf, "beta_fin": bf}

    return mh_rounds
