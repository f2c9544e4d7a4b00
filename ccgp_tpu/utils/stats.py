"""Statistical helpers: MVN log-density via Cholesky, R-compatible
quantiles (including masked variants for fixed-shape filtering), and
batch-means standard errors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ccgp_tpu.ops import linalg

_LOG2PI = 1.8378770664093453


def mvn_logpdf_chol(y: jnp.ndarray, mean, chol: jnp.ndarray,
                    log_scale=0.0) -> jnp.ndarray:
    """log N(y; mean, C) where C = exp(log_scale) * L L^T.

    Mirrors `mnormt::dmnorm(y, mean, s2*sigma2*R, log=1)` with the scalar
    variance factor passed in log space so callers never scale the matrix
    (`1D Codes and Designs/1D Combined GP Public.R:629`).
    """
    n = y.shape[-1]
    resid = y - mean
    w = linalg.tri_solve(chol, resid)
    quad = jnp.sum(w * w, axis=-1) * jnp.exp(-log_scale)
    logdet = linalg.chol_logdet(chol) + n * log_scale
    return -0.5 * (n * _LOG2PI + logdet + quad)


def quantile_type7(x: jnp.ndarray, q, axis=-1) -> jnp.ndarray:
    """R's default (type-7) quantile = numpy/jnp 'linear' interpolation."""
    return jnp.quantile(x, jnp.asarray(q), axis=axis, method="linear")


def masked_quantile(x: jnp.ndarray, valid: jnp.ndarray, q) -> jnp.ndarray:
    """Type-7 quantile of x[valid] with fixed shapes (vmap/jit-safe).

    Invalid entries are sorted to the end; interpolation runs on the
    effective count m = sum(valid). Matches the reference's dynamic-shape
    filtering of negative-variance draws (`2D Codes and Designs/2D Combined
    GP Isotropic Public.R:625-626`).
    """
    n = x.shape[-1]
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(valid, x, big), axis=-1)
    m = jnp.sum(valid, axis=-1)
    q = jnp.asarray(q, x.dtype)
    h = (m.astype(x.dtype) - 1.0) * q
    lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    hi = jnp.minimum(hi, jnp.maximum(m - 1, 0))
    frac = h - lo.astype(x.dtype)
    xlo = jnp.take_along_axis(xs, lo[None] if lo.ndim < xs.ndim else lo, -1)
    xhi = jnp.take_along_axis(xs, hi[None] if hi.ndim < xs.ndim else hi, -1)
    return (xlo + frac * (xhi - xlo)).squeeze(-1)


def masked_quantile_pair(x: jnp.ndarray, valid: jnp.ndarray,
                         q_lo, q_hi) -> tuple:
    """Both type-7 quantiles of a TAIL pair (e.g. 0.025/0.975) without a
    full sort — the MC-interval hot path's aggregation over (t, m) draw
    matrices (two masked_quantile calls = two full XLA sorts, measured
    ~5.5 ms of the 100-pt full-Bayes fit at m=1000, t=625).

    EXACT for every valid-count m_t: the type-7 interpolation at q reads
    order statistics floor((m_t-1)q) and +1; measured from the nearer
    extreme those indices are bounded by ceil((m-1)*q_tail) + 1 for ANY
    m_t <= m, so a static-k `lax.top_k` per tail suffices. Falls back to
    the single-sort path when the tails are not small. Values identical
    to two masked_quantile calls (verified element-equal in tests).
    """
    n = x.shape[-1]
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    m = jnp.sum(valid, axis=-1)
    import math as _math

    k_lo = int(_math.ceil((n - 1) * float(q_lo))) + 2
    k_hi = int(_math.ceil((n - 1) * (1.0 - float(q_hi)))) + 2

    if k_lo + k_hi >= n // 2:
        xs = jnp.sort(jnp.where(valid, x, big), axis=-1)

        def interp(q):
            q = jnp.asarray(q, x.dtype)
            h = (m.astype(x.dtype) - 1.0) * q
            lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, n - 1)
            hi = jnp.clip(lo + 1, 0, n - 1)
            hi = jnp.minimum(hi, jnp.maximum(m - 1, 0))
            frac = h - lo.astype(x.dtype)
            xlo = jnp.take_along_axis(xs, lo[..., None], -1)
            xhi = jnp.take_along_axis(xs, hi[..., None], -1)
            return (xlo + frac[..., None] * (xhi - xlo)).squeeze(-1)

        return interp(q_lo), interp(q_hi)

    # two static-k partial selections instead of one O(n log^2 n) sort
    # (invalid -> -big so they select LAST, matching big-padded sorting)
    bot = -jax.lax.top_k(jnp.where(valid, -x, -big), k_lo)[0]  # ascending
    top = jax.lax.top_k(jnp.where(valid, x, -big), k_hi)[0]    # descending

    def interp_tail(q, tail):
        q = jnp.asarray(q, x.dtype)
        h = (m.astype(x.dtype) - 1.0) * q
        lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, n - 1)
        hi = jnp.minimum(jnp.clip(lo + 1, 0, n - 1),
                         jnp.maximum(m - 1, 0))
        frac = h - lo.astype(x.dtype)
        if tail == "lo":
            xlo = jnp.take_along_axis(bot, jnp.clip(lo, 0, k_lo - 1)[..., None], -1)
            xhi = jnp.take_along_axis(bot, jnp.clip(hi, 0, k_lo - 1)[..., None], -1)
        else:
            ilo = jnp.clip(m - 1 - lo, 0, k_hi - 1)
            ihi = jnp.clip(m - 1 - hi, 0, k_hi - 1)
            xlo = jnp.take_along_axis(top, ilo[..., None], -1)
            xhi = jnp.take_along_axis(top, ihi[..., None], -1)
        val = (xlo + frac[..., None] * (xhi - xlo)).squeeze(-1)
        # all-invalid row: the 'hi' selection buffer is -big filled
        # (selected descending), which would invert the interval; the
        # sort path returns +big for both endpoints — match it.
        return jnp.where(m == 0, big, val)

    return interp_tail(q_lo, "lo"), interp_tail(q_hi, "hi")


def masked_mean(x: jnp.ndarray, valid: jnp.ndarray, axis=-1) -> jnp.ndarray:
    w = valid.astype(x.dtype)
    return jnp.sum(x * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1.0)


def batch_se(x: jnp.ndarray, batch_size: int = 20) -> jnp.ndarray:
    """Batch-means standard error of the mean (coda::batchSE analogue),
    used by the reference's 2-D prediction path (`2D...Isotropic
    Public.R:637`)."""
    n = x.shape[-1]
    nb = n // batch_size
    xb = x[..., : nb * batch_size].reshape(*x.shape[:-1], nb, batch_size)
    means = jnp.mean(xb, axis=-1)
    var_b = jnp.var(means, axis=-1, ddof=1)
    return jnp.sqrt(var_b * batch_size / (nb * batch_size))
