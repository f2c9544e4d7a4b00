"""Geweke convergence diagnostic, fully on-device.

The reference stops its Metropolis sampler when the two-sided Geweke
p-value (minimum over parameters) exceeds a threshold
(`1D Codes and Designs/1D Combined GP Public.R:707-712`, via
`coda::geweke.diag`). coda estimates the spectral density at frequency zero
with an AIC-selected autoregressive fit (`spectrum0.ar`); here that is a
fixed-shape Levinson–Durbin recursion scanned over orders with a masked AIC
argmin, so the whole diagnostic jit-compiles inside the sampling loop — no
host callback.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtr


def _autocov(x: jnp.ndarray, max_lag: int) -> jnp.ndarray:
    """Autocovariances c_0..c_max_lag, denominator n (R acf convention).

    x: (n,) -> (max_lag+1,).
    """
    n = x.shape[0]
    xc = x - jnp.mean(x)
    cols = []
    for l in range(max_lag + 1):
        cols.append(jnp.dot(xc[: n - l], xc[l:]) / n)
    return jnp.stack(cols)


def spectrum0_ar(x: jnp.ndarray, order_max: int | None = None) -> jnp.ndarray:
    """Spectral density of a scalar series at frequency 0 via an
    AIC-selected Yule-Walker AR fit (coda::spectrum0.ar / stats::ar
    semantics: order_max = min(n-1, floor(10 log10 n)),
    AIC ~ n log(v_k) + 2k, spec0 = var.pred / (1 - sum phi)^2).

    x: (n,) -> scalar. Batch via vmap.
    """
    n = x.shape[0]
    if order_max is None:
        order_max = min(n - 1, int(10.0 * math.log10(n)))
    km = order_max
    c = _autocov(x, km)
    c0 = c[0]
    dtype = x.dtype
    idx = jnp.arange(km)

    def step(carry, k):
        phi, v = carry                         # phi: (km,), v: scalar
        mask = idx < k - 1                     # previously-set coefficients
        # acc = sum_{j=1}^{k-1} phi_j * c_{k-j}
        c_kj = c[jnp.clip(k - 1 - idx, 0, km)]  # c[k - (j+1)] for j = 0..
        acc = jnp.sum(jnp.where(mask, phi * c_kj, 0.0))
        refl = (c[k] - acc) / v
        # phi_j <- phi_j - refl * phi_{k-1-j}  (indices 1-based j < k)
        phi_flip = jnp.flip(phi)               # phi_flip[i] = phi[km-1-i]
        phi_rev = jnp.roll(phi_flip, k - 1 - km)  # -> phi[k-2-j] at slot j
        phi_new = jnp.where(mask, phi - refl * phi_rev, phi)
        phi_new = jnp.where(idx == k - 1, refl, phi_new)
        v_new = v * (1.0 - refl * refl)
        sum_phi = jnp.sum(jnp.where(idx < k, phi_new, 0.0))
        return (phi_new, v_new), (v_new, sum_phi)

    init = (jnp.zeros((km,), dtype), c0)
    _, (vs, sums) = jax.lax.scan(step, init, jnp.arange(1, km + 1))
    vs = jnp.concatenate([c0[None], vs])        # orders 0..km
    sums = jnp.concatenate([jnp.zeros((1,), dtype), sums])
    orders = jnp.arange(km + 1, dtype=dtype)
    # R's ar.yw rescales the prediction variance by n/(n-(k+1))
    var_pred = vs * (n / (n - (orders + 1.0)))
    aic = n * jnp.log(jnp.maximum(vs, 1e-300)) + 2.0 * orders
    best = jnp.argmin(aic)
    return var_pred[best] / (1.0 - sums[best]) ** 2


def geweke_z(x: jnp.ndarray, frac1: float = 0.1, frac2: float = 0.5):
    """Geweke z-score for a scalar chain x: (n,)."""
    n = x.shape[0]
    n1 = int(frac1 * n)
    n2 = int(frac2 * n)
    xa = x[:n1]
    xb = x[n - n2:]
    sa = spectrum0_ar(xa)
    sb = spectrum0_ar(xb)
    return (jnp.mean(xa) - jnp.mean(xb)) / jnp.sqrt(sa / n1 + sb / n2)


def geweke_pvalue(samples: jnp.ndarray, frac1: float = 0.1,
                  frac2: float = 0.5) -> jnp.ndarray:
    """min over parameters of the two-sided p-value 2(1 - Phi(|z|)).

    samples: (n, dim) window of the chain (the reference applies this to the
    last `samp.size` accepted draws, `1D...Public.R:710`).
    """
    z = jax.vmap(lambda col: geweke_z(col, frac1, frac2))(samples.T)
    pv = 2.0 * (1.0 - ndtr(jnp.abs(z)))
    pv = jnp.where(jnp.isfinite(pv), pv, 0.0)  # failed fit => keep sampling
    return jnp.min(pv)
