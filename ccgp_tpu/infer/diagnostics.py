"""Cross-chain convergence diagnostics.

The reference's only convergence machinery is the single-chain Geweke rule
plus visual trace/autocorrelation checks (SURVEY section 4). Because chains
here are a vmapped batch axis (ccgp_tpu.parallel.multi_chain_metropolis),
the split-R-hat (Gelman-Rubin) statistic comes almost for free and gives a
multi-chain health check the reference cannot express.
"""
from __future__ import annotations

import jax.numpy as jnp


def gelman_rubin(chains: jnp.ndarray) -> jnp.ndarray:
    """Split-R-hat per parameter.

    chains: (c, n, p) — c chains of n draws of p parameters. Each chain is
    split in half (2c half-chains), then

        R-hat = sqrt( (W (n'-1)/n' + B/n') / W )

    with W the mean within-half-chain variance and B the between-half-chain
    variance of the means. Values near 1 indicate convergence (< 1.01 is
    the usual threshold; < 1.1 permissive).
    """
    c, n, p = chains.shape
    half = n // 2
    halves = jnp.concatenate([chains[:, :half, :], chains[:, half:2 * half, :]],
                             axis=0)                      # (2c, half, p)
    m = halves.shape[0]
    means = jnp.mean(halves, axis=1)                      # (2c, p)
    variances = jnp.var(halves, axis=1, ddof=1)           # (2c, p)
    w = jnp.mean(variances, axis=0)                       # (p,)
    b = half * jnp.var(means, axis=0, ddof=1)             # (p,)
    var_plus = w * (half - 1) / half + b / half
    return jnp.sqrt(var_plus / w)


def effective_sample_size(chains: jnp.ndarray, max_lag: int = 100) -> jnp.ndarray:
    """Crude multi-chain ESS per parameter via initial-positive-sequence
    autocorrelation truncation.

    chains: (c, n, p) -> (p,).
    """
    c, n, p = chains.shape
    xc = chains - jnp.mean(chains, axis=1, keepdims=True)
    var = jnp.mean(jnp.var(chains, axis=1, ddof=1), axis=0)  # (p,)

    lags = []
    max_lag = min(max_lag, n - 1)
    for l in range(1, max_lag + 1):
        acov = jnp.mean(jnp.sum(xc[:, : n - l, :] * xc[:, l:, :], axis=1)
                        / (n - 1), axis=0)
        lags.append(acov / var)
    rho = jnp.stack(lags)                                  # (L, p)
    # truncate at the first negative autocorrelation (per parameter)
    positive = jnp.cumprod(rho > 0, axis=0).astype(rho.dtype)
    tau = 1.0 + 2.0 * jnp.sum(rho * positive, axis=0)
    return c * n / tau
