"""Latin hypercube sampling (replaces the reference's lhs::randomLHS /
optimumLHS usage for training designs and optimizer starts,
`1D Codes and Designs/1D Combined GP Public.R:1095`, `Batch Sequential ME
Designs/Batch Sequential ME Design.R:899,935`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_lhs(key: jax.Array, n: int, d: int,
               dtype=jnp.float64) -> jnp.ndarray:
    """randomLHS: one uniform draw per stratum, strata permuted per column."""
    kp, ku = jax.random.split(key)
    u = jax.random.uniform(ku, (n, d), dtype=dtype)
    cols = []
    for j, k in enumerate(jax.random.split(kp, d)):
        perm = jax.random.permutation(k, n)
        cols.append((perm.astype(dtype) + u[:, j]) / n)
    return jnp.stack(cols, axis=1)


def _min_dist(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    d2 = d2 + jnp.eye(n, dtype=x.dtype) * 1e9
    return jnp.min(d2)


def maximin_lhs(key: jax.Array, n: int, d: int, n_candidates: int = 32,
                dtype=jnp.float64) -> jnp.ndarray:
    """Best-of-k maximin LHS — a vmapped stand-in for lhs::optimumLHS
    (which runs a serial columnwise swap optimization): draw `n_candidates`
    random LHDs in one batch and keep the one with the largest minimum
    pairwise distance."""
    keys = jax.random.split(key, n_candidates)
    designs = jnp.stack([random_lhs(k, n, d, dtype) for k in keys])
    scores = jax.vmap(_min_dist)(designs)
    return designs[jnp.argmax(scores)]
