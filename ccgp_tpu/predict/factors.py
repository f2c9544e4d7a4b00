"""Per-draw prediction factor cache.

The reference precomputes, for each retained posterior draw, the explicit
inverse R^{-1}, the vector R^{-1}(y - beta 1), the column sums of R^{-1} and
their total, then flattens all of it into a wide data frame
(`1D Codes and Designs/1D Combined GP Public.R:729-783`). On TPU the cache
is Cholesky-based and batched:

    L      (m, n, n)   lower Cholesky of R_mix per draw
    a      (m, n)      L^{-1}(y - beta 1)
    u      (m, n)      L^{-1} 1

from which every predictive quantity follows with one batched triangular
solve per test block:

    r' R^{-1} (y - beta 1) = (L^{-1} r) . a
    r' R^{-1} r            = ||L^{-1} r||^2
    1' R^{-1} r            = u . (L^{-1} r)
    1' R^{-1} 1            = ||u||^2

The whole cache is rebuilt in one vmapped pass over retained draws — on the
MXU that is cheaper than storing and re-loading m * n^2 floats of explicit
inverses the way the reference's data-frame cache does.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccgp_tpu.models.combination import MixtureSpec, MixParams, mixed_gram, unpack
from ccgp_tpu.ops import linalg


def decode_stash(fac: jnp.ndarray, n: int):
    """Decode sampler-stashed factor rows into (chol, wy, wo).

    `fac` is (m, ns2, tile) from `ops.pallas_chol_smallk.
    fused_mix_mh_rounds(stash=True)`: row j holds the ROW-scaled
    factorization row stash[j, i] = L[i, j] for i >= j (so the factor is
    read off as the tril of the TRANSPOSE — the one convention valid for
    both the bit-symmetric single-tile matrix and the multi-tile
    assembled matrix whose lower-left off-diagonal blocks are zero),
    row n is L^{-1}y and row n+1 is L^{-1}1.
    """
    chol = jnp.tril(jnp.swapaxes(fac[:, :n, :n], -1, -2))
    return chol, fac[:, n, :n], fac[:, n + 1, :n]


class FactorCache(NamedTuple):
    chol: jnp.ndarray    # (m, n, n)
    a: jnp.ndarray       # (m, n)  whitened centered data
    u: jnp.ndarray       # (m, n)  whitened ones
    beta: jnp.ndarray    # (m,)
    params: MixParams    # batched constrained parameters (leading dim m)


def build_factors(
    spec: MixtureSpec,
    x: jnp.ndarray,
    y: jnp.ndarray,
    zs: jnp.ndarray,
    betas: jnp.ndarray,
    jitter: float = 0.0,
) -> FactorCache:
    """zs: (m, n_params) retained unconstrained draws; betas: (m,)."""
    m = zs.shape[0]
    if (jax.default_backend() == "tpu" and m >= 64
            and x.shape[-2] <= 128):
        # lane-batched kernel emits (L, L^{-1}y, L^{-1}1) for 128 draws
        # per pass (~9 vs ~15 us/draw through XLA chol + two solves);
        # a = L^{-1}(y - beta 1) = wy - beta wo. R_mix has unit diagonal,
        # so the kernel's absolute jitter equals jitter_cholesky's
        # mean-diagonal-relative jitter exactly.
        from ccgp_tpu.ops.pallas_chol_lanes import chol_factors_lanes

        params, _ = jax.vmap(lambda z: unpack(spec, z))(zs)
        r = jax.vmap(lambda p: mixed_gram(spec, x, p))(params)
        f = chol_factors_lanes(r, y, jitter=jitter)
        a = f["wy"] - betas[:, None] * f["wo"]
        return FactorCache(chol=f["chol"], a=a, u=f["wo"], beta=betas,
                           params=params)

    def one(z, beta):
        params, _ = unpack(spec, z)
        r = mixed_gram(spec, x, params)
        chol = linalg.jitter_cholesky(r, jitter)
        a = linalg.tri_solve(chol, y - beta)
        u = linalg.tri_solve(chol, jnp.ones_like(y))
        return chol, a, u, params

    chol, a, u, params = jax.vmap(one)(zs, betas)
    return FactorCache(chol=chol, a=a, u=u, beta=betas, params=params)
