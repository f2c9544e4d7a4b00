"""Maximum-entropy design criteria for the combined GP.

Reference (`Batch Sequential ME Designs/Batch Sequential ME Design.R`):

* first batch: maximize det R_mix(D) — the script minimizes
  `Entropy = -det(R)` (`:853-862`);
* second batch given D_old: maximize the determinant of the Schur
  complement R_new - R_cross R_old^{-1} R_cross' (`Augmented.Mixed.Entropy`,
  `:866-878`), i.e. the conditional entropy of the new batch.

The raw determinant is numerically fragile (reference quirk 2.7-8: det of a
14x14 correlation matrix underflows fast); the default here scores
`logdet` via Cholesky, which has the same maximizer. `criterion="det"`
reproduces the reference objective exactly for parity checks. Both
criteria are differentiable and batch over candidate designs (vmapped
multistart), and the augmented criterion uses the incremental
Schur/Cholesky update — R_old is factorized once per search, not per
candidate evaluation.
"""
from __future__ import annotations

import jax.numpy as jnp

from ccgp_tpu.models.combination import MixtureSpec, MixParams, mixed_gram, mixed_cross
from ccgp_tpu.ops import linalg


def me_criterion(spec: MixtureSpec, d: jnp.ndarray, params: MixParams,
                 criterion: str = "logdet", jitter: float = 0.0) -> jnp.ndarray:
    """Score to MINIMIZE for a first-batch ME design (lower = better)."""
    r = mixed_gram(spec, d, params)
    if criterion == "det":
        det = -jnp.linalg.det(r)
        # same non-finite guard as the logdet branch: a singular/NaN Gram
        # must score +inf (worst), not propagate NaN into the optimizer
        return jnp.where(jnp.isfinite(det), det, jnp.inf)
    ld = linalg.logdet_psd(r, jitter)
    return -jnp.where(jnp.isfinite(ld), ld, -jnp.inf)


def augmented_me_criterion(
    spec: MixtureSpec,
    d_old: jnp.ndarray,
    chol_old: jnp.ndarray,
    d_new: jnp.ndarray,
    params: MixParams,
    criterion: str = "logdet",
    jitter: float = 0.0,
) -> jnp.ndarray:
    """Score to MINIMIZE for a second batch given D_old (lower = better).

    chol_old: Cholesky of R_mix(D_old) (factorize once per search).
    """
    r_new = mixed_gram(spec, d_new, params)
    r_cross = mixed_cross(spec, d_old, d_new, params, predict=False).T  # (m, n_old)
    s = linalg.schur_complement(r_new, r_cross, chol_old)
    if criterion == "det":
        det = -jnp.linalg.det(s)
        return jnp.where(jnp.isfinite(det), det, jnp.inf)
    ld = linalg.logdet_psd(s, jitter)
    return -jnp.where(jnp.isfinite(ld), ld, -jnp.inf)
