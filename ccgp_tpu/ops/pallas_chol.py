"""Pallas fused batched Cholesky + profile-NLL kernel (experimental).

The combined-GP workload evaluates thousands of *small* (n <= ~128)
Gram-matrix likelihoods — hyperparameter grid scans, Halton MAP sweeps,
per-draw factor rebuilds, EB marginal likelihoods. This kernel fuses the
whole factorization + forward substitutions + quadratic reductions into one
VMEM-resident program per batch element.

MEASURED VERDICT (v5e, f32, 128x128, fetch-clean slope timing): XLA's
batched Cholesky+solve runs at ~13 us/matrix at every batch size; the
blocked kernel below reaches ~71 us/matrix and the masked variant ~55.
XLA wins by ~5x at these shapes, so `chol_quadratics` defaults to the XLA
path — the kernels are kept as a validated exploration baseline (and
because the fused single-output form halves result traffic when only the
four scalars are needed). Earlier figures suggesting XLA was 50x off
roofline were artifacts of an axon dispatch-poisoning bug (see bench.py).

Per batch element b (one 128x128 VMEM tile):
    L    = chol(G[b] + jitter I)            (column-recursive, masked ops)
    W    = L^{-1} [y, 1]                    (forward substitution)
    out  = [logdet, y'R^{-1}y, 1'R^{-1}y, 1'R^{-1}1]

from which the GLS intercept, variance MLE, profile NLL and the MVN
log-likelihood all follow in O(1):
    beta  = qoy / qoo,  n sigma2_hat = qyy - qoy^2/qoo,
    NLL   = logdet + n log sigma2_hat.

Padding contract: callers pad Gram matrices to 128 with an identity block
(log 1 = 0 contributes nothing) and right-hand sides with zeros — handled
by `chol_quadratics`. Non-PSD inputs surface as NaN outputs (sqrt of a
negative pivot), matching the framework's NaN-as-rejection convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


def _chol_nll_kernel(gram_ref, rhs_ref, out_ref):
    a = gram_ref[0]          # (TILE, TILE)
    rhs = rhs_ref[0]         # (TILE, 2)
    dtype = a.dtype
    n = TILE

    # All recurrences are expressed as MASKED full-tile operations — no
    # dynamic slicing (dynamic lane indexing is pathological on TPU and the
    # dynamic-slice formulation stalls the Mosaic compiler). Each step costs
    # a few (128,128) VPU ops + one matvec; 128 steps run as a tight
    # register loop with zero launch overhead.
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    colr = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    # every intermediate stays 2-D: Mosaic's vector layouts reject the
    # 1-D reshapes ("Offset change" lowering errors)
    def chol_col(j, l_acc):
        lj = jnp.sum(jnp.where(rows2 == j, l_acc, 0.0), axis=0,
                     keepdims=True)                               # (1, n)
        ljm = jnp.where(colr < j, lj, 0.0)
        ajj = jnp.sum(jnp.where((rows2 == j) & (cols2 == j), a, 0.0))
        d = jnp.sqrt(ajj - jnp.sum(ljm * ljm))
        acol = jnp.sum(jnp.where(cols2 == j, a, 0.0), axis=1,
                       keepdims=True)                             # (n, 1)
        lv = jnp.dot(l_acc, ljm.T, preferred_element_type=dtype)  # (n, 1)
        c = (acol - lv) / d
        newcol = jnp.where(rowv > j, c, jnp.where(rowv == j, d, 0.0))
        return jnp.where(cols2 == j, newcol, l_acc)

    l = jax.lax.fori_loop(0, n, chol_col, jnp.zeros((n, n), dtype),
                          unroll=False)

    def fwd_sub(i, w_acc):
        li = jnp.sum(jnp.where(rows2 == i, l, 0.0), axis=0,
                     keepdims=True)                               # (1, n)
        lim = jnp.where(colr < i, li, 0.0)
        lii = jnp.sum(jnp.where((rows2 == i) & (cols2 == i), l, 0.0))
        bi = jnp.sum(jnp.where(rowv == i, rhs, 0.0), axis=0,
                     keepdims=True)                               # (1, 2)
        liw = jnp.dot(lim, w_acc, preferred_element_type=dtype)   # (1, 2)
        wi = (bi - liw) / lii
        return jnp.where(rowv == i, wi, w_acc)

    w = jax.lax.fori_loop(0, n, fwd_sub, jnp.zeros((n, 2), dtype),
                          unroll=False)

    diag = jnp.sum(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1),
        jnp.log(l), 0.0))
    logdet = 2.0 * diag
    wy = w[:, 0:1]
    wo = w[:, 1:2]
    # pack the four scalars into lanes 0..3 of a (1, 128) output row
    # (TPU block shapes must be lane-aligned; a (1, 4) block is not)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    row = jnp.where(lane == 0, logdet,
          jnp.where(lane == 1, jnp.sum(wy * wy),
          jnp.where(lane == 2, jnp.sum(wy * wo),
          jnp.where(lane == 3, jnp.sum(wo * wo), 0.0))))
    out_ref[0] = row


def _chol_nll_kernel_blocked(gram_ref, rhs_ref, out_ref):
    """Blocked (8-row panel) formulation with fully static indices.

    The outer 16-panel loop and the 8 within-panel steps are unrolled at
    trace time, so every slice is static — no dynamic lane/sublane indexing
    (which Mosaic either rejects or lowers pathologically) and no
    per-iteration masks. Panel updates ride the MXU; the in-panel
    recurrence touches only a (TILE, 8) slab.
    """
    a = gram_ref[0]
    rhs = rhs_ref[0]
    dtype = a.dtype
    n = TILE
    nb = 8
    n_panels = n // nb

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    cols = []          # finished L columns, each (n, 1)
    diag_vals = []     # L[j, j] scalars in order
    for k in range(n_panels):
        r0 = k * nb
        slab = a[:, r0:r0 + nb]                         # (n, nb)
        if k:
            prev = jnp.concatenate(cols, axis=1)        # (n, r0)
            prev_rows = prev[r0:r0 + nb, :]             # (nb, r0)
            slab = slab - jnp.dot(prev, prev_rows.T,
                                  preferred_element_type=dtype)
        for j in range(nb):
            p = r0 + j
            d = jnp.sqrt(slab[p, j])
            col = slab[:, j:j + 1] / d
            col = jnp.where(row_idx > p, col,
                            jnp.where(row_idx == p, d, 0.0))
            # rank-1 update of the remaining panel columns
            if j + 1 < nb:
                pivots = col[r0 + j + 1:r0 + nb, 0]      # static gather (nb-j-1,)
                upd = col * pivots[None, :]              # (n, nb-j-1)
                slab = jnp.concatenate(
                    [slab[:, :j + 1], slab[:, j + 1:] - upd], axis=1)
            cols.append(col)
            diag_vals.append(d)

    l = jnp.concatenate(cols, axis=1)                    # (n, n)

    # blocked forward substitution for rhs (n, 2)
    w_parts = []
    for k in range(n_panels):
        r0 = k * nb
        b = rhs[r0:r0 + nb, :]                           # (nb, 2)
        if k:
            w_prev = jnp.concatenate(w_parts, axis=0)    # (r0, 2)
            b = b - jnp.dot(l[r0:r0 + nb, :r0], w_prev,
                            preferred_element_type=dtype)
        wk_rows = []
        for j in range(nb):
            p = r0 + j
            if j:
                wk = jnp.concatenate(wk_rows, axis=0)    # (j, 2)
                lrow = l[p:p + 1, r0:r0 + j]             # (1, j)
                acc = jnp.dot(lrow, wk, preferred_element_type=dtype)
            else:
                acc = jnp.zeros((1, 2), dtype)
            wj = (b[j:j + 1, :] - acc) / l[p, p]
            wk_rows.append(wj)
        w_parts.append(jnp.concatenate(wk_rows, axis=0))
    w = jnp.concatenate(w_parts, axis=0)                 # (n, 2)

    logdet = 2.0 * sum(jnp.log(d) for d in diag_vals)
    wy = w[:, 0:1]
    wo = w[:, 1:2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    row = jnp.where(lane == 0, logdet,
          jnp.where(lane == 1, jnp.sum(wy * wy),
          jnp.where(lane == 2, jnp.sum(wy * wo),
          jnp.where(lane == 3, jnp.sum(wo * wo), 0.0))))
    out_ref[0] = row


def _chol_nll_pallas(grams: jnp.ndarray, rhs: jnp.ndarray,
                     interpret: bool = False,
                     blocked: bool = True) -> jnp.ndarray:
    """grams: (B, TILE, TILE); rhs: (B, TILE, 2) -> (B, 4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = grams.shape[0]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=8 * 1024 * 1024)
    out = pl.pallas_call(
        _chol_nll_kernel_blocked if blocked else _chol_nll_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, TILE), grams.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, TILE, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(grams, rhs)
    return out[:, 0, :4]


def _pad_inputs(grams: jnp.ndarray, y: jnp.ndarray, jitter: float):
    b, n, _ = grams.shape
    dtype = grams.dtype
    if jitter:
        grams = grams + jitter * jnp.eye(n, dtype=dtype)
    if n > TILE:
        raise ValueError(f"chol_quadratics supports n <= {TILE}, got {n}")
    pad = TILE - n
    if pad:
        eye_pad = jnp.eye(TILE, dtype=dtype)[n:]
        grams = jnp.concatenate([
            jnp.concatenate([grams, jnp.zeros((b, n, pad), dtype)], axis=2),
            jnp.broadcast_to(eye_pad, (b, pad, TILE)),
        ], axis=1)
    rhs = jnp.stack([y, jnp.ones_like(y)], axis=-1)         # (n, 2)
    rhs = jnp.concatenate([rhs, jnp.zeros((pad, 2), dtype)], axis=0)
    rhs = jnp.broadcast_to(rhs[None], (b, TILE, 2))
    return grams, rhs


def chol_quadratics(grams: jnp.ndarray, y: jnp.ndarray,
                    jitter: float = 0.0, use_pallas: bool | None = None,
                    interpret: bool = False) -> dict:
    """Batched {logdet, y'R^-1 y, 1'R^-1 y, 1'R^-1 1} for small Grams.

    grams: (B, n, n); y: (n,).

    Backend selection (all numbers fetch-clean slope timings on v5e, f32,
    128x128): XLA's batched Cholesky+solve runs ~13.5 us/matrix; the
    per-matrix Pallas kernels in this module reach only ~55-71 us/matrix;
    the LANE-BATCHED kernel (pallas_chol_lanes, batch across VPU lanes)
    reaches ~9.2 us/matrix. For LATENCY-critical small batches the
    SMALL-K kernel (pallas_chol_smallk, all K matrices factorized
    simultaneously, fully unrolled) cuts the speculative-Metropolis
    round by ~2x vs the XLA path (bench.py full-Bayes 168 -> 90 ms).
    Default (use_pallas=None) on TPU: batches >= 64 with n <= 128 ->
    lanes kernel; small batches inside the small-K envelope
    (`pallas_chol_smallk.dispatch_ok`: K <= 16, n <= 1024, K*tiles^2 <=
    256) -> small-K kernel (n in (128, 1024] rides its multi-tile
    blocked-Schur core, measured 137.5 vs 166.3 us per K=4 eval against
    the XLA bordered path at n=256, 0.14-0.43 vs 0.6-0.8 ms at
    n=300-512, and 0.215/0.246/0.330 vs 0.664/0.727/0.999 ms at
    n=600/768/1024 — scripts/bench_multitile_smallk.py,
    time_multitile_tpu.py); else XLA — always XLA on other backends. use_pallas=True forces this module's per-matrix kernel
    (kept as a tested exploration baseline).
    """
    if use_pallas is None:
        if (jax.default_backend() == "tpu" and grams.shape[0] >= 64
                and grams.shape[1] <= TILE):
            from ccgp_tpu.ops.pallas_chol_lanes import chol_quadratics_lanes

            return chol_quadratics_lanes(grams, y, jitter=jitter)
        if jax.default_backend() == "tpu" and grams.shape[0] <= 16:
            from ccgp_tpu.ops.pallas_chol_smallk import (
                chol_quadratics_smallk, dispatch_ok)

            if dispatch_ok(grams.shape[1], grams.shape[0]):
                return chol_quadratics_smallk(grams, y, jitter=jitter)
        use_pallas = False
    b, n, _ = grams.shape
    if use_pallas:
        g, rhs = _pad_inputs(grams, y, jitter)
        out = _chol_nll_pallas(g, rhs, interpret=interpret)
        logdet, qyy, qoy, qoo = out[:, 0], out[:, 1], out[:, 2], out[:, 3]
    else:
        # XLA path: ONE bordered factorization per matrix instead of
        # Cholesky + triangular solve — the border rows of the factor ARE
        # L^{-1}[y, 1] (ops/linalg.py: bordered_cholesky_quadratics), and
        # on TPU the batched solve is as latency-bound as the
        # factorization, so this halves the sequential-depth cost.
        if jitter:
            grams = grams + jitter * jnp.eye(n, dtype=grams.dtype)
        from ccgp_tpu.ops import linalg

        q = linalg.bordered_cholesky_quadratics(grams, y, jitter=0.0)
        logdet, qyy, qoy, qoo = q["logdet"], q["qyy"], q["qoy"], q["qoo"]
    return {"logdet": logdet, "qyy": qyy, "qoy": qoy, "qoo": qoo}


def profile_nll_from_quadratics(q: dict, n: int) -> jnp.ndarray:
    """log det R + n log sigma2_hat from the quadratic summary."""
    beta = q["qoy"] / q["qoo"]
    n_sigma2 = q["qyy"] - beta * q["qoy"]
    return q["logdet"] + n * jnp.log(n_sigma2 / n)


def mvn_nll_from_quadratics(q: dict, n: int, log_scale) -> jnp.ndarray:
    """-2 log N(y; beta_hat 1, e^{log_scale} R) + const, per batch element:
    the transformed-posterior likelihood core (beta profiled)."""
    beta = q["qoy"] / q["qoo"]
    quad = (q["qyy"] - beta * q["qoy"]) * jnp.exp(-log_scale)
    return q["logdet"] + n * log_scale + quad
