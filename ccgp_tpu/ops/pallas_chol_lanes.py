"""Lane-batched Cholesky + quadratics: batch across VPU lanes.

Layout inversion: instead of one (128, 128) matrix per grid program (where
the factorization recurrence serializes on tiny row/column vectors), a
tile holds 128 MATRICES with the batch in the LANE dimension —
A[i, k, b] with (i, k) the matrix indices and b the lane. Every step of
the right-looking factorization then processes all 128 matrices at full
vector width:

    for j in 0..n-1:                 (fori, sequential)
        col   = A[:, j, :] / sqrt(A[j, j, :])        # (n, 128) ops
        A    -= col (x) col  masked to k > j         # ONE (n, n, 128) op
        A[:, j, :] <- col                            # L stored in place

so the trailing O(n^2) work per step is a single full-width VPU
instruction stream instead of a scalar recurrence. Forward substitution
for the [y, 1] right-hand sides follows the same pattern on (n, 2, 128)
blocks.

This targets the regime XLA's batched Cholesky cannot exploit: its
factorization serializes panels per matrix and only parallelizes across
the batch via independent programs (~13 us/matrix measured); here the
batch IS the vector width.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TILE_N = 128     # padded matrix size
TILE_B = 128     # matrices per grid program (the lane dimension)


def _kernel(gram_ref, ry_ref, ro_ref, out_ref):
    a = gram_ref[0]            # (n, n, B) — matrix (i, k), batch in lanes
    ry0 = ry_ref[0]            # (n, B) rhs = y
    ro0 = ro_ref[0]            # (n, B) rhs = ones
    dtype = a.dtype
    n = TILE_N

    # Mosaic constraints shape everything here: no dynamic_slice in this
    # kernel type, and float reductions over TILED (sublane/lane) axes with
    # offsets are rejected — so the working set is kept in a TRANSPOSED
    # layout M[k, i, b] = A[i, k, b] (identical for the symmetric input),
    # where extracting "column j of A" is row j of M = a masked reduction
    # over the UNTILED leading axis, which lowers cleanly. The symmetric
    # rank-1 downdate keeps the trailing block consistent in either layout,
    # and finished L columns are written into rows of M.
    iidx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)        # 2-D rows
    kidx0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)    # 3-D axis0

    # Factorization and forward substitution FUSED: substitution step j
    # consumes exactly L's column j, which is what factorization step j
    # just produced — fusing avoids re-extracting every column from the
    # (n, n, B) block in a second loop (halves the masked-scan traffic).
    # The rhs lives as two clean (n, B) arrays: an (n, 2, B) block has a
    # 2-sublane tile whose offset layout Mosaic's reductions reject.
    def step(j, carry):
        a, logdet, ry, ro, wy, wo = carry
        cj = jnp.sum(jnp.where(kidx0 == j, a, 0.0), axis=0)       # (n, B)
        dj2 = jnp.sum(jnp.where(iidx == j, cj, 0.0), axis=0,
                      keepdims=True)                              # (1, B)
        d = jnp.sqrt(dj2)
        col = jnp.where(iidx >= j, cj / d, 0.0)                   # (n, B)
        upd = col[:, None, :] * col[None, :, :]                   # (n, n, B)
        a = jnp.where(kidx0 == j, col[None, :, :],
                      jnp.where(kidx0 > j, a - upd, a))
        logdet = logdet + 2.0 * jnp.log(d)
        # forward substitution with L[:, j] = col (L[j, j] = d)
        rjy = jnp.sum(jnp.where(iidx == j, ry, 0.0), axis=0,
                      keepdims=True)
        rjo = jnp.sum(jnp.where(iidx == j, ro, 0.0), axis=0,
                      keepdims=True)
        wjy = rjy / d
        wjo = rjo / d
        wy = jnp.where(iidx == j, wjy, wy)
        wo = jnp.where(iidx == j, wjo, wo)
        lmask = jnp.where(iidx > j, col, 0.0)                     # (n, B)
        ry = ry - lmask * wjy
        ro = ro - lmask * wjo
        return a, logdet, ry, ro, wy, wo

    a, logdet, _, _, wy, wo = jax.lax.fori_loop(
        0, n, step,
        (a, jnp.zeros((1, TILE_B), dtype), ry0, ro0,
         jnp.zeros_like(ry0), jnp.zeros_like(ro0)),
        unroll=False)
    qyy = jnp.sum(wy * wy, axis=0, keepdims=True)     # (1, B)
    qoy = jnp.sum(wy * wo, axis=0, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=0, keepdims=True)
    out = jnp.concatenate([logdet, qyy, qoy, qoo], axis=0)        # (4, B)
    out_ref[0] = out


def _kernel_factors(gram_ref, ry_ref, ro_ref, out_ref, l_ref, wy_ref,
                    wo_ref):
    """Like `_kernel`, but ALSO writes out the factor and the whitened
    right-hand sides: l_ref gets M with L stored transposed
    (M[k, i, b] = L[i, k, b] — the in-place layout the factorization
    already produces), wy_ref/wo_ref get w = L^{-1} [y | 1].

    Feeds the per-draw prediction factor cache (`predict/factors.py`):
    the reference rebuilds R^{-1} per retained draw (`1D...Public.R:
    729-783`); here one lanes pass per 128 draws emits every factor the
    predictive moments need. The extra HBM traffic is one (n, n, B) tile
    store — the factorization cost is unchanged.
    """
    a = gram_ref[0]
    ry0 = ry_ref[0]
    ro0 = ro_ref[0]
    dtype = a.dtype
    n = TILE_N

    iidx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    kidx0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    def step(j, carry):
        a, logdet, ry, ro, wy, wo = carry
        cj = jnp.sum(jnp.where(kidx0 == j, a, 0.0), axis=0)
        dj2 = jnp.sum(jnp.where(iidx == j, cj, 0.0), axis=0, keepdims=True)
        d = jnp.sqrt(dj2)
        col = jnp.where(iidx >= j, cj / d, 0.0)
        upd = col[:, None, :] * col[None, :, :]
        a = jnp.where(kidx0 == j, col[None, :, :],
                      jnp.where(kidx0 > j, a - upd, a))
        logdet = logdet + 2.0 * jnp.log(d)
        rjy = jnp.sum(jnp.where(iidx == j, ry, 0.0), axis=0, keepdims=True)
        rjo = jnp.sum(jnp.where(iidx == j, ro, 0.0), axis=0, keepdims=True)
        wjy = rjy / d
        wjo = rjo / d
        wy = jnp.where(iidx == j, wjy, wy)
        wo = jnp.where(iidx == j, wjo, wo)
        lmask = jnp.where(iidx > j, col, 0.0)
        ry = ry - lmask * wjy
        ro = ro - lmask * wjo
        return a, logdet, ry, ro, wy, wo

    a, logdet, _, _, wy, wo = jax.lax.fori_loop(
        0, n, step,
        (a, jnp.zeros((1, TILE_B), dtype), ry0, ro0,
         jnp.zeros_like(ry0), jnp.zeros_like(ro0)),
        unroll=False)
    qyy = jnp.sum(wy * wy, axis=0, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=0, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=0, keepdims=True)
    out_ref[0] = jnp.concatenate([logdet, qyy, qoy, qoo], axis=0)
    # every M row k was overwritten at step j=k with the masked column
    # (zeros at i < k), so M holds exactly L transposed — no residue
    l_ref[0] = a
    wy_ref[0] = wy
    wo_ref[0] = wo


def chol_factors_lanes(grams: jnp.ndarray, y: jnp.ndarray,
                       jitter: float = 0.0,
                       interpret: bool = False) -> dict:
    """Batched factor cache {chol (B, n, n), wy, wo (B, n), logdet, qyy,
    qoy, qoo} with the lane-batched kernel; same contract as Cholesky +
    two forward substitutions. grams: (B, n, n) with n <= 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = grams.shape
    dtype = grams.dtype
    if n > TILE_N:
        raise ValueError(f"n must be <= {TILE_N}")
    if jitter:
        grams = grams + jitter * jnp.eye(n, dtype=dtype)
    pad_n = TILE_N - n
    if pad_n:
        eye_pad = jnp.eye(TILE_N, dtype=dtype)[n:]
        grams = jnp.concatenate([
            jnp.concatenate([grams, jnp.zeros((b, n, pad_n), dtype)], 2),
            jnp.broadcast_to(eye_pad, (b, pad_n, TILE_N)),
        ], 1)
    pad_b = (-b) % TILE_B
    if pad_b:
        grams = jnp.concatenate([
            grams,
            jnp.broadcast_to(jnp.eye(TILE_N, dtype=dtype),
                             (pad_b, TILE_N, TILE_N)),
        ], 0)
    bt = grams.shape[0] // TILE_B
    gt = jnp.transpose(grams.reshape(bt, TILE_B, TILE_N, TILE_N),
                       (0, 2, 3, 1))
    ypad = jnp.concatenate([y, jnp.zeros((pad_n,), dtype)])
    opad = jnp.concatenate([jnp.ones_like(y), jnp.zeros((pad_n,), dtype)])
    ry = jnp.broadcast_to(ypad[None, :, None], (bt, TILE_N, TILE_B))
    ro = jnp.broadcast_to(opad[None, :, None], (bt, TILE_N, TILE_B))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out, lt, wyt, wot = pl.pallas_call(
        _kernel_factors,
        out_shape=(
            jax.ShapeDtypeStruct((bt, 4, TILE_B), dtype),
            jax.ShapeDtypeStruct((bt, TILE_N, TILE_N, TILE_B), dtype),
            jax.ShapeDtypeStruct((bt, TILE_N, TILE_B), dtype),
            jax.ShapeDtypeStruct((bt, TILE_N, TILE_B), dtype),
        ),
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((1, TILE_N, TILE_N, TILE_B),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_N, TILE_B),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        **kwargs,
    )(gt, ry, ro)
    flat = jnp.transpose(out, (0, 2, 1)).reshape(-1, 4)[:b]
    # M[k, i, b] = L[i, k]: transpose (bt, k, i, B) -> (bt, B, i, k)
    chol = jnp.transpose(lt, (0, 3, 2, 1)).reshape(-1, TILE_N, TILE_N)
    chol = chol[:b, :n, :n]
    wy = jnp.transpose(wyt, (0, 2, 1)).reshape(-1, TILE_N)[:b, :n]
    wo = jnp.transpose(wot, (0, 2, 1)).reshape(-1, TILE_N)[:b, :n]
    return {"chol": chol, "wy": wy, "wo": wo,
            "logdet": flat[:, 0], "qyy": flat[:, 1],
            "qoy": flat[:, 2], "qoo": flat[:, 3]}


def chol_quadratics_lanes(grams: jnp.ndarray, y: jnp.ndarray,
                          jitter: float = 0.0,
                          interpret: bool = False) -> dict:
    """Batched {logdet, qyy, qoy, qoo} with the lane-batched kernel.

    grams: (B, n, n) with n <= 128; B is padded to a multiple of 128.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = grams.shape
    dtype = grams.dtype
    if n > TILE_N:
        raise ValueError(f"n must be <= {TILE_N}")
    if jitter:
        grams = grams + jitter * jnp.eye(n, dtype=dtype)
    pad_n = TILE_N - n
    if pad_n:
        eye_pad = jnp.eye(TILE_N, dtype=dtype)[n:]
        grams = jnp.concatenate([
            jnp.concatenate([grams, jnp.zeros((b, n, pad_n), dtype)], 2),
            jnp.broadcast_to(eye_pad, (b, pad_n, TILE_N)),
        ], 1)
    pad_b = (-b) % TILE_B
    if pad_b:
        grams = jnp.concatenate([
            grams,
            jnp.broadcast_to(jnp.eye(TILE_N, dtype=dtype),
                             (pad_b, TILE_N, TILE_N)),
        ], 0)
    bt = grams.shape[0] // TILE_B
    # (B, n, n) -> (bt, n, n, TILE_B): batch into lanes
    gt = jnp.transpose(grams.reshape(bt, TILE_B, TILE_N, TILE_N),
                       (0, 2, 3, 1))
    ypad = jnp.concatenate([y, jnp.zeros((pad_n,), dtype)])
    opad = jnp.concatenate([jnp.ones_like(y), jnp.zeros((pad_n,), dtype)])
    ry = jnp.broadcast_to(ypad[None, :, None], (bt, TILE_N, TILE_B))
    ro = jnp.broadcast_to(opad[None, :, None], (bt, TILE_N, TILE_B))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((bt, 4, TILE_B), dtype),
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((1, TILE_N, TILE_N, TILE_B),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, TILE_B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(gt, ry, ro)
    flat = jnp.transpose(out, (0, 2, 1)).reshape(-1, 4)[:b]       # (B, 4)
    return {"logdet": flat[:, 0], "qyy": flat[:, 1],
            "qoy": flat[:, 2], "qoo": flat[:, 3]}
