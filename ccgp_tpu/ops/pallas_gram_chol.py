"""Fully fused mixture-Gram -> Cholesky -> NLL-quadratics lane kernel.

Extends ops/pallas_chol_lanes by constructing the convex-combination Gram
INSIDE the kernel: the inputs are the tiny per-axis squared-difference
stack d2[k, i, j] (shared by every batch element) and per-lane parameter
rows, so the (B, n, n) Gram batch never exists in HBM at all. Covariance
per lane b:

    D1 = sum_k r1[k, b] d2[k]          D2 = sum_k r2[k, b] d2[k]
    R  = (w1 exp(-D1) + w2 exp(-D2)) / (w1 + w2)
    C  = scale[b] * R + shift[b] J + jitter I

which covers every SE mixture the framework uses — isotropic, anisotropic,
tied-(1+lambda) — plus the EB covariance (scale = sigma2_t, shift = tau^2)
through one interface. The fused factorization + forward substitution of
pallas_chol_lanes then runs in place, emitting the quadratic summary
{logdet, y'C^-1 y, 1'C^-1 y, 1'C^-1 1} per lane.

HBM traffic per 128-lane tile: d2 (d x 64 KB) + parameter rows + 512 floats
out — versus ~8 MB of materialized Grams for the unfused pipeline.

MEASURED VERDICT (v5e f32, n=100, b=256, fetch-clean slope timing): fused
10.3 us/matrix vs 9.6 for the unfused XLA-Gram + lanes-Cholesky pipeline —
at these sizes the factorization is VPU-issue-bound, not HBM-bound, and
XLA overlaps the Gram writes with compute, so fusion does not pay. The
verdict holds at full EB scale too: routing the 624x1000 heat-exchanger
hyperprior scan (n=64) through this kernel measured 39.2 s warm vs 24.9 s
for the materialized-Gram path, same argmax — XLA pipelines the Gram
construction with the previous tile's factorization, the fused kernel
serializes them. Kept as a validated option for memory-constrained sweeps
(it needs ~1000x less HBM per tile).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_N = 128
TILE_B = 128
_RATE_ROWS = 16     # rate arrays padded to a clean sublane count


def _kernel(d2_ref, r1_ref, r2_ref, w1_ref, w2_ref, sc_ref, sh_ref,
            ry_ref, ro_ref, diag_ref, out_ref, *, ndim: int, jitter: float):
    d2 = d2_ref[...]           # (ndim, n, n)
    r1 = r1_ref[0]             # (_RATE_ROWS, B)
    r2 = r2_ref[0]
    w1 = w1_ref[0]             # (1, B)
    w2 = w2_ref[0]
    scale = sc_ref[0]
    shift = sh_ref[0]
    ry0 = ry_ref[0]            # (n, B)
    ro0 = ro_ref[0]
    diag = diag_ref[...]       # (n, 1): 1 for real rows, 0 for padding
    dtype = r1.dtype
    n = TILE_N

    # ---- build C in VMEM (d-axis contraction unrolled; d <= 9) ----------
    dist1 = jnp.zeros((n, n, TILE_B), dtype)
    dist2 = jnp.zeros((n, n, TILE_B), dtype)
    for k in range(ndim):
        d2k = d2[k][:, :, None]                        # (n, n, 1)
        r1k = r1[k:k + 1, :][None, :, :]               # (1, 1, B)
        r2k = r2[k:k + 1, :][None, :, :]
        dist1 = dist1 + d2k * r1k
        dist2 = dist2 + d2k * r2k
    s = w1 + w2                                        # (1, B)
    rmix = (w1[None, :, :] * jnp.exp(-dist1)
            + w2[None, :, :] * jnp.exp(-dist2)) / s[None, :, :]
    kidx0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    kidx1 = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    iidx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    real2 = (diag[:, None, :] * diag[None, :, 0:1]) > 0.5   # (n, n, 1)
    eye = (kidx0 == kidx1).astype(dtype)
    a = jnp.where(real2,
                  scale[None, :, :] * rmix + shift[None, :, :],
                  eye)
    if jitter:
        a = a + jnp.where((kidx0 == kidx1) & real2,
                          jnp.asarray(jitter, dtype), 0.0)

    # ---- fused factorization + forward substitution ---------------------
    def step(j, carry):
        a, logdet, ry, ro, wy, wo = carry
        cj = jnp.sum(jnp.where(kidx0 == j, a, 0.0), axis=0)       # (n, B)
        dj2 = jnp.sum(jnp.where(iidx == j, cj, 0.0), axis=0,
                      keepdims=True)                              # (1, B)
        d = jnp.sqrt(dj2)
        col = jnp.where(iidx >= j, cj / d, 0.0)
        upd = col[:, None, :] * col[None, :, :]
        a = jnp.where(kidx0 == j, col[None, :, :],
                      jnp.where(kidx0 > j, a - upd, a))
        logdet = logdet + 2.0 * jnp.log(d)
        rjy = jnp.sum(jnp.where(iidx == j, ry, 0.0), axis=0,
                      keepdims=True)
        rjo = jnp.sum(jnp.where(iidx == j, ro, 0.0), axis=0,
                      keepdims=True)
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


def fused_mix_quadratics(
    x: jnp.ndarray,            # (n, d) training inputs
    y: jnp.ndarray,            # (n,)
    r1: jnp.ndarray,           # (B, d) smooth SE rates per batch element
    r2: jnp.ndarray,           # (B, d) rough SE rates
    p: jnp.ndarray,            # (B,) mixing weights
    scale=1.0,                 # scalar or (B,): covariance scale
    shift=0.0,                 # scalar or (B,): + shift * J (all-ones)
    jitter: float = 0.0,
    interpret: bool = False,
) -> dict:
    """{logdet, qyy, qoy, qoo} for C_b = scale_b R_mix(r1_b, r2_b, p_b)
    + shift_b J + jitter I, without materializing any Gram in HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    b = r1.shape[0]
    dtype = x.dtype
    if n > TILE_N:
        raise ValueError(f"n must be <= {TILE_N}")
    if d > _RATE_ROWS:
        raise ValueError(f"d must be <= {_RATE_ROWS}")

    # per-axis squared differences (d, n, n), padded to TILE_N
    diffs = x[:, None, :] - x[None, :, :]              # (n, n, d)
    d2 = jnp.transpose(diffs * diffs, (2, 0, 1))       # (d, n, n)
    pad_n = TILE_N - n
    d2 = jnp.pad(d2, ((0, 0), (0, pad_n), (0, pad_n)))
    diag = jnp.pad(jnp.ones((n, 1), dtype), ((0, pad_n), (0, 0)))

    pad_b = (-b) % TILE_B
    bt = (b + pad_b) // TILE_B

    def lanes1(v, fill):
        v = jnp.broadcast_to(jnp.asarray(v, dtype), (b,))
        v = jnp.concatenate([v, jnp.full((pad_b,), fill, dtype)])
        return v.reshape(bt, 1, TILE_B)

    def lanes_rates(r):
        r = jnp.asarray(r, dtype)
        r = jnp.concatenate([r, jnp.ones((pad_b, d), dtype)], 0)
        r = jnp.concatenate(
            [r, jnp.zeros((b + pad_b, _RATE_ROWS - d), dtype)], 1)
        return jnp.transpose(r.reshape(bt, TILE_B, _RATE_ROWS), (0, 2, 1))

    ypad = jnp.concatenate([y, jnp.zeros((pad_n,), dtype)])
    opad = jnp.concatenate([jnp.ones_like(y), jnp.zeros((pad_n,), dtype)])
    ry = jnp.broadcast_to(ypad[None, :, None], (bt, TILE_N, TILE_B))
    ro = jnp.broadcast_to(opad[None, :, None], (bt, TILE_N, TILE_B))

    kernel = functools.partial(_kernel, ndim=d, jitter=float(jitter))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bt, 4, TILE_B), dtype),
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((d, TILE_N, TILE_N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RATE_ROWS, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RATE_ROWS, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, TILE_B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, TILE_B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(d2, lanes_rates(r1), lanes_rates(r2), lanes1(p * p, 1.0),
      lanes1((1.0 - p) ** 2, 1.0), lanes1(scale, 1.0), lanes1(shift, 0.0),
      ry, ro, diag)
    flat = jnp.transpose(out, (0, 2, 1)).reshape(-1, 4)[:b]
    return {"logdet": flat[:, 0], "qyy": flat[:, 1],
            "qoy": flat[:, 2], "qoo": flat[:, 3]}
