"""Microbench: formulations of the posterior-predict stage (v5e).

Workload = the bench full-Bayes predict: m=1000 retained draws, n=100
training points, t=625 test points, 2-D anisotropic SE mixture. Compares

  cache      : build_factors (lanes kernel) as shipped
  mom_tri    : predictive_moments as shipped (batched trsm of (n,t))
  mom_winv   : explicit W = R^{-1} (2 batched trsm vs I) + MXU matmuls
  cache+mom  : fused alternatives end-to-end

Slope protocol; accuracy cross-checked against the shipped path.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def slope(fn, args, k1=1, k2=4, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))

    def run_batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    run_batch(1)
    t1 = min(run_batch(k1) for _ in range(reps))
    t2 = min(run_batch(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1) * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from ccgp_tpu.eval.datasets import load_maximin_2d
    from ccgp_tpu.models import MixtureSpec
    from ccgp_tpu.models.combination import mixed_cross, unpack
    from ccgp_tpu.ops import kernels
    from ccgp_tpu.predict.factors import build_factors
    from ccgp_tpu.predict.posterior import predictive_moments

    dtype = jnp.float32
    jitter = 1e-3
    m, n, t = 1000, 100, 625
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)

    x_np = load_maximin_2d(100)
    rng = np.random.default_rng(0)
    y_np = rng.normal(size=n).astype(np.float32)
    u = np.linspace(0, 1, 25)
    grid_np = np.stack(np.meshgrid(u, u), -1).reshape(-1, 2).astype(np.float32)
    # plausible retained draws around a typical posterior region
    zs_np = (np.array([0.5, 0.5, 0.0, 0.0], np.float32)
             + 0.3 * rng.normal(size=(m, 4)).astype(np.float32))
    betas_np = 0.1 * rng.normal(size=m).astype(np.float32)

    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(y_np, dtype)
    grid = jnp.asarray(grid_np, dtype)
    zs = jnp.asarray(zs_np, dtype)
    betas = jnp.asarray(betas_np, dtype)
    sigma2 = jnp.asarray(0.01, dtype)

    # ---- shipped path --------------------------------------------------
    cache_j = jax.jit(lambda zs, betas: build_factors(spec, x, y, zs, betas,
                                                      jitter=jitter))
    ms_cache, cache = slope(cache_j, (zs, betas))
    print(json.dumps({"stage": "cache_shipped", "ms": round(ms_cache, 2)}))

    mom_j = jax.jit(lambda c: predictive_moments(spec, c, x, grid, sigma2))
    ms_mom, (dm0, dv0) = slope(mom_j, (cache,))
    print(json.dumps({"stage": "moments_shipped", "ms": round(ms_mom, 2)}))

    # ---- explicit-inverse moments -------------------------------------
    def moments_winv(cache):
        chol, a, uvec, beta = cache.chol, cache.a, cache.u, cache.beta
        eye = jnp.eye(n, dtype=dtype)
        linv = jax.vmap(lambda L: jax.scipy.linalg.solve_triangular(
            L, eye, lower=True))(chol)                    # (m, n, n)
        w = jnp.einsum("mkn,mkt->mnt", linv, linv,
                       precision=jax.lax.Precision.HIGHEST)
        alpha_bar = jnp.einsum("mkn,mk->mn", linv, a)
        u_bar = jnp.einsum("mkn,mk->mn", linv, uvec)
        denom = jnp.sum(uvec * uvec, axis=-1)

        def cross(params):
            return mixed_cross(spec, x, grid, params, predict=True)

        params = cache.params
        r = jax.vmap(cross)(params)                       # (m, n, t)
        wr = jnp.einsum("mnp,mpt->mnt", w, r,
                        precision=jax.lax.Precision.HIGHEST)
        mean = beta[:, None] + jnp.einsum("mn,mnt->mt", alpha_bar, r)
        quad = jnp.einsum("mnt,mnt->mt", r, wr)
        onr = jnp.einsum("mn,mnt->mt", u_bar, r)
        var = sigma2 * (1.0 - quad + (1.0 - onr) ** 2 / denom[:, None])
        return mean, var

    mom_w_j = jax.jit(moments_winv)
    ms_momw, (dm1, dv1) = slope(mom_w_j, (cache,))
    err = float(jnp.max(jnp.abs(dm1 - dm0))), float(jnp.max(jnp.abs(dv1 - dv0)))
    print(json.dumps({"stage": "moments_winv", "ms": round(ms_momw, 2),
                      "max_abs_err_vs_shipped": [round(e, 8) for e in err]}))

    # ---- alpha_bar/u_bar only (single trsm for quad) -------------------
    def moments_vbar(cache):
        chol, a, uvec, beta = cache.chol, cache.a, cache.u, cache.beta
        alpha_bar = jax.vmap(lambda L, v: jax.scipy.linalg.solve_triangular(
            L.T, v, lower=False))(chol, a)
        u_bar = jax.vmap(lambda L, v: jax.scipy.linalg.solve_triangular(
            L.T, v, lower=False))(chol, uvec)
        denom = jnp.sum(uvec * uvec, axis=-1)
        params = cache.params
        r = jax.vmap(lambda p: mixed_cross(spec, x, grid, p,
                                           predict=True))(params)
        v = jax.vmap(lambda L, rr: jax.scipy.linalg.solve_triangular(
            L, rr, lower=True))(chol, r)
        mean = cache.beta[:, None] + jnp.einsum("mn,mnt->mt", alpha_bar, r)
        quad = jnp.einsum("mnt,mnt->mt", v, v)
        onr = jnp.einsum("mn,mnt->mt", u_bar, r)
        var = sigma2 * (1.0 - quad + (1.0 - onr) ** 2 / denom[:, None])
        return mean, var

    mom_v_j = jax.jit(moments_vbar)
    ms_momv, (dm2, dv2) = slope(mom_v_j, (cache,))
    err2 = float(jnp.max(jnp.abs(dm2 - dm0))), float(jnp.max(jnp.abs(dv2 - dv0)))
    print(json.dumps({"stage": "moments_vbar", "ms": round(ms_momv, 2),
                      "max_abs_err_vs_shipped": [round(e, 8) for e in err2]}))

    # ---- cache via XLA batched cholesky (no lanes kernel) --------------
    from ccgp_tpu.models.combination import mixed_gram
    from ccgp_tpu.ops import linalg

    def cache_xla(zs, betas):
        params, _ = jax.vmap(lambda z: unpack(spec, z))(zs)
        r = jax.vmap(lambda p: mixed_gram(spec, x, p))(params)
        chol = jax.vmap(lambda g: linalg.jitter_cholesky(g, jitter))(r)
        a = jax.vmap(lambda L, b: jax.scipy.linalg.solve_triangular(
            L, y - b, lower=True))(chol, betas)
        uu = jax.vmap(lambda L: jax.scipy.linalg.solve_triangular(
            L, jnp.ones_like(y), lower=True))(chol)
        return chol, a, uu

    cache_x_j = jax.jit(cache_xla)
    ms_cx, outx = slope(cache_x_j, (zs, betas))
    errc = float(jnp.max(jnp.abs(outx[0] - cache.chol)))
    print(json.dumps({"stage": "cache_xla", "ms": round(ms_cx, 2),
                      "max_abs_err_chol": round(errc, 8)}))

    print(json.dumps({"backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
