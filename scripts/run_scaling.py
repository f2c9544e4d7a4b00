"""Scaling study beyond reference sizes: MAP fit + predict wall-clock vs
training-set size n on the TPU.

The reference tops out at n=90 (SURVEY section 5); production emulation
wants n in the hundreds-to-thousands. This sweeps n over synthetic 4-D
problems with the same pipeline as bench.py (batched sigma^2 grid + Halton
MAP sweep + zoom + predict at 512 points), timing with the fetch-clean
slope protocol. Appends to RESULTS.md.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SIZES = [100, 256, 512, 1024, 2048, 4096]
if "--big" in sys.argv:
    # the HBM-resident large-n extension: one chip, f32, chunked Gram
    # workspaces (bs floor 1); shows the TPU-first design scaling where
    # R never could
    SIZES = [8192, 16384]


def main():
    import jax

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from ccgp_tpu.eb.halton import halton
    from ccgp_tpu.models import MixtureSpec, InverseGamma, make_logpost
    from ccgp_tpu.models.combination import unpack, mixed_cross
    from ccgp_tpu.ops import kernels, linalg
    from ccgp_tpu.ops.gp import gls_beta, sigma2_mle, profile_nll

    dtype = jnp.float32
    d = 4
    t_pred = 512
    fam = kernels.sqexp_family()
    spec = MixtureSpec(fam, fam, dim=d)
    rng = np.random.default_rng(0)

    def f_np(x):
        return (np.sin(3 * x[:, 0]) + np.cos(5 * x[:, 1]) * x[:, 2]
                + 0.5 * np.sin(8 * x[:, 3] * x[:, 0]))

    mle_grid = np.linspace(-3.0, 5.0, 24, dtype=np.float32)
    cloud = (halton(128, 3) * np.array([6.0, 6.0, 8.0])
             + np.array([-2.0, -2.0, -4.0])).astype(np.float32)

    lines = ["", "## Scaling beyond the reference (synthetic 4-D, MAP "
             "fit + 512-pt predict, v5e f32)", "",
             "| n train | jitter | wall-clock | RMSPE |", "|---|---|---|---|"]

    for n in SIZES:
        jitter = 1e-3 if n <= 256 else 3e-3
        x_np = rng.uniform(size=(n, d))
        y_np = f_np(x_np)
        xt_np = rng.uniform(size=(t_pred, d))
        yt_np = f_np(xt_np)
        x = jnp.asarray(x_np, dtype)
        y = jnp.asarray(y_np, dtype)
        xt = jnp.asarray(xt_np, dtype)

        # candidate batches are vmapped in memory-bounded chunks: a full
        # 128-wide vmap over n=4096 mixed Grams (2 components + mix) would
        # need ~26 GB; cap the live Gram workspace near 2 GB
        bs = max(1 if n > 4096 else 4,
                 min(128, int(2e9 / (3 * 4 * n * n))))

        def fit_predict(x, y, xt):
            mg = jnp.asarray(mle_grid)
            cl = jnp.asarray(cloud)

            def nll(lt):
                r = fam.gram(x, jnp.exp(lt))
                return profile_nll(linalg.jitter_cholesky(r, jitter), y)

            nlls = jax.lax.map(nll, mg, batch_size=min(bs, len(mle_grid)))
            nlls = jnp.where(jnp.isfinite(nlls), nlls, jnp.inf)
            ch0 = linalg.jitter_cholesky(
                fam.gram(x, jnp.exp(mg[jnp.argmin(nlls)])), jitter)
            s2 = sigma2_mle(ch0, y, gls_beta(ch0, y))
            lp = make_logpost(spec, x, y, s2,
                              theta1_prior=InverseGamma(3, 2),
                              theta2_prior=InverseGamma(5, 16),
                              jitter=jitter)
            neg = lambda z: -lp(z).val
            vals = jax.lax.map(neg, cl, batch_size=bs)
            vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
            zb = cl[jnp.argmin(vals)]
            zoom = jnp.asarray((halton(64, 3, start=17) - 0.5)
                               .astype(np.float32))
            for w in (2.0, 0.4):
                cand = zb[None, :] + w * zoom
                v2 = jax.lax.map(neg, cand, batch_size=min(bs, 64))
                v2 = jnp.where(jnp.isfinite(v2), v2, jnp.inf)
                zb = jnp.where(v2.min() < neg(zb), cand[jnp.argmin(v2)], zb)
            out = lp(zb)
            params, _ = unpack(spec, zb)
            rx = mixed_cross(spec, x, xt, params)
            v = linalg.tri_solve(out.chol, rx)
            a = linalg.tri_solve(out.chol, y - out.beta)
            mean = out.beta + jnp.einsum("n,nt->t", a, v)
            return mean, s2

        fj = jax.jit(fit_predict)
        mean, _ = jax.block_until_ready(fj(x, y, xt))

        def batch(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fj(x, y, xt)
            float(o[1])
            return time.perf_counter() - t0

        batch(1)
        k1, k2 = (1, 3) if n >= 8192 else (2, 8)
        t1 = min(batch(k1) for _ in range(3))
        t2 = min(batch(k2) for _ in range(3))
        ms = (t2 - t1) / (k2 - k1) * 1e3
        rmspe = float(np.sqrt(np.mean((yt_np - np.asarray(mean)) ** 2)))
        lines.append(f"| {n} | {jitter:g} | {ms:.1f} ms | {rmspe:.4f} |")
        print(lines[-1], flush=True)

    with open(ROOT / "RESULTS.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
