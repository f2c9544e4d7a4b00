"""On-chip gate for the MULTI-TILE factor stash (round 4).

Runs the public API `fit_combined_gp` at a multi-tile size (default
n=300) on the real TPU and checks that

  1. the sampler emitted stashed factors (factors_ok True, capacity ok),
  2. the decoded stash (tril-of-transpose row-scaled convention,
     `predict.factors.decode_stash`) matches the classic
     `build_factors` rebuild of the same retained draws — chol to f32
     tolerance (a decode bug would be O(1), not lsb drift); the
     DIFFERENCE vector a = L^{-1}y - beta L^{-1}1 amplifies relative
     error, so it gets only a sanity bound here and the real call goes
     to a CPU-f64 oracle (`adjudicate_stash_oracle.py`, spawned as a
     child): the stash must be no further from f64 truth than the
     classic rebuild,
  3. predictions computed from the fit (which consumed the stash) match
     predictions recomputed from a rebuilt cache.

Round 5 (VERDICT r4 #5): runs the TILE-BOUNDARY sizes by default —
n=256/384/512/1024 are exactly the stash-landing overshoot regime whose
n=256 row-count crash (fc13c49) the original single n=300 gate missed,
plus n=300 as the historical non-boundary point. n=1024's stash is
capacity-capped by the 2 GiB budget (~508 rows), so its gate uses a
smaller sampling budget that keeps every recorded draw inside the cap.

Usage: python scripts/verify_multitile_stash_tpu.py [n ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_SIZES = (256, 300, 384, 512, 1024)


def gate(n: int):
    import jax

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from ccgp_tpu.models import (InverseGamma, LogNormal, MCMCConfig,
                                 MixtureSpec, fit_combined_gp,
                                 predict_combined_gp)
    from ccgp_tpu.ops import kernels
    from ccgp_tpu.predict.factors import build_factors
    from ccgp_tpu.predict.posterior import posterior_predict

    assert jax.default_backend() == "tpu", jax.default_backend()

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x_np = rng.uniform(size=(n, 2)).astype(np.float32)
    y_np = (np.sin(5 * x_np[:, 0]) + np.cos(3 * x_np[:, 1])
            + 0.05 * rng.normal(size=n)).astype(np.float32)
    x, y = jnp.asarray(x_np, dtype), jnp.asarray(y_np, dtype)
    xt = jnp.asarray(rng.uniform(size=(64, 2)), dtype)

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    if n >= 1024:
        # capped-stash regime: 2 GiB / (1032*1024*4 B/row) ~ 508 rows;
        # n_max bounds recorded draws strictly under the cap so the gate
        # exercises the capped stash rather than its rebuild fallback
        cfg = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=480,
                         samp_size=200, net_samp_size=200, speculative=4)
    else:
        cfg = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=1500,
                         samp_size=400, net_samp_size=400, speculative=4)
    kf, kp = jax.random.split(jax.random.PRNGKey(7))

    t0 = time.perf_counter()
    fit = fit_combined_gp(spec, x, y, kf, mcmc=cfg,
                          theta1_prior=LogNormal(-1.0, 1.0),
                          theta2_prior=InverseGamma(3, 4),
                          jitter=3e-3, mle_method="grid")
    jax.block_until_ready(fit.cache.chol)
    print(f"fit: {time.perf_counter() - t0:.1f} s "
          f"(n_recorded={int(fit.mcmc.n_recorded)}, "
          f"n_proposals={int(fit.mcmc.n_proposals)}, "
          f"chain_ok={bool(fit.chain_ok)})")

    assert fit.mcmc.factors is not None, "stash not engaged at n=%d" % n
    print("factors buffer:", fit.mcmc.factors.shape,
          "factors_ok:", bool(fit.mcmc.factors_ok))
    assert bool(fit.mcmc.factors_ok)

    # classic rebuild of the same retained draws
    rebuilt = build_factors(spec, x, y, fit.zs, fit.cache.beta,
                            jitter=3e-3)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        den = max(float(np.max(np.abs(b))), 1e-12)
        return float(np.max(np.abs(a - b))) / den

    d_chol = rel(fit.cache.chol, rebuilt.chol)
    d_a = rel(fit.cache.a, rebuilt.a)
    d_u = rel(fit.cache.u, rebuilt.u)
    print(f"stash-vs-rebuild rel: chol={d_chol:.2e} a={d_a:.2e} "
          f"u={d_u:.2e}")
    # chol/u are direct quantities (decode bug => O(1) error); a is a
    # difference and both sides are f32, so it only gets a sanity bound
    # here — the accuracy call is the f64 oracle below
    assert d_chol < 1e-4 and d_a < 1e-2 and d_u < 1e-3

    np.savez("/tmp/stash_gate.npz",
             x=x_np, y=y_np, zs=np.asarray(fit.zs),
             betas=np.asarray(fit.cache.beta), dim=2, jitter=3e-3,
             stash_chol=np.asarray(fit.cache.chol),
             stash_a=np.asarray(fit.cache.a),
             stash_u=np.asarray(fit.cache.u),
             rebuild_chol=np.asarray(rebuilt.chol),
             rebuild_a=np.asarray(rebuilt.a),
             rebuild_u=np.asarray(rebuilt.u))

    # predictions through both caches
    p1 = predict_combined_gp(spec, fit, x, xt, kp)
    fit2 = fit._replace(cache=rebuilt)
    p2 = predict_combined_gp(spec, fit2, x, xt, kp)
    d_mean = rel(p1.mean, p2.mean)
    d_lo = rel(p1.lower, p2.lower)
    d_hi = rel(p1.upper, p2.upper)
    print(f"predict stash-vs-rebuild rel: mean={d_mean:.2e} "
          f"lower={d_lo:.2e} upper={d_hi:.2e}")
    assert d_mean < 1e-3 and d_lo < 1e-2 and d_hi < 1e-2
    assert np.isfinite(np.asarray(p1.mean)).all()

    # CPU-f64 oracle adjudication in a child process (this process is
    # pinned to the TPU backend)
    import subprocess
    subprocess.run(
        [sys.executable,
         str(Path(__file__).resolve().parent / "adjudicate_stash_oracle.py")],
        check=True)
    print(f"OK n={n}")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or list(DEFAULT_SIZES)
    for n in sizes:
        print(f"=== stash gate n={n} ===", flush=True)
        gate(n)
    print(f"ALL OK: sizes={sizes}")


if __name__ == "__main__":
    main()
