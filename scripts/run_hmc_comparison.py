"""Sampling-efficiency comparison: random-walk Metropolis (the reference's
sampler) vs the HMC extension (`infer.hmc`) on two REAL posteriors —
the 2-D anisotropic bench workload (100-pt maximin) and the 9-D
ground-vibrations n=50 emulator.

Both samplers target the identical `make_logpost` posterior with the
identical Laplace preconditioner; the comparison is effective sample
size per second (and per posterior-gradient/evaluation), the honest
currency for MCMC. Timing follows the bench slope protocol (fetch-closed
k1/k2 batches — CLAUDE.md axon traps); `--fast` runs tiny budgets on CPU
for a correctness smoke only (CPU wall-clocks are not comparable).

Usage: python scripts/run_hmc_comparison.py [--fast] [--out PATH]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def slope_time(jf, args, k1=1, k2=3, reps=3):
    """Fetch-closed batch slope, seconds per execution."""
    out = jf(*args)
    float(np.asarray(out[0]).ravel()[0])          # warm + first fetch

    def batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = jf(*args)
        float(np.asarray(o[0]).ravel()[0])
        return time.perf_counter() - t0

    batch(1)
    t1 = min(batch(k1) for _ in range(reps))
    t2 = min(batch(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.fast:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from ccgp_tpu.eval.datasets import load_ground_vibrations, load_maximin_2d
    from ccgp_tpu.infer import (effective_sample_size, hmc, laplace,
                                metropolis, mlegp_fit)
    from ccgp_tpu.infer.mle import kriging_mle_grid
    from ccgp_tpu.models import (InverseGamma, LogNormal, MixtureSpec,
                                 make_logpost)
    from ccgp_tpu.ops import kernels

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    # 1e-3 on BOTH backends: the comparison targets the same smoothed
    # posterior the TPU bench samples; at 1e-9 the f64 2-D posterior is
    # sharp enough that RW-MH acceptance collapses to ~1% and the chain
    # hits its proposal cap — a different (degenerate) workload, not a
    # fair sampler comparison.
    jitter = 1e-3
    n_draws = 200 if args.fast else 1000
    n_warm = 100 if args.fast else 300

    def f2_np(xy):
        a, b = xy[:, 0], xy[:, 1]
        return (((a - 0.2) ** 2 - (b - 0.7) ** 2)
                * np.exp(-5 * ((a - 0.8) ** 2 + (b - 0.1) ** 2))
                * np.cos(10 * (a - 0.5) * b))

    problems = {}

    x2 = load_maximin_2d(100)
    spec2 = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                        dim=2, rough="tied", anisotropic=True)
    xa = jnp.asarray(x2, dtype)
    ya = jnp.asarray(f2_np(x2), dtype)
    s2a = kriging_mle_grid(kernels.sqexp_family(), xa, ya,
                           jitter=jitter).sigma2
    problems["2d_aniso_100pt"] = dict(
        lp=make_logpost(spec2, xa, ya, s2a,
                        theta1_prior=LogNormal(-1.0, 1.0),
                        theta2_prior=InverseGamma(3, 4), jitter=jitter),
        start=jnp.asarray([1.0, 1.0, 0.0, 0.0], dtype), leap=8)

    gv = load_ground_vibrations(50, 1)
    xg_np, yg_np = gv["x_train"], gv["y_train"]
    spec9 = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                        dim=9)
    xg = jnp.asarray(xg_np, dtype)
    yg = jnp.asarray(yg_np, dtype)
    s2g = mlegp_fit(kernels.sqexp_family(), xg, yg,
                    jax.random.PRNGKey(0), jitter=jitter).sigma2
    problems["gv_9d_n50"] = dict(
        lp=make_logpost(spec9, xg, yg, s2g,
                        theta1_prior=InverseGamma(3, 1),
                        theta2_prior=InverseGamma(5, 75), jitter=jitter),
        start=jnp.asarray([1.0, 1.0, 0.0], dtype), leap=16)

    lines = ["", "## HMC vs Metropolis sampling efficiency "
             f"({'CPU smoke' if not on_tpu else 'v5e f32'}; identical "
             "posterior + Laplace preconditioner; ESS = min over "
             "parameters, trailing window)", "",
             "| problem | sampler | draws | wall (ms) | min ESS | "
             "ESS/s | divergent |", "|---|---|---|---|---|---|---|"]

    for name, pb in problems.items():
        lp, start, leap = pb["lp"], pb["start"], pb["leap"]

        def lp_val(z, lp=lp):
            return lp(z).val

        lap = laplace(lp_val, start)

        # ---- Metropolis: runs to its n_max cap (alpha 0.99 is a
        # nearly-unreachable stopping bar), so draw count is fixed.
        def run_mh(key, lp=lp, lap=lap):
            # start at the Laplace mode, as the reference does
            # (`1D...Public.R:669,684`)
            return metropolis(lp, lap.mode, key, n_max=n_draws + n_warm,
                              samp_size=n_draws, alpha_geweke=0.99,
                              laplace_fit=lap)

        def mh_out(key):
            r = run_mh(key)
            zs, _, _ = r.retained(n_draws)
            return zs, r.n_proposals

        jmh = jax.jit(mh_out)
        zs_m, nprop = jmh(jax.random.PRNGKey(21))
        t_mh = slope_time(jmh, (jax.random.PRNGKey(21),))
        ess_m = float(jnp.min(effective_sample_size(zs_m[None])))
        lines.append(f"| {name} | Metropolis | {n_draws} | "
                     f"{t_mh * 1e3:.1f} | {ess_m:.0f} | "
                     f"{ess_m / t_mh:.0f} | — |")
        print(lines[-1], flush=True)

        # ---- HMC: same Laplace covariance as the mass matrix.
        def run_hmc(key, lp_val=lp_val, lap=lap, leap=leap):
            r = hmc(lp_val, lap.mode, key, n_samples=n_draws,
                    n_warmup=n_warm, n_leapfrog=leap, mass_cov=lap.cov)
            return r.samples, r.accept_rate, r.n_divergent

        jhmc = jax.jit(run_hmc)
        zs_h, acc_h, div_h = jhmc(jax.random.PRNGKey(22))
        t_h = slope_time(jhmc, (jax.random.PRNGKey(22),))
        ess_h = float(jnp.min(effective_sample_size(zs_h[None])))
        lines.append(f"| {name} | HMC (leap={leap}) | {n_draws} | "
                     f"{t_h * 1e3:.1f} | {ess_h:.0f} | "
                     f"{ess_h / t_h:.0f} | {int(div_h)} |")
        print(lines[-1], flush=True)
        print(f"  [{name}] mh proposals={int(nprop)} "
              f"hmc acc={float(acc_h):.3f}", flush=True)

    dest = Path(args.out) if args.out else (
        ROOT / ("RESULTS_fast.md" if args.fast else "RESULTS.md"))
    with open(dest, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"appended to {dest}")


if __name__ == "__main__":
    main()
