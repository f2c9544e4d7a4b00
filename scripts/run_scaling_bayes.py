"""Scaling study for the FULL BAYESIAN pipeline: fit + predict vs n.

Complements the MAP scaling table (run_scaling.py): this times the
reference's own pipeline — plug-in sigma^2 (batched grid) -> Laplace ->
Geweke-stopped speculative Metropolis -> 400-draw posterior-predict at
512 points — on synthetic 4-D problems. n <= 128 rides the single-tile
multi-round Pallas kernel + factor stash; 128 < n <= 512 the multi-tile
blocked-Schur rounds kernel; n > 512 the chunked driver's XLA scan
fallback (~20 rounds per dispatch). Appends to RESULTS.md (or --out).

`--sizes` selects the n sweep; `--cap` overrides the small-K fit-path
dispatch cap (`ops.pallas_chol_smallk.DISPATCH_N_CAP`) for the run —
used to time candidate widenings (e.g. n=600/768 through the multi-tile
kernel) AFTER scripts/verify_multitile_tpu.py establishes on-chip parity
at those sizes, without touching the shipped default.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SIZES = [100, 256, 384, 512, 1024]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=SIZES)
    ap.add_argument("--cap", type=int, default=None,
                    help="override smallk.DISPATCH_N_CAP for this run")
    ap.add_argument("--out", type=str, default=None,
                    help="append the table here instead of RESULTS.md")
    args = ap.parse_args()

    import jax

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from ccgp_tpu.models import (
        MixtureSpec, MCMCConfig, InverseGamma, fit_combined_gp,
        predict_combined_gp,
    )
    from ccgp_tpu.ops import kernels
    from ccgp_tpu.ops import pallas_chol_smallk as smallk

    if args.cap is not None:
        smallk.DISPATCH_N_CAP = args.cap

    dtype = jnp.float32
    d = 4
    t_pred = 512
    fam = kernels.sqexp_family()
    spec = MixtureSpec(fam, fam, dim=d)
    rng = np.random.default_rng(0)

    def f_np(x):
        return (np.sin(3 * x[:, 0]) + np.cos(5 * x[:, 1]) * x[:, 2]
                + 0.5 * np.sin(8 * x[:, 3] * x[:, 0]))

    cfg = MCMCConfig(start=(1.0, 1.0, 0.0), n_max=3000, samp_size=600,
                     net_samp_size=400, speculative=4)

    cap_note = (f" (DISPATCH_N_CAP={args.cap})" if args.cap is not None
                else "")
    lines = ["", "## Full-Bayesian scaling (synthetic 4-D, Laplace + "
             "Geweke-stopped Metropolis + 400-draw predict at 512 pts, "
             f"v5e f32){cap_note}", "",
             "| n train | jitter | wall-clock | ms / round | ms / recorded draw | proposals / draw | rounds | RMSPE | draws | healthy |",
             "|---|---|---|---|---|---|---|---|---|---|"]

    for n in args.sizes:
        jitter = 1e-3 if n <= 256 else 3e-3
        x_np = rng.uniform(size=(n, d))
        y_np = f_np(x_np).astype(np.float32)
        xt_np = rng.uniform(size=(t_pred, d))
        yt_np = f_np(xt_np)
        x = jnp.asarray(x_np, dtype)
        y = jnp.asarray(y_np, dtype)
        xt = jnp.asarray(xt_np, dtype)

        # beyond the kernel cap (n > 1024) the full (400, n, n) factor
        # cache OOMs the 16 GB chip (6.25 GB of chols alone at n=2048,
        # plus the batched-trsm workspace): go through the LAZY cache +
        # draw-chunked moments, chunk sized to ~1 GB of factors
        chunk = None if n <= 1024 else max(8, (1 << 30) // (n * n * 4))

        def fit_predict(x, y, xt, key):
            kf, kp = jax.random.split(key)
            fit = fit_combined_gp(spec, x, y, kf, mcmc=cfg,
                                  theta1_prior=InverseGamma(3, 2),
                                  theta2_prior=InverseGamma(5, 16),
                                  jitter=jitter, mle_method="grid",
                                  draw_chunk=chunk)
            if chunk is None:
                pred = predict_combined_gp(spec, fit, x, xt, kp)
            else:
                pred = predict_combined_gp(spec, fit, x, xt, kp, y=y,
                                           jitter=jitter, draw_chunk=chunk)
            return (pred.mean, fit.chain_ok, fit.mcmc.n_recorded,
                    fit.sigma2, fit.mcmc.n_proposals, fit.mcmc.n_rounds)

        jf = jax.jit(fit_predict)
        key = jax.random.PRNGKey(11)
        out = jax.block_until_ready(jf(x, y, xt, key))
        float(out[3])

        def batch(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = jf(x, y, xt, key)
            float(o[3])
            return time.perf_counter() - t0

        batch(1)
        t1 = min(batch(1) for _ in range(3))
        t2 = min(batch(3) for _ in range(3))
        ms = (t2 - t1) / 2 * 1e3
        rmspe = float(np.sqrt(np.mean((yt_np - np.asarray(out[0])) ** 2)))
        # ms/ROUND is the honest kernel-work unit (each speculative round
        # evaluates all K candidates as one batched kernel step no matter
        # how many it consumes); ms/recorded-draw and proposals/draw then
        # expose the SAMPLING-luck factors (acceptance rate, where Geweke
        # stops) that the old single-column table conflated (VERDICT r3).
        nrec, nprop = max(int(out[2]), 1), max(int(out[4]), 1)
        nrnd = max(int(out[5]), 1)
        lines.append(f"| {n} | {jitter} | {ms:.1f} ms | "
                     f"{ms / nrnd:.4f} | {ms / nrec:.3f} | "
                     f"{nprop / nrec:.2f} | {nrnd} | {rmspe:.4f} | "
                     f"{nrec} | {bool(out[1])} |")
        print(lines[-1], flush=True)

    dest = Path(args.out) if args.out else ROOT / "RESULTS.md"
    with open(dest, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"appended to {dest}")


if __name__ == "__main__":
    main()
