"""The 1-D simulation study over the reference's shipped designs, as one
vmapped TPU program.

The reference runs `Combined.GP.fit` serially per design of
`1D Combined GP Simulation Designs.txt` (one row per size-8 LHD). Here the
ENTIRE study — plug-in sigma^2 grid-MLE, Laplace seed, Metropolis chain,
posterior prediction, RMSPE/coverage/quantile — is a single jitted function
vmapped over designs: every design is a batch lane, the chains run in
lockstep inside one lax.while_loop, and the whole sweep is one device
program.

Usage: python scripts/run_sim1d_sweep.py [n_designs] [func]
Appends a summary block to RESULTS.md.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_DESIGNS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
# NOTE: 48-lane runs have crashed the axon TPU worker (long lock-step
# while_loop); 24 lanes is the validated scale on this tunnel.
FUNC = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.eval.datasets import load_1d_designs
    from ccgp_tpu.infer.metropolis import metropolis
    from ccgp_tpu.models import MixtureSpec, InverseGamma, make_logpost
    from ccgp_tpu.ops import kernels, linalg
    from ccgp_tpu.ops.gp import gls_beta, sigma2_mle, profile_nll
    from ccgp_tpu.predict import build_factors, predictive_moments, posterior_predict

    dtype = jnp.float32
    jitter = 1e-5
    nu = 5.0
    n_new = 50
    samp_size, net, n_max = 600, 400, 3000

    fam = kernels.matern_family(nu)
    spec = MixtureSpec(fam, fam, dim=1)

    def f_np(x):
        if FUNC == 1:
            return 0.5 * np.sin(10 * x) + 0.5 * np.cos(15 * x)
        if FUNC == 2:
            return np.sin(10 * x)
        if FUNC == 3:
            u = 18 * x - 9
            return np.where(u == 0, 1.0, np.sin(u) / np.where(u == 0, 1, u))
        return np.exp(3 * x) * np.cos(5 * (x - 2))

    designs_np = load_1d_designs()[:N_DESIGNS]              # (m, 8)
    y_np = f_np(designs_np)                                  # (m, 8)
    xg_np = np.linspace(0, 1, n_new)
    y_true_np = f_np(xg_np)

    designs = jnp.asarray(designs_np[..., None], dtype)      # (m, 8, 1)
    ys = jnp.asarray(y_np, dtype)
    xg = jnp.asarray(xg_np[:, None], dtype)
    y_true = jnp.asarray(y_true_np, dtype)
    mle_grid_np = np.linspace(-4.0, 2.0, 32, dtype=np.float32)

    def study_one(x, y, key):
        # plug-in sigma^2 by dense grid over log-theta (Matern scale)
        mg = jnp.asarray(mle_grid_np)

        def nll(lt):
            r = fam.gram(x, jnp.exp(lt))
            return profile_nll(linalg.jitter_cholesky(r, jitter), y)

        nlls = jax.vmap(nll)(mg)
        nlls = jnp.where(jnp.isfinite(nlls), nlls, jnp.inf)
        lt = mg[jnp.argmin(nlls)]
        ch = linalg.jitter_cholesky(fam.gram(x, jnp.exp(lt)), jitter)
        s2 = sigma2_mle(ch, y, gls_beta(ch, y))

        lp = make_logpost(spec, x, y, s2, theta1_prior=InverseGamma(3, 2),
                          theta2_prior=InverseGamma(5, 16), jitter=jitter)
        res = metropolis(lp, jnp.asarray([0.0, 1.5, 0.0], dtype), key,
                         n_max=n_max, samp_size=samp_size, alpha_geweke=0.5)
        zs, betas, _ = res.retained(samp_size)
        zs, betas = zs[samp_size - net:], betas[samp_size - net:]
        cache = build_factors(spec, x, y, zs, betas, jitter=jitter)
        dm, dv = predictive_moments(spec, cache, x, xg, s2)
        key2 = jax.random.fold_in(key, 7)
        pred = posterior_predict(key2, dm, dv, alpha=0.05, quant_ref=y_true)
        e = y_true - pred.mean
        rmspe = jnp.sqrt(jnp.mean(e * e))
        cover = jnp.mean(((y_true >= pred.lower) & (y_true <= pred.upper))
                         .astype(dtype))
        quant = jnp.mean(pred.quant)
        return rmspe, cover, quant, res.n_recorded, res.converged

    keys = jax.random.split(jax.random.PRNGKey(0), N_DESIGNS)
    sweep = jax.jit(jax.vmap(study_one))
    t0 = time.time()
    rmspe, cover, quant, nrec, conv = sweep(designs, ys, keys)
    float(rmspe[0])  # sync (single fetch)
    dt = time.time() - t0
    rmspe, cover, quant = map(np.asarray, (rmspe, cover, quant))
    conv = np.asarray(conv)

    import jax as _j
    lines = [
        "",
        f"## 1-D simulation sweep (function {FUNC}, {N_DESIGNS} shipped "
        f"designs, one vmapped program, backend={_j.default_backend()})",
        "",
        f"- RMSPE combined: median {np.median(rmspe):.3f}, "
        f"IQR [{np.quantile(rmspe, .25):.3f}, {np.quantile(rmspe, .75):.3f}]",
        f"- 95% PI coverage: median {np.median(cover):.3f}",
        f"- calibration quantile: mean {quant.mean():.3f} (ideal 0.5)",
        f"- chains Geweke-converged: {int(conv.sum())}/{N_DESIGNS}",
        f"- wall-clock: {dt:.1f}s for the whole study",
    ]
    print("\n".join(lines))
    with open(ROOT / "RESULTS.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
