"""The 2-D isotropic simulation study over the reference's shipped
Train_Design files (`ReadMe.md:22-23`; the reference loops 100 such designs
serially). 2-D analogue of run_sim1d_sweep.py: chunks of designs run as one
vmapped jitted program, the full study loops chunks through the same
compiled executable, persistent-cached across processes.

Usage: python scripts/run_sim2d_sweep.py [n_designs=100] [func=2] [chunk=20]
       [model=iso|aniso]

model=aniso runs the anisotropic tied-(1+lambda)theta variant (reference
`2D Codes and Designs/2D Combined GP Anisotropic Public.R`: per-axis SE
rates, log theta_k ~ N(-1,1), lambda ~ IG(3,4), 4-parameter posterior)
over the same shipped Train_Designs.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_DESIGNS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
FUNC = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 20
MODEL = sys.argv[4] if len(sys.argv) > 4 else "iso"
assert MODEL in ("iso", "aniso"), MODEL


def f_np(xy, code=FUNC):
    a, b = xy[..., 0], xy[..., 1]
    if code == 1:
        return (np.exp(-1.4 * a) * np.cos(7 * np.pi * a * b / 2)
                + np.log(a + b + 0.1))
    if code == 2:
        return (((a - 0.2) ** 2 - (b - 0.7) ** 2)
                * np.exp(-5 * ((a - 0.8) ** 2 + (b - 0.1) ** 2))
                * np.cos(10 * (a - 0.5) * b))
    if code == 3:
        return (((a - 0.5) ** 2 + 4 * (b - 0.8) ** 2)
                * (np.cos(np.pi * (a - 0.1)) + np.cos(np.pi * (b - 0.5))))
    raise ValueError(code)


def main():
    from ccgp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from ccgp_tpu.eval.datasets import load_2d_training_design
    from ccgp_tpu.infer.metropolis import metropolis
    from ccgp_tpu.models import (MixtureSpec, InverseGamma, LogNormal,
                                 make_logpost)
    from ccgp_tpu.ops import kernels, linalg
    from ccgp_tpu.ops.gp import gls_beta, sigma2_mle, profile_nll
    from ccgp_tpu.predict import build_factors, predictive_moments, posterior_predict

    dtype = jnp.float32
    jitter = 1e-5
    samp_size, net, n_max = 600, 400, 3000

    fam = kernels.sqexp_family()
    if MODEL == "aniso":
        spec = MixtureSpec(fam, fam, dim=2, rough="tied", anisotropic=True)
        start = (1.0, 1.0, 0.0, 0.0)
        priors = dict(theta1_prior=LogNormal(-1.0, 1.0),
                      theta2_prior=InverseGamma(3, 4))
    else:
        spec = MixtureSpec(fam, fam, dim=2)
        start = (1.0, 1.0, 0.0)
        priors = dict(theta1_prior=InverseGamma(3, 2),
                      theta2_prior=InverseGamma(5, 16))

    designs_np = np.stack([load_2d_training_design(i + 1)
                           for i in range(N_DESIGNS)])        # (m, 14, 2)
    y_np = f_np(designs_np)
    u = np.linspace(0, 1, 15)
    grid_np = np.stack(np.meshgrid(u, u), -1).reshape(-1, 2)
    y_true_np = f_np(grid_np)

    xg = jnp.asarray(grid_np, dtype)
    y_true = jnp.asarray(y_true_np, dtype)
    mle_grid_np = np.linspace(-2.0, 5.0, 32, dtype=np.float32)

    def study_one(x, y, key):
        mg = jnp.asarray(mle_grid_np)

        def nll(lt):
            r = fam.gram(x, jnp.exp(lt))
            return profile_nll(linalg.jitter_cholesky(r, jitter), y)

        nlls = jax.vmap(nll)(mg)
        nlls = jnp.where(jnp.isfinite(nlls), nlls, jnp.inf)
        ch = linalg.jitter_cholesky(fam.gram(x, jnp.exp(mg[jnp.argmin(nlls)])),
                                    jitter)
        s2 = sigma2_mle(ch, y, gls_beta(ch, y))
        lp = make_logpost(spec, x, y, s2, jitter=jitter, **priors)
        res = metropolis(lp, jnp.asarray(start, dtype), key,
                         n_max=n_max, samp_size=samp_size, alpha_geweke=0.5)
        zs, betas, _ = res.retained(samp_size)
        zs, betas = zs[samp_size - net:], betas[samp_size - net:]
        cache = build_factors(spec, x, y, zs, betas, jitter=jitter)
        dm, dv = predictive_moments(spec, cache, x, xg, s2)
        pred = posterior_predict(jax.random.fold_in(key, 7), dm, dv)
        e = y_true - pred.mean
        rmspe = jnp.sqrt(jnp.mean(e * e))
        cover = jnp.mean(((y_true >= pred.lower) & (y_true <= pred.upper))
                         .astype(dtype))
        return rmspe, cover, jnp.mean(pred.quant), res.chain_ok(samp_size)

    sweep = jax.jit(jax.vmap(study_one))
    keys_np = np.asarray(jax.random.split(jax.random.PRNGKey(0), N_DESIGNS))

    m_pad = (-N_DESIGNS) % CHUNK
    designs_all = np.concatenate([designs_np, designs_np[:m_pad]])
    y_all = np.concatenate([y_np, y_np[:m_pad]])
    keys_all = np.concatenate([keys_np, keys_np[:m_pad]])
    n_chunks = len(designs_all) // CHUNK

    def chunk_args(c):
        s = slice(c * CHUNK, (c + 1) * CHUNK)
        return (jnp.asarray(designs_all[s], dtype),
                jnp.asarray(y_all[s], dtype),
                jnp.asarray(keys_all[s]))

    t0 = time.time()
    compiled = sweep.lower(*chunk_args(0)).compile()
    t_compile = time.time() - t0

    t0 = time.time()
    outs = []
    for c in range(n_chunks):
        out = compiled(*chunk_args(c))
        outs.append([np.asarray(o) for o in out])
    t_run = time.time() - t0

    rmspe, cover, quant, ok = (np.concatenate([o[i] for o in outs])[:N_DESIGNS]
                               for i in range(4))

    lines = [
        "",
        f"## 2-D {'anisotropic ' if MODEL == 'aniso' else ''}simulation "
        f"sweep (function {FUNC}, {N_DESIGNS} shipped "
        f"Train_Designs, {n_chunks}x{CHUNK}-lane chunks of one compiled "
        f"program, backend={jax.default_backend()})",
        "",
        f"- RMSPE combined: median {np.median(rmspe):.4f}, "
        f"IQR [{np.quantile(rmspe, .25):.4f}, {np.quantile(rmspe, .75):.4f}]",
        f"- 95% PI coverage: median {np.median(cover):.3f}, "
        f"mean {cover.mean():.3f}",
        f"- calibration quantile: mean {quant.mean():.3f} (ideal 0.5)",
        f"- chains healthy (Geweke-converged, window full): "
        f"{int(ok.sum())}/{N_DESIGNS}",
        f"- wall-clock: compile {t_compile:.1f}s (persistent-cached) + "
        f"run {t_run:.1f}s",
    ]
    print("\n".join(lines))
    with open(ROOT / "RESULTS.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
