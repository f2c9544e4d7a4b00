"""Second-batch ME design golden vs the shipped `Plug-in ME 14 plus 7
Design.txt` (reference `Batch Sequential ME Design.R:990-1032`).

The shipped design was produced by 25 optimumLHS-seeded L-BFGS-B restarts
of the augmented-entropy criterion at the reference chain's posterior-mean
plug-in. Our chain's plug-in differs slightly (cross-language RNG), so the
comparison is two-fold:

  1. per-point match of our regenerated second batch to the shipped one;
  2. CRITERION EQUIVALENCE: the augmented log-entropy of our design vs
     the shipped design evaluated under the SAME plug-in — if ours scores
     >= shipped on both plug-ins, the search is at least as strong and
     any residual point mismatch is plug-in drift, not optimizer
     weakness.

CPU float64, full reference budgets; swap-optimized optimumLHS starts.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ccgp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from scipy.spatial.distance import cdist  # noqa: E402

from ccgp_tpu.design import batch_me_design  # noqa: E402
from ccgp_tpu.design.entropy import augmented_me_criterion  # noqa: E402
from ccgp_tpu.eval.datasets import (load_design_txt,  # noqa: E402
                                    load_initial_me_design)
from ccgp_tpu.eval.functions import test_function_batch  # noqa: E402
from ccgp_tpu.models import (InverseGamma, MCMCConfig,  # noqa: E402
                             MixParams, MixtureSpec, fit_combined_gp)
from ccgp_tpu.ops import kernels, linalg  # noqa: E402
from ccgp_tpu.models.combination import mixed_gram  # noqa: E402


def main():
    t0 = time.time()
    n_starts = int(sys.argv[sys.argv.index("--starts") + 1]) \
        if "--starts" in sys.argv else 50
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    x1 = jnp.asarray(load_initial_me_design())
    y1 = test_function_batch(x1, 1)

    cfg = MCMCConfig(start=(0.0, 0.5, 1.0), n_max=5000, samp_size=2000,
                     net_samp_size=2000)
    fit = fit_combined_gp(spec, x1, y1, jax.random.PRNGKey(0), mcmc=cfg,
                          theta1_prior=InverseGamma(3, 2),
                          theta2_prior=InverseGamma(5, 16))
    plug = MixParams(p=fit.params.p.mean(), theta1=fit.params.theta1.mean(),
                     theta2=fit.params.theta2.mean())
    print(f"[{time.time()-t0:6.1f}s] plug-in: p={float(plug.p):.4f} "
          f"th1={float(plug.theta1):.4f} th2={float(plug.theta2):.4f} "
          f"(chain_ok={bool(fit.chain_ok)})", flush=True)

    second = batch_me_design(spec, plug, x1, 7, jax.random.PRNGKey(1),
                             n_starts=n_starts, maxiter=400)
    ours = np.asarray(second.design)
    shipped21 = load_design_txt("Plug-in ME 14 plus 7 Design", header=True)
    shipped = np.asarray(shipped21[-7:])

    d = cdist(ours, shipped)
    nearest = d.min(axis=0)
    n_match = int(np.sum(nearest < 0.05))
    print("ours:\n", ours.round(4))
    print("shipped:\n", shipped.round(4))
    print(f"per-point nearest distances: {nearest.round(3)}")
    print(f"matched within 0.05: {n_match}/7", flush=True)

    chol_old = linalg.jitter_cholesky(mixed_gram(spec, x1, plug), 0.0)

    def crit(design):
        return float(-augmented_me_criterion(
            spec, x1, chol_old, jnp.asarray(design), plug,
            criterion="logdet"))

    c_ours, c_shipped = crit(ours), crit(shipped)
    print(f"augmented log-entropy at OUR plug-in: ours {c_ours:.4f} vs "
          f"shipped {c_shipped:.4f} (higher = better; "
          f"delta {c_ours - c_shipped:+.4f})")
    print(f"wall {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
