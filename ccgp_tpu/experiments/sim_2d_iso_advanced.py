"""2-D isotropic combined GP with empirical-Bayes hyperprior selection
(reference `2D Codes and Designs/2D Combined GP Isotropic Advanced.R:
930-966`): maximin 14-pt design, 60x4 hyperprior grid, Halton N=1728,
tau=100; winning (a1,b1,a2,b2) parameterize the IG priors for the MCMC.

The reference's lambda-direct train / theta1(1+lambda) predict mismatch
(quirk 2.7-3) is reproduced under compat="reference" (rough="lambda");
the default uses consistent independent rates (rough="free")."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.eb import choose_hyperpars
from ccgp_tpu.eval.datasets import load_maximin_2d, load_hyperpars_grid
from ccgp_tpu.eval.functions import test_function_2d
from ccgp_tpu.experiments.common import run_study, StudyResult
from ccgp_tpu.experiments.sim_2d_iso import lattice
from ccgp_tpu.infer.mle import kriging_mle, mlegp_fit
from ccgp_tpu.models import MixtureSpec, MCMCConfig, InverseGamma
from ccgp_tpu.ops import kernels


@dataclass(frozen=True)
class Config:
    func: int = 2
    n_new_axis: int = 25
    alpha: float = 0.05
    n_nodes: int = 1728
    tau: float = 100.0
    compat: str = "fixed"     # 'fixed' (consistent) | 'reference' (quirk)
    mcmc: MCMCConfig = MCMCConfig(start=(1.0, 1.0, 0.0), n_max=5000,
                                  samp_size=1000, net_samp_size=1000)


def run(cfg: Config = Config(), key=None, dtype=jnp.float64) -> StudyResult:
    key = jax.random.PRNGKey(0) if key is None else key
    k_eb, k_s = jax.random.split(key)
    x = jnp.asarray(load_maximin_2d(14), dtype)
    y = test_function_2d(x, cfg.func)
    x_new = lattice(cfg.n_new_axis, dtype)
    y_true = np.asarray(test_function_2d(x_new, cfg.func))

    rough = "lambda" if cfg.compat == "reference" else "free"
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough=rough)

    # EB: sigma2 plug-in first, then scan the shipped 60x4 grid
    fam = kernels.sqexp_family()
    mle = mlegp_fit(fam, x, y, k_eb)
    grid = load_hyperpars_grid("2d")
    choice = choose_hyperpars(spec, x, y, grid, float(mle.sigma2),
                              n_nodes=cfg.n_nodes, tau=cfg.tau)
    a1, b1, a2, b2 = [float(v) for v in np.asarray(choice.pars)]

    res = run_study(spec, x, y, x_new, y_true, k_s, cfg.mcmc,
                    theta1_prior=InverseGamma(a1, b1),
                    theta2_prior=InverseGamma(a2, b2), alpha=cfg.alpha,
                    sigma2=float(mle.sigma2), single_variant="mlegp")
    return res
