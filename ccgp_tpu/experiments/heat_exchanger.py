"""Heat-exchanger emulator (reference `Heat Exchanger Emulator/Combined GP
Heat Exchanger.R:736-840`): 4-D isotropic combined GP on the Qian et al.
train/test split; priors theta1 ~ IG(7,3), theta2 ~ IG(3,28) (optionally
chosen by the EB grid search over the shipped 624x4 grid with N=1000
Halton nodes, tau=50)."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.eb import choose_hyperpars
from ccgp_tpu.eval.datasets import load_qian, load_hyperpars_grid
from ccgp_tpu.experiments.common import run_study, StudyResult
from ccgp_tpu.infer.mle import kriging_mle, mlegp_fit
from ccgp_tpu.models import MixtureSpec, MCMCConfig, InverseGamma
from ccgp_tpu.ops import kernels


@dataclass(frozen=True)
class Config:
    alpha: float = 0.05
    eb_search: bool = False            # disabled by default like the ref
    n_nodes: int = 1000
    tau: float = 50.0
    theta1_pars: tuple = (7.0, 3.0)
    theta2_pars: tuple = (3.0, 28.0)
    mle_ard: bool = True               # mlegp fits per-dimension rates
    mcmc: MCMCConfig = MCMCConfig(start=(1.0, 2.7, 0.0), n_max=5000,
                                  samp_size=1000, net_samp_size=1000)


def run(cfg: Config = Config(), key=None, dtype=jnp.float64) -> StudyResult:
    key = jax.random.PRNGKey(0) if key is None else key
    k_eb, k_s = jax.random.split(key)
    q = load_qian()
    x = jnp.asarray(q["x_train"], dtype)
    y = jnp.asarray(q["y_train"], dtype)
    x_new = jnp.asarray(q["x_test"], dtype)
    y_true = q["y_test"]

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=4)
    t1, t2 = cfg.theta1_pars, cfg.theta2_pars
    sigma2 = None
    mle = None
    if cfg.eb_search:
        mle = mlegp_fit(kernels.sqexp_family(), x, y, k_eb)
        grid = load_hyperpars_grid("heat")
        choice = choose_hyperpars(spec, x, y, grid, float(mle.sigma2),
                                  n_nodes=cfg.n_nodes, tau=cfg.tau)
        a1, b1, a2, b2 = [float(v) for v in np.asarray(choice.pars)]
        t1, t2 = (a1, b1), (a2, b2)
        sigma2 = float(mle.sigma2)

    return run_study(spec, x, y, x_new, y_true, k_s, cfg.mcmc,
                     theta1_prior=InverseGamma(*t1),
                     theta2_prior=InverseGamma(*t2), alpha=cfg.alpha,
                     sigma2=sigma2, mle_ard=cfg.mle_ard,
                     single_variant="mlegp", single_fit=mle)
