"""1-D combined GP simulation (reference `1D Codes and Designs/1D Combined
GP Public.R:1079-1100`): Matern(nu=5) both components, n_train=8 LHD,
functions 1-4, theta1 ~ IG(3,2), theta2 ~ IG(5,16), Quant vs y_true."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.design.lhs import random_lhs
from ccgp_tpu.eval.functions import test_function_1d
from ccgp_tpu.experiments.common import run_study, StudyResult
from ccgp_tpu.models import MixtureSpec, MCMCConfig, InverseGamma
from ccgp_tpu.ops import kernels


@dataclass(frozen=True)
class Config:
    func: int = 1
    n_train: int = 8
    nu: float = 5.0
    n_new: int = 50
    alpha: float = 0.05
    mcmc: MCMCConfig = MCMCConfig(start=(0.0, 1.5, 0.0), n_max=10000,
                                  samp_size=5000, net_samp_size=2500)


def run(cfg: Config = Config(), key=None, design: np.ndarray | None = None,
        dtype=jnp.float64) -> StudyResult:
    key = jax.random.PRNGKey(0) if key is None else key
    k_d, k_s = jax.random.split(key)
    if design is None:
        design = np.asarray(random_lhs(k_d, cfg.n_train, 1, dtype))
    x = jnp.asarray(design, dtype).reshape(cfg.n_train, 1)
    y = test_function_1d(x[:, 0], cfg.func)
    x_new = jnp.asarray(np.linspace(0, 1, cfg.n_new)[:, None], dtype)
    y_true = np.asarray(test_function_1d(x_new[:, 0], cfg.func))

    fam = kernels.matern_family(cfg.nu)
    spec = MixtureSpec(fam, fam, dim=1)
    return run_study(spec, x, y, x_new, y_true, k_s, cfg.mcmc,
                     theta1_prior=InverseGamma(3, 2),
                     theta2_prior=InverseGamma(5, 16), alpha=cfg.alpha,
                     quant_vs_truth=True)
