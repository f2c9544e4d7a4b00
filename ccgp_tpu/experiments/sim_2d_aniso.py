"""2-D anisotropic combined GP (reference `2D Codes and Designs/2D Combined
GP Anisotropic Public.R`): per-axis SE rates theta = (theta1, theta2) with
rough component (1+lambda) theta; 4-parameter posterior (psi1, psi2, phi,
zeta); priors log theta_k ~ N(-1,1), lambda ~ IG(3,4) (`:459-462`)."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.design.lhs import maximin_lhs
from ccgp_tpu.eval.functions import test_function_2d
from ccgp_tpu.experiments.common import run_study, StudyResult
from ccgp_tpu.experiments.sim_2d_iso import lattice
from ccgp_tpu.models import MixtureSpec, MCMCConfig, InverseGamma, LogNormal
from ccgp_tpu.ops import kernels


@dataclass(frozen=True)
class Config:
    func: int = 2
    n_train: int = 14
    n_new_axis: int = 25
    alpha: float = 0.05
    mcmc: MCMCConfig = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=5000,
                                  samp_size=1000, net_samp_size=1000)


def run(cfg: Config = Config(), key=None, design: np.ndarray | None = None,
        dtype=jnp.float64) -> StudyResult:
    key = jax.random.PRNGKey(0) if key is None else key
    k_d, k_s = jax.random.split(key)
    if design is None:
        design = np.asarray(maximin_lhs(k_d, cfg.n_train, 2, dtype=dtype))
    x = jnp.asarray(design, dtype)
    y = test_function_2d(x, cfg.func)
    x_new = lattice(cfg.n_new_axis, dtype)
    y_true = np.asarray(test_function_2d(x_new, cfg.func))

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    return run_study(spec, x, y, x_new, y_true, k_s, cfg.mcmc,
                     theta1_prior=LogNormal(-1.0, 1.0),
                     theta2_prior=InverseGamma(3, 4), alpha=cfg.alpha,
                     single_variant="mlegp")
