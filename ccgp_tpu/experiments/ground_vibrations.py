"""Ground-vibrations emulator (reference `Ground Vibrations
Emulator/Combined GP Ground Vibrations.R:690-762`): 9-D isotropic combined
GP over the shipped train/test splits (sizes 50 and 90), priors
theta1 ~ IG(3,1), theta2 ~ IG(5,75); full 3-way comparison vs kriging and
the composite GP. The size-50 sample-1 run is the BASELINE.md golden
study (archived output `Results/Size 50 Results 1.txt`)."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ccgp_tpu.eval.datasets import load_ground_vibrations
from ccgp_tpu.experiments.common import run_study, StudyResult
from ccgp_tpu.models import MixtureSpec, MCMCConfig, InverseGamma
from ccgp_tpu.ops import kernels


@dataclass(frozen=True)
class Config:
    size: int = 50
    sample: int = 1
    alpha: float = 0.05
    mle_ard: bool = True
    jitter: float = 0.0
    mcmc: MCMCConfig = MCMCConfig(start=(1.0, 1.0, 0.0), n_max=5000,
                                  samp_size=1000, net_samp_size=1000)


def run(cfg: Config = Config(), key=None, dtype=jnp.float64,
        run_cgp: bool = True) -> StudyResult:
    key = jax.random.PRNGKey(0) if key is None else key
    gv = load_ground_vibrations(cfg.size, cfg.sample)
    x = jnp.asarray(gv["x_train"], dtype)
    y = jnp.asarray(gv["y_train"], dtype)
    x_new = jnp.asarray(gv["x_test"], dtype)
    y_true = gv["y_test"]

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=9)
    return run_study(spec, x, y, x_new, y_true, key, cfg.mcmc,
                     theta1_prior=InverseGamma(3, 1),
                     theta2_prior=InverseGamma(5, 75), alpha=cfg.alpha,
                     mle_ard=cfg.mle_ard, run_cgp=run_cgp,
                     jitter=cfg.jitter, single_variant="mlegp")
