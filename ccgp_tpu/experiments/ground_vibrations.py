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
    # True: replace the single-GP baseline's multistart optimum with
    # mlegp's EXACT archived fit (recovered from the shipped results
    # table) so the whole archived row reproduces end-to-end — see
    # `archived_mlegp_fit`. Only the size-50 sample-1 split has an
    # archived table to recover from.
    compat_mlegp: bool = False


# mlegp's exact fitted log-rates for the size-50 sample-1 split, recovered
# to machine precision from the archived `Results/Size 50 Results 1.txt`
# table by least squares (scripts/recover_mlegp_fit.py, final loss
# 2.8e-20): mlegp's loosely-converged optimizer (`Combined GP Ground
# Vibrations.R:655`) stopped here, NOT at the profile-ML optimum our
# `mlegp_fit` multistart finds (which scores BETTER NLL and RMSPE 2.560
# vs the archived 2.687). Reproduces the archived y.hat/LL/UL.single
# columns to 1e-6 (tests/test_kriging_eval.py::
# test_mlegp_archived_table_reproduction).
_MLEGP_GV50_S1_LOG_RATES = (
    -2.561435108508144, -1.5216932002999748, -8.073697106923673,
    0.14044709365967756, -4.549593747305096, -9.977837387620257,
    -3.3272257457333776, -4.646009837747379, 12.706648321321953)


def archived_mlegp_fit(x: jnp.ndarray, y: jnp.ndarray):
    """The reference's exact mlegp fit for the GV size-50 sample-1 split
    as a `KrigingMLE` (GLS mean + sigma^2 MLE at the recovered rates)."""
    from ccgp_tpu.infer.mle import KrigingMLE
    from ccgp_tpu.ops import linalg
    from ccgp_tpu.ops.gp import gls_beta, sigma2_mle

    fam = kernels.sqexp_family()
    theta = jnp.exp(jnp.asarray(_MLEGP_GV50_S1_LOG_RATES, x.dtype))
    chol = linalg.jitter_cholesky(fam.gram(x, theta), 0.0)
    beta = gls_beta(chol, y)
    sigma2 = sigma2_mle(chol, y, beta)
    return KrigingMLE(beta=beta, sigma2=sigma2, theta=theta,
                      nll=jnp.asarray(0.0, x.dtype), chol=chol)


def run(cfg: Config = Config(), key=None, dtype=jnp.float64,
        run_cgp: bool = True) -> StudyResult:
    key = jax.random.PRNGKey(0) if key is None else key
    gv = load_ground_vibrations(cfg.size, cfg.sample)
    x = jnp.asarray(gv["x_train"], dtype)
    y = jnp.asarray(gv["y_train"], dtype)
    x_new = jnp.asarray(gv["x_test"], dtype)
    y_true = gv["y_test"]

    single_fit = None
    if cfg.compat_mlegp:
        if (cfg.size, cfg.sample) != (50, 1):
            raise ValueError(
                "compat_mlegp: only the size-50 sample-1 split has an "
                "archived mlegp table to recover the fit from")
        single_fit = archived_mlegp_fit(x, y)

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=9)
    return run_study(spec, x, y, x_new, y_true, key, cfg.mcmc,
                     theta1_prior=InverseGamma(3, 1),
                     theta2_prior=InverseGamma(5, 75), alpha=cfg.alpha,
                     mle_ard=cfg.mle_ard, run_cgp=run_cgp,
                     jitter=cfg.jitter, single_variant="mlegp",
                     single_fit=single_fit)
