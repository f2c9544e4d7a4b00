"""Smoke tests for the eight reference workflows (small MCMC budgets —
statistical quality is covered by the end-to-end and golden tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccgp_tpu.experiments import (
    sim_1d, sim_1d_two_families, sim_2d_iso, sim_2d_aniso,
    batch_me_design, ground_vibrations, heat_exchanger,
)
from ccgp_tpu.models import MCMCConfig


FAST = MCMCConfig(start=(1.0, 1.0, 0.0), n_max=1200, samp_size=300,
                  net_samp_size=200)
FAST4 = MCMCConfig(start=(1.0, 1.0, 0.0, 0.0), n_max=1200, samp_size=300,
                   net_samp_size=200)
FAST_1D = MCMCConfig(start=(0.0, 1.5, 0.0), n_max=1200, samp_size=300,
                     net_samp_size=200)


def _check(res, rmspe_limit):
    assert np.isfinite(res.summary.rmspe["combined"])
    assert res.summary.rmspe["combined"] < rmspe_limit, res.summary
    assert 0.0 <= res.summary.average_quantile <= 1.0


def test_sim_1d():
    res = sim_1d.run(sim_1d.Config(func=2, mcmc=FAST_1D, n_new=20))
    _check(res, 1.0)  # sin(10x) range [-1,1]


def test_sim_1d_two_families():
    res = sim_1d_two_families.run(
        sim_1d_two_families.Config(func=2, mcmc=FAST_1D, n_new=20))
    _check(res, 1.0)


def test_sim_2d_iso():
    res = sim_2d_iso.run(sim_2d_iso.Config(func=3, mcmc=FAST, n_new_axis=7))
    _check(res, 1.0)


def test_sim_2d_aniso():
    res = sim_2d_aniso.run(sim_2d_aniso.Config(func=3, mcmc=FAST4,
                                               n_new_axis=7))
    _check(res, 1.0)
    # 4-parameter chain: check the tied-lambda posterior exists
    assert res.fit.zs.shape[-1] == 4


def test_batch_me_design_workflow():
    cfg = batch_me_design.Config(mcmc=FAST, n_starts=4, n_new_axis=5)
    res = batch_me_design.run(cfg, refit=False)
    assert res.d_second.shape == (7, 2)
    assert np.isfinite(res.log_entropy)
    assert np.all(np.abs(res.d_second) <= 1.0 + 1e-9)


def test_ground_vibrations_fast():
    cfg = ground_vibrations.Config(mcmc=FAST)
    res = ground_vibrations.run(cfg, run_cgp=False)
    # golden neighborhood (reference archived RMSPE 2.722 at full budget)
    assert res.summary.rmspe["combined"] < 4.0
    assert res.summary.coverage["combined"] > 0.8


def test_heat_exchanger_fast():
    cfg = heat_exchanger.Config(mcmc=MCMCConfig(start=(1.0, 2.7, 0.0),
                                                n_max=1200, samp_size=300,
                                                net_samp_size=200))
    res = heat_exchanger.run(cfg)
    assert res.summary.rmspe["combined"] < 4.0
    assert res.summary.rmspe["combined"] < res.summary.rmspe["single"] * 1.5
