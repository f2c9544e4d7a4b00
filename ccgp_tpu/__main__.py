"""CLI: run a reference case study by name.

    python -m ccgp_tpu <experiment> [--fast] [--seed N] [--cpu] [--f64]

Experiments: sim_1d, sim_1d_two_families, sim_2d_iso, sim_2d_iso_advanced,
sim_2d_aniso, batch_me_design, heat_exchanger, ground_vibrations.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m ccgp_tpu",
                                 description=__doc__)
    ap.add_argument("experiment", choices=[
        "sim_1d", "sim_1d_two_families", "sim_2d_iso",
        "sim_2d_iso_advanced", "sim_2d_aniso", "batch_me_design",
        "heat_exchanger", "ground_vibrations"])
    ap.add_argument("--fast", action="store_true",
                    help="small MCMC budget (smoke-test scale)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--f64", action="store_true",
                    help="enable float64 (CPU only; TPU degrades f64)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from ccgp_tpu import experiments as ex
    from ccgp_tpu.models import MCMCConfig

    mod = getattr(ex, args.experiment)
    cfg = mod.Config()
    if args.fast:
        base = cfg.mcmc
        cfg = type(cfg)(**{**cfg.__dict__, "mcmc": MCMCConfig(
            start=base.start, n_max=1200, samp_size=300, net_samp_size=200,
            batch_size=base.batch_size, alpha_geweke=base.alpha_geweke,
            record=base.record)})
    key = jax.random.PRNGKey(args.seed)
    dtype = jnp.float64 if args.f64 else jnp.float32
    out = mod.run(cfg, key=key, dtype=dtype)

    if hasattr(out, "summary") and out.summary is not None:
        s = out.summary
        print("RMSPE:     ",
              " | ".join(f"{k} {v:.4f}" for k, v in s.rmspe.items()))
        if s.coverage:
            print("coverage:  ",
                  " | ".join(f"{k} {v:.3f}" for k, v in s.coverage.items()))
        if s.average_quantile is not None:
            print(f"calibration quantile: {s.average_quantile:.3f} "
                  "(ideal 0.5)")
    if hasattr(out, "d_second"):
        print("second-batch design:")
        import numpy as np
        print(np.round(np.asarray(out.d_second), 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
