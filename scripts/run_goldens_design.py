"""Design-module goldens: two-families study, initial-ME regeneration vs
the shipped design, and the k-medoids batch workflow over posterior draws.
Appends to RESULTS.md.
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

from ccgp_tpu.design import me_design, me_criterion, batch_me_design, kmedoids
from ccgp_tpu.eval.datasets import load_initial_me_design, load_design_txt
from ccgp_tpu.experiments import sim_1d_two_families, batch_me_design as bmd
from ccgp_tpu.models import MixtureSpec, MixParams, MCMCConfig
from ccgp_tpu.ops import kernels

FAST = "--fast" in sys.argv
lines = ["", "## Design-module goldens", ""]
t0 = time.time()

# --- two-families 1-D study ----------------------------------------------
cfg = sim_1d_two_families.Config(
    func=1, mcmc=MCMCConfig(start=(0.0, 1.5, 0.0),
                            n_max=1500 if FAST else 10000,
                            samp_size=400 if FAST else 5000,
                            net_samp_size=300 if FAST else 2500))
res = sim_1d_two_families.run(cfg, key=jax.random.PRNGKey(0))
s = res.summary
lines.append(
    f"- **1D two families (Matern+spline), function 1**: RMSPE "
    + " / ".join(f"{k} {v:.3f}" for k, v in s.rmspe.items())
    + " | coverage " + " / ".join(f"{k} {v:.3f}" for k, v in s.coverage.items())
    + f" | quant {s.average_quantile:.3f}")
print(f"[{time.time()-t0:6.1f}s]", lines[-1], flush=True)

# --- initial ME design regeneration --------------------------------------
spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
prior = MixParams(p=jnp.asarray(0.5), theta1=jnp.asarray(1.0),
                  theta2=jnp.asarray(4.0))
d_ref = jnp.asarray(load_initial_me_design())
ref_logdet = float(-me_criterion(spec, d_ref, prior, criterion="logdet"))
reg = me_design(spec, prior, 14, 2, jax.random.PRNGKey(1),
                n_starts=8 if FAST else 25)
lines.append(
    f"- **Initial ME design regeneration** (p=.5, th1=1, th2=4, 25-start "
    f"logdet search): ours logdet {float(reg.log_entropy):.4f} vs shipped "
    f"design's {ref_logdet:.4f} (higher = better)")
print(f"[{time.time()-t0:6.1f}s]", lines[-1], flush=True)

# --- k-medoids batch workflow --------------------------------------------
n_draws = 6 if FAST else 24
cfg = bmd.Config(mcmc=MCMCConfig(start=(1.0, 1.0, 0.0),
                                 n_max=1500 if FAST else 5000,
                                 samp_size=400 if FAST else 1000,
                                 net_samp_size=300 if FAST else 1000),
                 n_starts=4 if FAST else 25, kmedoids_draws=n_draws)
out = bmd.run(cfg, key=jax.random.PRNGKey(2), refit=not FAST)
from scipy.spatial.distance import cdist

ref_km = load_design_txt("k-medoids ME Design", header=True)[-7:]
d_km = out.d_second_kmedoids
match = cdist(d_km, ref_km).min(axis=0).max()
lines.append(
    f"- **k-medoids batch variant** ({n_draws} per-draw subdesigns -> "
    f"7 medoids): max distance to the shipped k-medoids design {match:.3f} "
    f"(shipped design was built from 1000 draws)")
print(f"[{time.time()-t0:6.1f}s]", lines[-1], flush=True)
if out.study is not None:
    s = out.study.summary
    lines.append(
        f"- **21-pt refit after plug-in second batch**: RMSPE "
        + " / ".join(f"{k} {v:.3f}" for k, v in s.rmspe.items())
        + f" | quant {s.average_quantile:.3f}")
    print(f"[{time.time()-t0:6.1f}s]", lines[-1], flush=True)

with open(ROOT / "RESULTS.md", "a") as fh:
    fh.write("\n".join(lines) + "\n")
print("appended to RESULTS.md")
