"""The complete ground-vibrations loop (reference `Ground Vibrations
Emulator/Combined GP Ground Vibrations.R:707-762`): all size-50 samples,
full 3-way comparison, one R-format results table per sample. Appends an
aggregate block to RESULTS.md.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ccgp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from ccgp_tpu.eval.datasets import load_ground_vibrations
from ccgp_tpu.eval.results import write_comparison_table
from ccgp_tpu.experiments import ground_vibrations
from ccgp_tpu.models import MCMCConfig
from ccgp_tpu.utils.progress import progress

SAMPLES = range(1, 10)
GV_XNAMES = ["slope", "angle", "top.layer3", "bot.layer3", "vs2", "vs3",
             "vs4", "density", "freq"]


def main():
    t0 = time.time()
    rows = []
    for i in progress(list(SAMPLES), label="GV samples "):
        cfg = ground_vibrations.Config(
            sample=i, mcmc=MCMCConfig(start=(1.0, 1.0, 0.0), n_max=5000,
                                      samp_size=1000, net_samp_size=1000))
        res = ground_vibrations.run(cfg, key=jax.random.PRNGKey(100 + i))
        gv = load_ground_vibrations(50, i)
        write_comparison_table(ROOT / "results" / f"GV Size 50 Results {i}.txt",
                               gv["x_test"], GV_XNAMES, res.predictions,
                               gv["y_test"])
        s = res.summary
        rows.append((i, s.rmspe, s.coverage, s.average_quantile))

    def agg(getter, model):
        return np.array([getter(r)[model] for r in rows])

    lines = ["", "## Ground vibrations: all 9 size-50 samples "
             "(full budgets, 3-way comparison)", ""]
    for model in ["combined", "single", "cgp"]:
        rm = np.array([r[1][model] for r in rows])
        cv = np.array([r[2][model] for r in rows])
        lines.append(f"- {model}: RMSPE mean {rm.mean():.3f} "
                     f"(range [{rm.min():.3f}, {rm.max():.3f}]), "
                     f"coverage mean {cv.mean():.3f}")
    q = np.array([r[3] for r in rows])
    lines.append(f"- calibration quantile mean {q.mean():.3f} (ideal 0.5)")
    lines.append(f"- per-sample tables in results/; wall-clock "
                 f"{time.time()-t0:.0f}s")
    lines.append("")
    lines.append("| sample | combined | single | cgp |")
    lines.append("|---|---|---|---|")
    for i, rm, cv, _ in rows:
        lines.append(f"| {i} | {rm['combined']:.3f} | {rm['single']:.3f} | "
                     f"{rm['cgp']:.3f} |")
    with open(ROOT / "RESULTS.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
