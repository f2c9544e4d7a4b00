"""CPU-f64 oracle adjudication of the multi-tile factor stash.

`verify_multitile_stash_tpu.py` compares the sampler's stashed factors
against a classic f32 rebuild of the same retained draws; its a-vector
drift (a = L^{-1}y - beta L^{-1}1, a DIFFERENCE, so relative error
amplifies) sits at ~1e-3 — but neither f32 path is truth.  This stage
loads the TPU dump (/tmp/stash_gate.npz), recomputes the factors in
f64 on CPU through the same public code path (`predict.factors.
build_factors` under x64), and reports each f32 path's distance from
the oracle.  The stash passes if it is no further from f64 truth than
the classic rebuild (x1.5 slack for luck of rounding).

Run as a child of verify_multitile_stash_tpu.py (or standalone after a
dump exists).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PATH = "/tmp/stash_gate.npz"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ccgp_tpu.models import MixtureSpec
    from ccgp_tpu.ops import kernels
    from ccgp_tpu.predict.factors import build_factors

    d = np.load(PATH)
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=int(d["dim"]), rough="tied", anisotropic=True)
    x = jnp.asarray(d["x"], jnp.float64)
    y = jnp.asarray(d["y"], jnp.float64)
    zs = jnp.asarray(d["zs"], jnp.float64)
    betas = jnp.asarray(d["betas"], jnp.float64)
    oracle = build_factors(spec, x, y, zs, betas,
                           jitter=float(d["jitter"]))

    def err(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b))) / max(
            float(np.max(np.abs(b))), 1e-12)

    ok = True
    for name in ("chol", "a", "u"):
        e_stash = err(d[f"stash_{name}"], getattr(oracle, name))
        e_rebuild = err(d[f"rebuild_{name}"], getattr(oracle, name))
        verdict = e_stash <= 1.5 * e_rebuild + 1e-7
        ok &= verdict
        print(f"{name}: stash-vs-f64 {e_stash:.2e}  "
              f"rebuild-vs-f64 {e_rebuild:.2e}  "
              f"{'OK' if verdict else 'WORSE'}")
    if not ok:
        sys.exit(1)
    print("oracle: stash is at least as accurate as the classic rebuild")


if __name__ == "__main__":
    main()
