"""Attribute the multi-round kernel's per-round cost: fixed grid-step
overhead vs n-dependent factorization/Gram work.

Times `fused_mix_mh_rounds` (through make_mh_rounds, stash on — the
bench configuration) at several training sizes n on the SAME machine
with the strengthened slope protocol, then prints the per-round cost
table. A large n->0 intercept means the lever is per-grid-step overhead
(e.g. processing 2 rounds per grid step), not the factorization core.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RW = 120
KK = 4


def slope_us_per_round(fn, args, k1=2, k2=22, reps=15):
    import jax

    jax.block_until_ready(fn(*args))

    def run_batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
        return time.perf_counter() - t0

    run_batch(1)
    t1s = [run_batch(k1) for _ in range(reps)]
    t2s = [run_batch(k2) for _ in range(reps)]
    lo = (min(t2s) - min(t1s)) / (k2 - k1) / RW * 1e6
    med = float(np.median([(b - a) / (k2 - k1) / RW * 1e6
                           for a, b in zip(t1s, t2s)]))
    return lo, med


def main():
    import jax

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from ccgp_tpu.eval.datasets import load_maximin_2d
    from ccgp_tpu.models import InverseGamma, LogNormal, MixtureSpec
    from ccgp_tpu.models.likelihood import make_mh_rounds
    from ccgp_tpu.ops import kernels

    assert jax.default_backend() == "tpu", jax.default_backend()

    dtype = jnp.float32
    x_np = load_maximin_2d(100).astype(np.float32)
    a, b = x_np[:, 0], x_np[:, 1]
    y_np = (((a - 0.2) ** 2 - (b - 0.7) ** 2)
            * np.exp(-5 * ((a - 0.8) ** 2 + (b - 0.1) ** 2))
            * np.cos(10 * (a - 0.5) * b)).astype(np.float32)
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    dim = 4

    rng = np.random.default_rng(3)
    deltas = jnp.asarray(0.05 * rng.normal(size=(RW * KK, dim)), dtype)
    log_u = jnp.asarray(np.log(rng.uniform(size=(RW, KK))), dtype)
    z0 = jnp.asarray([0.3, -0.2, 0.1, 0.0], dtype)
    lp_val = jnp.asarray(-40.0, dtype)
    lp_beta = jnp.asarray(0.01, dtype)
    s2 = jnp.asarray(0.004, dtype)

    sizes = [int(s) for s in (sys.argv[1:] or [8, 32, 64, 100])]
    for n in sizes:
        x = jnp.asarray(x_np[:n], dtype)
        y = jnp.asarray(y_np[:n], dtype)
        rounds = make_mh_rounds(spec, x, y, s2,
                                theta1_prior=LogNormal(-1.0, 1.0),
                                theta2_prior=InverseGamma(3, 4),
                                jitter=1e-3, stash=True)
        fj = jax.jit(lambda z, lv, lb, dl, lu, _r=rounds: _r(z, lv, lb,
                                                             dl, lu))
        args = (z0, lp_val, lp_beta, deltas, log_u)
        lo, med = slope_us_per_round(fj, args)
        print(f"n={n:4d}  min {lo:6.2f} / med {med:6.2f} us/round",
              flush=True)


if __name__ == "__main__":
    main()
