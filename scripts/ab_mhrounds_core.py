"""On-chip A/B of the single-tile factorization core INSIDE the
multi-round Metropolis kernel, at the exact bench shape.

`scripts/verify_rowslab_tpu.py` gates bit-exactness of a candidate core
through `chol_quadratics_smallk`, but its standalone slope timings of
~100 us dispatches are dominated by host-dispatch variance (see
scripts/bench_chol_smallk.py's caveat — negative slopes happen). The
authoritative cost comparison is the multi-round kernel itself: one
`fused_mix_mh_rounds` launch at the bench shape (n=100, K=4, dim=4,
RW=120 warm rounds, stash=True) runs ~1.8 ms of almost-pure kernel, so
the slope between fetch-closed batches resolves a 5% core difference.

For each core this script reports us/round and asserts the FULL output
dict (rec / acc / consumed / stash) is bit-identical to the rank-1
reference core — the same gate `_SINGLE_CORE` promotion requires.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RW = 120   # bench warm-chunk rounds per launch
KK = 4     # speculative candidates per round


def slope_us_per_round(fn, args, k1=2, k2=22, reps=15):
    """Min- and median-composed slope (us/round). Single-digit-rep
    protocols could not separate the cores: back-to-back runs moved every
    core by ~+-1 us/round (axon dispatch jitter), so report both a noise
    floor (min) and a typical value (median of paired slopes)."""
    import jax

    jax.block_until_ready(fn(*args))       # compile

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
    from ccgp_tpu.ops import pallas_chol_smallk as smallk

    assert jax.default_backend() == "tpu", jax.default_backend()

    dtype = jnp.float32
    x_np = load_maximin_2d(100).astype(np.float32)
    a, b = x_np[:, 0], x_np[:, 1]
    y_np = (((a - 0.2) ** 2 - (b - 0.7) ** 2)
            * np.exp(-5 * ((a - 0.8) ** 2 + (b - 0.1) ** 2))
            * np.cos(10 * (a - 0.5) * b)).astype(np.float32)
    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(y_np, dtype)
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

    cores = [("rank1", smallk._chol_quad_core),
             ("rowslab", smallk._chol_quad_core_rowslab),
             ("fused", smallk._chol_quad_core_rowslab_fused),
             ("sym", smallk._chol_quad_core_rowslab_sym),
             ("shrink", smallk._chol_quad_core_shrink),
             ("shrink2", smallk._chol_quad_core_shrink2),
             ("pipe", smallk._chol_quad_core_pipe)]
    only = sys.argv[1:]
    if only:
        keep = set(only) | {"rank1"}       # rank1 is the equality reference
        cores = [c for c in cores if c[0] in keep]

    outs, times = {}, {}
    for name, core in cores:
        smallk._SINGLE_CORE = core
        rounds = make_mh_rounds(spec, x, y, s2,
                                theta1_prior=LogNormal(-1.0, 1.0),
                                theta2_prior=InverseGamma(3, 4),
                                jitter=1e-3, stash=True)

        def f(z, lv, lb, dl, lu, _rounds=rounds):
            out = _rounds(z, lv, lb, dl, lu)
            return out

        fj = jax.jit(f)
        args = (z0, lp_val, lp_beta, deltas, log_u)
        out = jax.block_until_ready(fj(*args))
        outs[name] = {k: np.asarray(v) for k, v in out.items()}
        lo, med = slope_us_per_round(fj, args)
        times[name] = (lo, med)
        print(f"{name:8s}  min {lo:6.2f} / med {med:6.2f} us/round  "
              f"(acc={int(outs[name]['acc'].sum())}, "
              f"consumed={int(outs[name]['consumed'].sum())})")
    smallk._SINGLE_CORE = smallk._chol_quad_core_shrink

    ok = True
    for other in [nm for nm, _ in cores if nm != "rank1"]:
        for k in outs["rank1"]:
            if not np.array_equal(outs["rank1"][k], outs[other][k],
                                  equal_nan=True):
                d = np.abs(outs["rank1"][k] - outs[other][k]).max()
                print(f"MISMATCH {other}.{k}: max|delta| = {d:.3e}")
                ok = False
    print("bit-identical:", ok)
    if not ok:
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
