"""On-chip gate for the rowslab single-tile core (`_chol_quad_core_rowslab`).

Interpret-mode equality alone does NOT rule out a Mosaic miscompile (the
list-of-slabs core was bit-identical in interpret mode and silently NaNed
on hardware), so before `_SINGLE_CORE` may flip to the rowslab
formulation this script must pass on the chip:

1. EXACT equality of {logdet, qyy, qoy, qoo} between the rank-1 and
   rowslab cores through `chol_quadratics_smallk`, at n = 7 / 100 (one
   tile) and n = 200 (multitile recursion base case), K = 4. Both cores
   compute every value with identical arithmetic (the slab pivot-row
   extraction sums the same single nonzero term), so on-chip outputs must
   match bit-for-bit or the formulation is miscompiled.
2. Slope timing of both cores at the bench shape (n=100, K=4).

Run on the TPU (default backend under axon). Timing is only meaningful
with an idle host (1 core — no concurrent pytest lanes).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def slope(fn, args, k1=4, k2=32, reps=5):
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
    t1 = min(run_batch(k1) for _ in range(reps))
    t2 = min(run_batch(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1) * 1e6


def make_grams(n, k, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(k, n, n)).astype(np.float32)
    g = a @ np.transpose(a, (0, 2, 1)) / n + 2.0 * np.eye(n, dtype=np.float32)
    # enforce BIT-symmetry (the Cholesky cores' input contract; BLAS sgemm
    # does not guarantee g[i,j] == g[j,i] to the last bit, while the
    # library's real Grams — in-kernel SE mixtures and the MXU rank-1
    # distance expansion — are exactly symmetric by construction)
    tril = np.tril(g)
    g = tril + np.transpose(np.tril(g, -1), (0, 2, 1))
    y = rng.normal(size=(n,)).astype(np.float32)
    return g, y


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from ccgp_tpu.ops import pallas_chol_smallk as smallk

    assert jax.default_backend() == "tpu", jax.default_backend()

    ok = True
    for n in (7, 100, 200):
        g, y = make_grams(n, 4, seed=n)
        outs = {}
        for name, core in (("rank1", smallk._chol_quad_core),
                           ("rowslab", smallk._chol_quad_core_rowslab),
                           ("fused", smallk._chol_quad_core_rowslab_fused),
                           ("sym", smallk._chol_quad_core_rowslab_sym),
                           ("shrink", smallk._chol_quad_core_shrink),
                           ("pipe", smallk._chol_quad_core_pipe)):
            smallk._SINGLE_CORE = core
            q = smallk.chol_quadratics_smallk(jnp.asarray(g), jnp.asarray(y),
                                              jitter=1e-6)
            outs[name] = {kk: np.asarray(v) for kk, v in q.items()}
        smallk._SINGLE_CORE = smallk._chol_quad_core_shrink
        for other in ("rowslab", "fused", "sym", "shrink", "pipe"):
            eq = all(np.array_equal(outs["rank1"][kk], outs[other][kk])
                     for kk in outs["rank1"])
            finite = all(np.isfinite(v).all() for v in outs[other].values())
            print(f"n={n:4d} {other:8s} exact-equal: {eq}  finite: {finite}")
            if not eq:
                for kk in outs["rank1"]:
                    d = np.abs(outs["rank1"][kk] - outs[other][kk]).max()
                    print(f"    {kk}: max|delta| = {d:.3e}")
            ok &= eq and finite

    if not ok:
        print("FAIL: on-chip mismatch — _SINGLE_CORE must stay on rank1")
        sys.exit(1)

    n = 100
    g, y = make_grams(n, 4, seed=1)
    gj, yj = jnp.asarray(g), jnp.asarray(y)
    for name, core in (("rank1", smallk._chol_quad_core),
                       ("rowslab", smallk._chol_quad_core_rowslab),
                       ("fused", smallk._chol_quad_core_rowslab_fused),
                       ("sym", smallk._chol_quad_core_rowslab_sym),
                       ("shrink", smallk._chol_quad_core_shrink),
                       ("pipe", smallk._chol_quad_core_pipe)):
        smallk._SINGLE_CORE = core

        def f(gg, yy):
            q = smallk.chol_quadratics_smallk(gg, yy, jitter=1e-6)
            return q["logdet"]

        fj = jax.jit(f)
        t = slope(fj, (gj, yj))
        print(f"{name:8s} n=100 K=4: {t:8.1f} us/eval")
    smallk._SINGLE_CORE = smallk._chol_quad_core_shrink
    print("OK")


if __name__ == "__main__":
    main()
