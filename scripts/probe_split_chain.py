"""Probe: cost of the per-chunk sequential threefry key-split chain.

The chunked Metropolis driver consumes one jax.random.split(key, 3) per
round; a warm chunk unrolls 120 of them (infer/metropolis.py rng_step).
This times that chain ALONE on the current backend with the slope
protocol, for chunk sizes 20 and 120, plus the batched normal/uniform
generation that follows it — quantifying exactly how much of the
~160-250 us/chunk loop overhead is the serial split chain.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def slope(fn, args, k1=4, k2=32, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    leaves = jax.tree_util.tree_leaves(out)

    def run_batch(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    run_batch(1)
    t1 = min(run_batch(k1) for _ in range(reps))
    t2 = min(run_batch(k2) for _ in range(reps))
    del leaves
    return (t2 - t1) / (k2 - k1) * 1e6  # us per call


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    K, dim = 4, 4

    def rng_step(k, _):
        k, k1, k2 = jax.random.split(k, 3)
        return k, (k1, k2)

    def make_chain(rr, with_gen):
        def f(key):
            key, (k1s, k2s) = jax.lax.scan(rng_step, key, None,
                                           length=rr, unroll=True)
            if not with_gen:
                return key, k1s[0]
            eps = jax.vmap(
                lambda k1: jax.random.normal(k1, (K, dim), jnp.float32))(k1s)
            log_u = jax.vmap(lambda k2: jnp.log(
                jax.random.uniform(k2, (K,), dtype=jnp.float32)))(k2s)
            return key, eps.sum() + log_u.sum()
        return jax.jit(f)

    key = jax.random.PRNGKey(7)
    print(f"backend={jax.default_backend()}")
    for rr in (20, 120):
        t_chain = slope(make_chain(rr, False), (key,))
        t_full = slope(make_chain(rr, True), (key,))
        print(f"rr={rr:4d}  split-chain only: {t_chain:8.1f} us/call"
              f"   chain+normal+uniform: {t_full:8.1f} us/call")


if __name__ == "__main__":
    main()
