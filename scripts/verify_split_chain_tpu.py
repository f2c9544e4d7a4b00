"""On-chip validation of the Pallas threefry split chain.

1. EXACT integer equality of (new_key, k1s, k2s) vs the XLA scan of
   jax.random.split(key, 3), for the driver's chunk sizes (20, 120) and
   several keys — threefry is pure uint32 ARX, so Mosaic either matches
   bit-for-bit or fails loudly.
2. Slope timing kernel vs scan at both sizes (the XLA chain measured
   ~60-450 us/chunk — scripts/probe_split_chain.py).

Run on the TPU (default backend under axon).
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


def main():
    import jax

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from ccgp_tpu.ops.pallas_rng import (split_chain_supported,
                                         threefry_split_chain)

    assert jax.default_backend() == "tpu", jax.default_backend()

    def rng_step(k, _):
        k, k1, k2 = jax.random.split(k, 3)
        return k, (k1, k2)

    def scan_chain(rr):
        def f(key):
            key, (k1s, k2s) = jax.lax.scan(rng_step, key, None, length=rr,
                                           unroll=True)
            return key, k1s, k2s
        return jax.jit(f)

    ok = True
    for rr in (20, 120):
        for seed in (0, 7, 424242):
            key = jax.random.PRNGKey(seed)
            assert split_chain_supported(key)
            rk, rk1, rk2 = jax.block_until_ready(scan_chain(rr)(key))
            nk, k1s, k2s = jax.block_until_ready(
                threefry_split_chain(key, rr))
            eq = (np.array_equal(np.asarray(rk), np.asarray(nk))
                  and np.array_equal(np.asarray(rk1), np.asarray(k1s))
                  and np.array_equal(np.asarray(rk2), np.asarray(k2s)))
            print(f"rr={rr:4d} seed={seed:7d} exact-equal: {eq}")
            ok &= eq

    if not ok:
        print("FAIL: on-chip mismatch")
        sys.exit(1)

    key = jax.random.PRNGKey(7)
    for rr in (20, 120):
        t_scan = slope(scan_chain(rr), (key,))
        t_kern = slope(lambda k: threefry_split_chain(k, rr), (key,))
        print(f"rr={rr:4d}  scan: {t_scan:8.1f} us   kernel: {t_kern:8.1f} us"
              f"   speedup {t_scan / t_kern:.1f}x")
    print("OK")


if __name__ == "__main__":
    main()
