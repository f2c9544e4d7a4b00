"""Microbench: decompose the MC-aggregation stage of posterior_predict.

The full-Bayes bench's "full - moments" delta is ~3 ms (DESIGN.md §13
attribution); this script splits it on-chip at the bench shape
(m=1000 retained draws, t=625 grid points) into

  eps        threefry normal draws (m, t)
  pp+means   pp = dm + sd*eps, masked mean + Quant statistic
  topk_pair  the shipped dual lax.top_k tail selection (k=27 each side)
  sort_pair  one full sort (the pre-round-3 path, for scale)
  approx     lax.approx_max_k-based tail selection (TPU PartialReduce);
             kept ONLY if element-equal to top_k — approx_max_k's
             recall<1 default is NOT exact, so exactness is asserted,
             not assumed.

Each timed via the fetch-closed slope protocol (DESIGN.md §4). Run on
the chip after the persistent cache is warm; results belong in
DESIGN.md's predict-tail attribution note.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def slope(fn, args, k1=1, k2=8, reps=5):
    import jax

    jax.block_until_ready(fn(*args))

    def run_batch(k):
        o = None
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    run_batch(1)
    t1 = min(run_batch(k1) for _ in range(reps))
    t2 = min(run_batch(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from ccgp_tpu.utils import stats

    m, t = 1000, 625
    rng = np.random.default_rng(0)
    dm = jnp.asarray(rng.normal(size=(m, t)), jnp.float32)
    dv = jnp.asarray(np.abs(rng.normal(size=(m, t))) + 0.01, jnp.float32)
    key = jax.random.PRNGKey(3)
    rows = []

    def rec(name, ms, extra=None):
        row = {"stage": name, "ms": round(float(ms), 3)}
        if extra:
            row.update(extra)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- eps generation -------------------------------------------------
    eps_j = jax.jit(lambda k: jax.random.normal(k, (m, t), jnp.float32))
    rec("eps_threefry", slope(eps_j, (key,)))
    krbg = jax.random.key(3, impl="rbg")
    rec("eps_rbg", slope(eps_j, (krbg,)))

    # --- pp + masked means + quant ---------------------------------------
    def pp_means(dm, dv, k):
        valid = dv >= 0.0
        sd = jnp.sqrt(jnp.maximum(dv, 0.0))
        pp = dm + sd * jax.random.normal(k, dm.shape, dm.dtype)
        mu0 = stats.masked_mean(dm.T, valid.T)
        quant = stats.masked_mean((mu0[None, :] <= pp).T.astype(pp.dtype),
                                  valid.T)
        return pp, mu0, quant

    rec("pp_means_quant", slope(jax.jit(pp_means), (dm, dv, key)))

    pp, _, _ = jax.jit(pp_means)(dm, dv, key)
    valid = jnp.ones((t, m), bool)
    ppT = pp.T

    # --- shipped dual top_k ----------------------------------------------
    pair_j = jax.jit(lambda x, v: stats.masked_quantile_pair(
        x, v, 0.025, 0.975))
    rec("topk_pair", slope(pair_j, (ppT, valid)))
    lo0, hi0 = pair_j(ppT, valid)

    # --- full-sort path (for scale) ---------------------------------------
    def sort_pair(x, v):
        big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
        mm = jnp.sum(v, axis=-1)
        xs = jnp.sort(jnp.where(v, x, big), axis=-1)

        def interp(q):
            h = (mm.astype(x.dtype) - 1.0) * q
            lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, m - 1)
            hi = jnp.minimum(jnp.clip(lo + 1, 0, m - 1),
                             jnp.maximum(mm - 1, 0))
            frac = h - lo.astype(x.dtype)
            xlo = jnp.take_along_axis(xs, lo[..., None], -1)
            xhi = jnp.take_along_axis(xs, hi[..., None], -1)
            return (xlo + frac[..., None] * (xhi - xlo)).squeeze(-1)

        return interp(0.025), interp(0.975)

    sj = jax.jit(sort_pair)
    rec("sort_pair", slope(sj, (ppT, valid)))

    # --- approx_max_k tail selection --------------------------------------
    import math

    k_tail = int(math.ceil((m - 1) * 0.025)) + 2

    def approx_pair(x, v):
        big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
        bot = -jax.lax.approx_max_k(jnp.where(v, -x, -big), k_tail,
                                    recall_target=0.999,
                                    aggregate_to_topk=True)[0]
        top = jax.lax.approx_max_k(jnp.where(v, x, -big), k_tail,
                                   recall_target=0.999,
                                   aggregate_to_topk=True)[0]
        return bot, top

    aj = jax.jit(approx_pair)
    ms_a = slope(aj, (ppT, valid))
    bot_a, top_a = aj(ppT, valid)
    bot_e = -jax.lax.top_k(-ppT, k_tail)[0]
    top_e = jax.lax.top_k(ppT, k_tail)[0]
    exact = bool(jnp.all(bot_a == bot_e)) and bool(jnp.all(top_a == top_e))
    rec("approx_tails", ms_a, {"element_equal_to_topk": exact})

    print(json.dumps({"backend": jax.default_backend(), "rows": rows}))


if __name__ == "__main__":
    main()
