"""Pallas threefry key-split chain: the chunked Metropolis driver's
per-round RNG keys in one kernel launch.

The chunked driver (`infer/metropolis.py`) consumes one
`jax.random.split(key, 3)` per Metropolis round — a SEQUENTIAL chain of
threefry-2x32 applications (each round's key is a child of the previous
round's). Unrolled in XLA the 120-split warm-chunk chain lowers to ~120
small non-fused fusions at ~2-4 us dispatch each (~250-450 us per chunk,
measured — scripts/probe_split_chain.py), which is most of the remaining
non-kernel time of the full-Bayes fit. Here the identical chain runs as
ONE Pallas kernel: ~76 uint32 vector ops per split, statically unrolled
in blocks of B splits per sequential-grid step with the carry key in a
VMEM scratch row.

Bit-exactness is by construction — threefry is pure uint32 ARX, so the
kernel either reproduces `jax.random.split` EXACTLY (integer equality,
asserted in tests/test_pallas_rng.py on every backend and on-chip by
scripts/verify_split_chain_tpu.py) or differs visibly. The chain this
feeds is the bench's pinned PRNGKey(7) stream (CLAUDE.md): any deviation
changes n_recorded/n_proposals, which bench.py prints and guards.

Semantics replicated (jax._src.prng, jax 0.9, threefry_partitionable):
  split(key, 3) = threefry_2x32((k0, k1), x0=[0,0,0], x1=[0,1,2]);
  child i = (bits1[i], bits2[i]); the driver's carry is child 0,
  (k1, k2) of round r are children 1 and 2.
`split_chain_supported` gates on exactly that configuration (raw uint32
(2,) threefry keys, jax_threefry_partitionable=True) and falls back is
left to the caller otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ROT = ((13, 15, 26, 6), (17, 29, 16, 24))
# key-schedule injections after each 4-round group: (ks index for x0,
# ks index for x1, round-group counter added to x1)
_INJ = ((1, 2, 1), (2, 0, 2), (0, 1, 3), (1, 2, 4), (2, 0, 5))
_PARITY = 0x1BD11BDA
_LANES = 128


def split_chain_supported(key) -> bool:
    """True when `threefry_split_chain` reproduces a
    scan of jax.random.split(key, 3) bit-for-bit: raw uint32 (2,)
    threefry keys under the partitionable (foldlike) split — the split
    layout the kernel hard-codes."""
    return (getattr(key, "dtype", None) == jnp.uint32
            and getattr(key, "shape", None) == (2,)
            and bool(jax.config.jax_threefry_partitionable))


def _threefry_rounds(x0, x1, ks0, ks1, ks2):
    """The 20 threefry-2x32 rounds + key schedule on uint32 rows
    (elementwise; mirrors jax._src.prng._threefry2x32_lowering)."""
    ks = (ks0, ks1, ks2)
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for g, (a, b, c) in enumerate(_INJ):
        for r in _ROT[g % 2]:
            x0 = x0 + x1
            x1 = ((x1 << r) | (x1 >> (32 - r))) ^ x0
        x0 = x0 + ks[a]
        x1 = x1 + ks[b] + jnp.uint32(c)
    return x0, x1


def _make_split_chain_kernel(nb: int):
    """Sequential-grid kernel body: nb splits per grid step, carry key in
    VMEM scratch (lane 0 = k0, lane 1 = k1 of a broadcast row pair)."""
    from jax.experimental import pallas as pl

    def _kernel(key_ref, out_ref, carry_ref):
        step = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANES), 2)

        def lane0_u32(v):
            # Mosaic has no unsigned reductions: reduce the bit pattern
            # as int32 (exact — a single nonzero term) and bitcast back
            vi = jax.lax.bitcast_convert_type(v, jnp.int32)
            s = jnp.sum(jnp.where(lane == 0, vi, 0), axis=2,
                        keepdims=True, dtype=jnp.int32)
            return jax.lax.bitcast_convert_type(s, jnp.uint32)

        @pl.when(step == 0)
        def _init():
            carry_ref[...] = key_ref[...]

        kr = carry_ref[...]                       # (1, 2, LANES)
        # k0/k1 live in lane 0 of rows 0/1 (broadcast rows after step 0,
        # but only lane 0 is trusted): extract via masked integer reduce
        # (lane slices of computed rows hit Mosaic's offset-layout
        # broadcast rejection; reduce-produced scalars broadcast fine)
        k0 = lane0_u32(kr[:, 0:1, :])
        k1 = lane0_u32(kr[:, 1:2, :])
        counts2 = lane.astype(jnp.uint32)         # x1 counts [0,1,2,...]

        rows = []
        for _ in range(nb):
            ks2 = k0 ^ k1 ^ jnp.uint32(_PARITY)
            x0 = jnp.zeros((1, 1, _LANES), jnp.uint32)   # counts1 = 0
            x1 = counts2                                 # counts2 = iota
            b1, b2 = _threefry_rounds(x0, x1, k0, k1, ks2)
            rows.append(b1)
            rows.append(b2)
            # carry = child 0 = (b1[lane 0], b2[lane 0])
            k0 = lane0_u32(b1)
            k1 = lane0_u32(b2)

        carry_ref[...] = jnp.concatenate(
            [jnp.broadcast_to(k0, (1, 1, _LANES)),
             jnp.broadcast_to(k1, (1, 1, _LANES))], axis=1)
        out_ref[...] = jnp.concatenate(rows, axis=1)   # (1, 2*nb, LANES)

    return _kernel


@functools.partial(jax.jit, static_argnums=(1, 2))
def threefry_split_chain(key: jnp.ndarray, rr: int,
                         interpret: bool = False):
    """rr sequential `key, k1, k2 = jax.random.split(key, 3)` steps as one
    Pallas launch.

    key: raw uint32 (2,) threefry key (see `split_chain_supported`).
    Returns (new_key (2,), k1s (rr, 2), k2s (rr, 2)) — bit-identical to
    the scan the chunked Metropolis driver otherwise runs
    (tests/test_pallas_rng.py asserts integer equality vs jax.random).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if key.shape != (2,) or key.dtype != jnp.uint32:
        raise ValueError("threefry_split_chain needs a raw uint32 (2,) key")
    rr = int(rr)
    if rr < 1:
        raise ValueError("rr must be >= 1")
    # block size: whole chain in one step for short chains, 20-split
    # steps (the driver's check-chunk size; 1520-op bodies) otherwise
    nb = rr if rr <= 24 else 20
    grid = -(-rr // nb)

    key_row = jnp.zeros((1, 2, _LANES), jnp.uint32).at[0, :, 0].set(key)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        _make_split_chain_kernel(nb),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 2, _LANES), lambda r: (0, 0, 0))],
        out_shape=jax.ShapeDtypeStruct((grid, 2 * nb, _LANES), jnp.uint32),
        out_specs=pl.BlockSpec((1, 2 * nb, _LANES), lambda r: (r, 0, 0)),
        scratch_shapes=[pltpu.VMEM((1, 2, _LANES), jnp.uint32)],
        interpret=interpret,
        **kwargs,
    )(key_row)

    bits = out.reshape(grid * nb, 2, _LANES)[:rr]    # (rr, [b1|b2], lanes)
    k1s = bits[:, :, 1]                              # child 1 = (b1[1], b2[1])
    k2s = bits[:, :, 2]                              # child 2 = (b1[2], b2[2])
    new_key = bits[rr - 1, :, 0]                     # child 0 of last round
    return new_key, k1s, k2s
