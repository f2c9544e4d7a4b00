"""Bit-exactness of the Pallas threefry split chain (ops/pallas_rng.py).

The kernel must reproduce `key, k1, k2 = jax.random.split(key, 3)`
scanned rr times EXACTLY (integer equality) — it feeds the chunked
Metropolis driver's pinned RNG stream, where any deviation changes the
recorded chain. Interpret mode on CPU here; on-chip equality is checked
by scripts/verify_split_chain_tpu.py and, end-to-end, by bench.py's
pinned n_recorded/n_proposals.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccgp_tpu.ops.pallas_rng import (split_chain_supported,
                                     threefry_split_chain)


def scan_reference(key, rr):
    def step(k, _):
        k, k1, k2 = jax.random.split(k, 3)
        return k, (k1, k2)

    key, (k1s, k2s) = jax.lax.scan(step, key, None, length=rr)
    return key, k1s, k2s


@pytest.mark.parametrize("rr", [1, 7, 20, 24, 25, 120])
@pytest.mark.parametrize("seed", [0, 7, 123456789])
def test_split_chain_matches_jax_random(rr, seed):
    key = jax.random.PRNGKey(seed)
    assert split_chain_supported(key)
    ref_key, ref_k1s, ref_k2s = scan_reference(key, rr)
    new_key, k1s, k2s = threefry_split_chain(key, rr, interpret=True)
    np.testing.assert_array_equal(np.asarray(k1s), np.asarray(ref_k1s))
    np.testing.assert_array_equal(np.asarray(k2s), np.asarray(ref_k2s))
    np.testing.assert_array_equal(np.asarray(new_key), np.asarray(ref_key))


def test_split_chain_chains_across_calls():
    """Feeding the carry back reproduces one long chain — the driver's
    usage across consecutive chunks."""
    key = jax.random.PRNGKey(42)
    ref_key, ref_k1s, ref_k2s = scan_reference(key, 40)
    k = key
    got_k1s, got_k2s = [], []
    for _ in range(2):
        k, k1s, k2s = threefry_split_chain(k, 20, interpret=True)
        got_k1s.append(np.asarray(k1s))
        got_k2s.append(np.asarray(k2s))
    np.testing.assert_array_equal(np.concatenate(got_k1s),
                                  np.asarray(ref_k1s))
    np.testing.assert_array_equal(np.concatenate(got_k2s),
                                  np.asarray(ref_k2s))
    np.testing.assert_array_equal(np.asarray(k), np.asarray(ref_key))


def test_split_chain_keys_generate_identical_samples():
    """The derived keys drive jax.random.normal/uniform to identical
    floats — the exact consumption pattern of the Metropolis chunk."""
    key = jax.random.PRNGKey(7)
    _, ref_k1s, ref_k2s = scan_reference(key, 20)
    _, k1s, k2s = threefry_split_chain(key, 20, interpret=True)
    gen_eps = jax.vmap(lambda k: jax.random.normal(k, (4, 4), jnp.float32))
    gen_u = jax.vmap(lambda k: jax.random.uniform(k, (4,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(gen_eps(k1s)),
                                  np.asarray(gen_eps(ref_k1s)))
    np.testing.assert_array_equal(np.asarray(gen_u(k2s)),
                                  np.asarray(gen_u(ref_k2s)))


def test_split_chain_supported_gates():
    assert split_chain_supported(jax.random.PRNGKey(0))
    # rbg keys are raw (4,) uint32 — a different stream, must be rejected
    assert not split_chain_supported(jnp.zeros((4,), jnp.uint32))
    assert not split_chain_supported(jnp.zeros((2,), jnp.float32))


def test_split_chain_rejects_bad_inputs():
    with pytest.raises(ValueError):
        threefry_split_chain(jnp.zeros((4,), jnp.uint32), 5, interpret=True)
    with pytest.raises(ValueError):
        threefry_split_chain(jax.random.PRNGKey(0), 0, interpret=True)
