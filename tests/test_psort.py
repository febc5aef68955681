"""Pallas bitonic sort: bit-equality vs numpy/lax.sort oracles.

On the CPU test backend the kernel runs in Pallas interpreter mode
(exact same network); on a TPU backend the compiled kernel runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gappadder_tpu.ops import psort


def _oracle(ops, num_keys, stable=False):
    res = jax.lax.sort(tuple(jnp.asarray(o) for o in ops),
                       dimension=ops[0].ndim - 1, num_keys=num_keys,
                       is_stable=True)
    return [np.asarray(r) for r in res]


def _run(ops, num_keys, stable=False):
    if jax.default_backend() == "tpu":
        res = psort.bitonic_sort(tuple(jnp.asarray(o) for o in ops),
                                 num_keys=num_keys, stable=stable)
    else:
        res = psort.bitonic_sort(tuple(jnp.asarray(o) for o in ops),
                                 num_keys=num_keys, stable=stable,
                                 interpret=True)
    return [np.asarray(r) for r in res]


@pytest.mark.parametrize("B,N,nl", [(3, 2048, 1), (2, 2048, 2),
                                    (1, 4096, 4), (4, 257, 2)])
def test_keys_match_oracle(B, N, nl):
    rng = np.random.default_rng(B * 1000 + N + nl)
    # few distinct values force duplicate keys (exercises tie handling)
    ops = [rng.integers(0, 50, (B, N)).astype(np.uint32)
           for _ in range(nl)]
    got = _run(ops, num_keys=nl)
    want = _oracle(ops, num_keys=nl)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_payload_follows_keys_stable():
    rng = np.random.default_rng(7)
    B, N = 2, 2048
    keys = rng.integers(0, 100, (B, N)).astype(np.uint32)
    pay = np.tile(np.arange(N, dtype=np.int32), (B, 1))
    got = _run([keys, pay], num_keys=1, stable=True)
    want = _oracle([keys, pay], num_keys=1)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])   # stable order


def test_signed_int32_keys():
    rng = np.random.default_rng(9)
    B, N = 2, 2048
    keys = rng.integers(-1000, 1000, (B, N)).astype(np.int32)
    pay = np.tile(np.arange(N, dtype=np.int32), (B, 1))
    got = _run([keys, pay], num_keys=1, stable=True)
    want = _oracle([keys, pay], num_keys=1)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_unsorted_payload_uint32_roundtrip():
    rng = np.random.default_rng(3)
    B, N = 2, 2048
    k1 = rng.integers(0, 1 << 32, (B, N), dtype=np.uint32)
    k2 = rng.integers(0, 1 << 32, (B, N), dtype=np.uint32)
    pay = rng.integers(0, 1 << 32, (B, N), dtype=np.uint32)
    got = _run([k1, k2, pay], num_keys=2)
    want = _oracle([k1, k2, pay], num_keys=2)
    for g, w in zip(got[:2], want[:2]):
        np.testing.assert_array_equal(g, w)
    # payload multiset must survive exactly
    np.testing.assert_array_equal(np.sort(got[2], axis=1),
                                  np.sort(np.asarray(want[2]), axis=1))


def test_vmap_composes():
    """dbg's sorts run under jax.vmap — the kernel must batch."""
    rng = np.random.default_rng(4)
    G, N = 3, 2048
    keys = rng.integers(0, 1 << 20, (G, N)).astype(np.uint32)

    def one(k):
        return psort.bitonic_sort(
            (k,), num_keys=1,
            interpret=jax.default_backend() != "tpu")[0]

    got = np.asarray(jax.vmap(one)(jnp.asarray(keys)))
    np.testing.assert_array_equal(got, np.sort(keys, axis=1))


def test_fallback_small_n():
    """Below the Pallas threshold the wrapper must defer to lax.sort."""
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 100, (4, 64)).astype(np.uint32)
    got = psort.bitonic_sort((jnp.asarray(keys),), num_keys=1)
    np.testing.assert_array_equal(np.asarray(got[0]),
                                  np.sort(keys, axis=1))
