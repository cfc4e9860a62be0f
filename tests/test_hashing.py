"""Bit-exactness tests for XXH64 entity hashing and FxHash deterministic init.

Reference anchors: twox-hash XXH64 known-answer vectors; rustc-hash 1.1.0
single-write_i64 FxHasher algebra (init_value, /root/reference/src/lib.rs:478-488).
"""

import numpy as np
import pytest

from cleora_tpu.graph import hashing


KNOWN_VECTORS = [
    (b"", 0, 0xEF46DB3751D8E999),
    (b"Nobody inspects the spammish repetition", 0, 0xFBCEA83C8A378BF1),
]


@pytest.mark.parametrize("data,seed,expected", KNOWN_VECTORS)
def test_xxh64_known_vectors(data, seed, expected):
    assert hashing.xxh64(data, seed) == expected


def test_vectorized_matches_scalar_across_lengths():
    strs = [
        "", "a", "ab", "abc", "abcd", "user_12345", "x" * 31, "y" * 32,
        "z" * 33, "m" * 63, "n" * 64, "o" * 100, "ünïcödé-éntity",
        "Nobody inspects the spammish repetition",
    ]
    vec = hashing.hash_entities(strs)
    for s, hv in zip(strs, vec):
        assert int(hv) == hashing.xxh64(s.encode("utf-8"))


def test_hash_entity_matches_vectorized():
    assert hashing.hash_entity("karate_0") == int(hashing.hash_entities(["karate_0"])[0])


def test_fx_hash_single_write():
    # FxHasher with state 0: one write_i64(x) reduces to (x as u64) * K
    x = np.array([0, 1, -1, 12345, -987654321], dtype=np.int64)
    out = hashing.fx_hash_i64(x)
    K = int(hashing.FX_K)
    for xi, oi in zip(x, out):
        assert int(oi) == ((int(xi) & 0xFFFFFFFFFFFFFFFF) * K) % 2**64


def test_init_value_formula():
    """init[i,c] = (fx(xxh(id)+c+seed) as i64 % 2^23) / 2^23 with C-style %."""
    ids = ["alpha", "beta", "gamma"]
    h = hashing.hash_entities(ids)
    emb = hashing.init_embeddings(h, 4, seed=7)
    K = int(hashing.FX_K)
    for i, eid in enumerate(ids):
        base = hashing.xxh64(eid.encode())
        for c in range(4):
            s = (base + c + 7) % 2**64
            mixed = (s * K) % 2**64
            signed = mixed - 2**64 if mixed >= 2**63 else mixed
            rem = int(np.fmod(np.int64(signed), np.int64(2**23)))
            expected = np.float32(rem) / np.float32(2**23)
            assert emb[i, c] == expected


def test_init_range_and_determinism():
    h = hashing.hash_entities([f"e{i}" for i in range(100)])
    a = hashing.init_embeddings(h, 64, 0)
    b = hashing.init_embeddings(h, 64, 0)
    c = hashing.init_embeddings(h, 64, 1)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.all(np.abs(a) < 1.0)
