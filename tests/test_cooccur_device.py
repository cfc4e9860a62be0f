"""Device-side co-occurrence (ops/cooccur.py) parity with the host
sort-reduce, and the fully device-resident walk-pipeline wiring."""

import numpy as np
import pytest

from cleora_tpu import SparseMatrix
from cleora_tpu import algorithms as alg
from cleora_tpu.ops import cooccur


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(11)
    lines = [f"n{rng.integers(0, 150)} n{rng.integers(0, 150)}"
             for _ in range(900)]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")


def _host_counts(graph, num_walks, walk_length, window, seed, batch):
    batches = list(alg._device_walks(graph, num_walks, walk_length, seed,
                                     batch=batch))
    return alg._walk_pair_counts(batches, graph.num_entities, window)


def _device_counts(graph, num_walks, walk_length, window, seed, batch,
                   passes=1):
    n = graph.num_entities
    ranges, _ = cooccur.device_pair_counts(
        lambda: alg._device_walks(graph, num_walks, walk_length, seed,
                                  batch=batch, resident=True),
        n, window, passes=passes,
    )
    keys_parts, cnt_parts = [], []
    for cen, ctx, cnt, m in ranges:
        keys_parts.append(np.asarray(cen[:m], np.int64) * n
                          + np.asarray(ctx[:m], np.int64))
        cnt_parts.append(np.asarray(cnt[:m], np.int64))
    keys = np.concatenate(keys_parts) if keys_parts else np.empty(0, np.int64)
    cnt = np.concatenate(cnt_parts) if cnt_parts else np.empty(0, np.int64)
    order = np.argsort(keys, kind="stable")  # ranges are disjoint hash bins
    return keys[order], cnt[order]


@pytest.mark.parametrize("batch", [1 << 15, 64])
def test_device_counts_integer_exact(graph, batch):
    """Device sort-reduce == host radix sort-reduce, key for key.  The
    small batch forces multiple per-batch reductions, trailing-lane
    padding, and an odd-count tree merge."""
    keys_h, counts_h = _host_counts(graph, 2, 10, 3, seed=9, batch=batch)
    keys_d, counts_d = _device_counts(graph, 2, 10, 3, seed=9, batch=batch)
    assert np.array_equal(keys_h, keys_d)
    assert np.array_equal(counts_h, counts_d)


def test_multipass_walk_cache(graph, monkeypatch):
    """Multi-pass counting iterates the corpus ONCE (single-sweep
    reduce); with the sweep disabled, the legacy per-pass path replays
    cached device walk batches (factory still runs once) unless the
    cache budget is exceeded, in which case every pass regenerates —
    identical counts every way."""
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return alg._device_walks(graph, 2, 10, seed=9, batch=1 << 15,
                                 resident=True)

    ref, refc = _device_counts(graph, 2, 10, 3, seed=9, batch=1 << 15)
    ranges, _ = cooccur.device_pair_counts(factory, graph.num_entities, 3,
                                           passes=3)
    assert calls["n"] == 1  # single sweep
    keys = np.sort(np.concatenate([
        np.asarray(c[:m], np.int64) * graph.num_entities
        + np.asarray(x[:m], np.int64) for c, x, _, m in ranges]))
    assert np.array_equal(np.sort(ref), keys)

    monkeypatch.setenv("CLEORA_COOC_SWEEP", "0")
    calls["n"] = 0
    ranges1, _ = cooccur.device_pair_counts(factory, graph.num_entities, 3,
                                            passes=3)
    assert calls["n"] == 1  # legacy path: cached after pass 0
    keys1 = np.sort(np.concatenate([
        np.asarray(c[:m], np.int64) * graph.num_entities
        + np.asarray(x[:m], np.int64) for c, x, _, m in ranges1]))
    assert np.array_equal(keys, keys1)

    calls["n"] = 0
    monkeypatch.setattr(cooccur, "_WALK_CACHE_BYTES", 16)  # force fallback
    ranges2, _ = cooccur.device_pair_counts(factory, graph.num_entities, 3,
                                            passes=3)
    assert calls["n"] == 3  # regenerated per pass
    keys2 = np.sort(np.concatenate([
        np.asarray(c[:m], np.int64) * graph.num_entities
        + np.asarray(x[:m], np.int64) for c, x, _, m in ranges2]))
    assert np.array_equal(keys, keys2)


def test_device_counts_multipass(graph):
    """Hash-partitioned counting passes (the >HBM unique-set strategy)
    reproduce the single-pass counts exactly — disjoint center bins,
    identical regenerated walks per pass."""
    keys_1, counts_1 = _device_counts(graph, 2, 10, 3, seed=9, batch=1 << 15)
    for passes in (2, 5):
        keys_p, counts_p = _device_counts(graph, 2, 10, 3, seed=9,
                                          batch=1 << 15, passes=passes)
        assert np.array_equal(keys_1, keys_p), passes
        assert np.array_equal(counts_1, counts_p), passes


def test_device_counts_second_order(graph):
    """Same contract through the p/q-biased walk engine."""
    n = graph.num_entities
    batches_h = list(alg._device_walks2(graph, 1, 8, 0.5, 2.0, seed=4))
    keys_h, counts_h = alg._walk_pair_counts(batches_h, n, 4)
    ranges, m = cooccur.device_pair_counts(
        lambda: alg._device_walks2(graph, 1, 8, 0.5, 2.0, seed=4,
                                   resident=True),
        n, 4,
    )
    (cen, ctx, cnt, m), = ranges
    keys_d = np.asarray(cen[:m], np.int64) * n + np.asarray(ctx[:m], np.int64)
    assert np.array_equal(keys_h, keys_d)
    assert np.array_equal(counts_h, np.asarray(cnt[:m], np.int64))


def test_ppmi_coo_matches_host_pmi(graph):
    """Device PPMI values match the host formula on the same counts; the
    padding tail is (n-1, 0, 0.0) and rows stay nondecreasing (the sorted
    flat-COO contract of spmm_inner)."""
    n = graph.num_entities
    ranges, _ = cooccur.device_pair_counts(
        lambda: alg._device_walks(graph, 2, 10, seed=9, resident=True),
        n, 3,
    )
    (cen, ctx, cnt, m), = ranges
    rows, cols, vals = cooccur.ppmi_coo(cen, ctx, cnt, n)
    rows, cols, vals = map(np.asarray, (rows, cols, vals))
    # host reference on the fetched counts
    c = np.asarray(cen[:m], np.int64)
    x = np.asarray(ctx[:m], np.int64)
    w = np.asarray(cnt[:m], np.float64)
    rs = np.zeros(n)
    cs = np.zeros(n)
    np.add.at(rs, c, w)
    np.add.at(cs, x, w)
    exp = np.maximum(np.log(w * w.sum() / (rs[c] * cs[x])), 0.0)
    np.testing.assert_allclose(vals[:m], exp, rtol=2e-5, atol=2e-5)
    assert np.array_equal(rows[:m], c) and np.array_equal(cols[:m], x)
    assert (rows[m:] == n - 1).all() and (vals[m:] == 0).all()
    assert (np.diff(rows.astype(np.int64)) >= 0).all()


def test_embed_deepwalk_device_cooccurrence(graph):
    """cooccurrence='device' reproduces the host-counted device
    factorization geometry (different sketch RNG -> Gram comparison)."""
    kw = dict(feature_dim=8, num_walks=4, walk_length=16, window_size=4,
              seed=3, backend="device")
    ref = alg.embed_deepwalk(graph, factorization="device", **kw)
    dev = alg.embed_deepwalk(graph, cooccurrence="device", **kw)
    assert dev.shape == ref.shape
    assert np.isfinite(dev).all()
    assert np.allclose(ref @ ref.T, dev @ dev.T, atol=5e-2), (
        np.abs(ref @ ref.T - dev @ dev.T).max()
    )


def test_embed_node2vec_device_cooccurrence(graph):
    e = alg.embed_node2vec(graph, feature_dim=8, num_walks=1, walk_length=8,
                           p=0.5, q=2.0, backend="device",
                           cooccurrence="device")
    assert e.shape == (graph.num_entities, 8)
    assert np.isfinite(e).all()


def test_cooccurrence_validation(graph):
    with pytest.raises(ValueError, match="cooccurrence"):
        alg.embed_deepwalk(graph, feature_dim=8, backend="host",
                           cooccurrence="device")
    with pytest.raises(ValueError, match="cooccurrence"):
        alg.embed_node2vec(graph, feature_dim=8, backend="device",
                           cooccurrence="bogus")
    # an explicit host factorization contradicts device counting (which
    # always factorizes on device) — loud error, not silent override
    with pytest.raises(ValueError, match="factorization"):
        alg.embed_deepwalk(graph, feature_dim=8, backend="device",
                           cooccurrence="device", factorization="host")
    with pytest.raises(ValueError, match="factorization"):
        alg.embed_deepwalk(graph, feature_dim=8, backend="device",
                           cooccurrence="device", factorization="bogus")


def test_sharded_walks_nonpow2_mesh_trailing_chunk(graph):
    """A trailing short chunk pads to the batch size, which itself may
    not divide a non-power-of-two mesh — the pad must round up to a
    mesh-size multiple (review finding)."""
    from cleora_tpu.parallel.mesh import make_mesh

    single = np.concatenate(
        list(alg._device_walks(graph, 2, 8, seed=5, batch=99)), axis=0)
    sharded = np.concatenate(
        list(alg._device_walks(graph, 2, 8, seed=5, batch=99,
                               mesh=make_mesh(2))), axis=0)
    assert np.array_equal(single, sharded)


def test_multipass_ppmi_embedding_matches_single_pass(graph, monkeypatch):
    """Forcing multi-pass counting through the public API yields the SAME
    embedding as single-pass: identical counts (proven above) + the
    multi-range PPMI/rsvd layout vs one range, same sketch seed."""
    kw = dict(feature_dim=8, num_walks=2, walk_length=12, window_size=3,
              seed=7, backend="device", cooccurrence="device")
    single = alg.embed_deepwalk(graph, **kw)
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 100_000)  # force ~many
    multi = alg.embed_deepwalk(graph, **kw)
    np.testing.assert_allclose(single, multi, rtol=2e-4, atol=2e-4)


def test_mesh_walks_with_device_cooccurrence(graph):
    """Sharded walk lanes compose with device counting: identical walks
    (bitwise, proven in test_parallel_algorithms) through the same
    sort-reduce give the same embedding."""
    kw = dict(feature_dim=8, num_walks=2, walk_length=10, seed=3,
              backend="device", cooccurrence="device")
    a = alg.embed_deepwalk(graph, **kw)
    b = alg.embed_deepwalk(graph, n_devices=4, **kw)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_sort_reduce_random_oracle():
    """_sort_reduce vs a numpy oracle on random key streams, including
    sentinel entries, all-sentinel, and single-key degenerate inputs."""
    import jax

    rng = np.random.default_rng(7)
    fn = jax.jit(cooccur._sort_reduce)
    cases = [
        (rng.integers(0, 50, 4096), rng.integers(0, 50, 4096)),
        (np.full(512, 3), np.full(512, 9)),            # one key
        (np.full(256, cooccur._SENT), np.full(256, cooccur._SENT)),
        (np.concatenate([rng.integers(0, 9, 1000),
                         np.full(24, cooccur._SENT)]),
         np.concatenate([rng.integers(0, 9, 1000),
                         np.full(24, cooccur._SENT)])),
    ]
    for cen, ctx in cases:
        cen = cen.astype(np.int32)
        ctx = ctx.astype(np.int32)
        cnt = np.ones(cen.shape[0], np.int32)
        ucen, uctx, ucnt, m = map(np.asarray, fn(cen, ctx, cnt))
        valid = cen != cooccur._SENT
        keys = cen[valid].astype(np.int64) * (1 << 32) + ctx[valid]
        exp_keys, exp_cnt = np.unique(keys, return_counts=True)
        m = int(m)
        assert m == exp_keys.shape[0]
        got = ucen[:m].astype(np.int64) * (1 << 32) + uctx[:m]
        assert np.array_equal(got, exp_keys)
        assert np.array_equal(ucnt[:m], exp_cnt)
        # tail slots must be inert: sentinel keys or zero counts
        assert ((ucen[m:] == cooccur._SENT) | (ucnt[m:] == 0)).all()


def test_chunk_aligned_host_edges():
    """Every output length is chunk-compatible (≤ chunk or an exact
    multiple) — including the exact-multiple and bucket-crossing inputs
    that defeated earlier alignment logic (review finding)."""
    from cleora_tpu.algorithms import _chunk_aligned_host

    chunk = 1 << 20
    for length in (100, chunk - 5, chunk, chunk + 1, 2 * chunk,
                   2 * chunk + 7, int(chunk * 0.95)):
        rows = np.sort(np.random.default_rng(1).integers(
            0, 1000, length)).astype(np.int32)
        cols = np.zeros(length, np.int32)
        vals = np.ones(length, np.float32)
        pr, pc, pv = _chunk_aligned_host(rows, cols, vals, 1000, chunk)
        out = pr.shape[0]
        assert out >= length
        assert out <= chunk or out % chunk == 0, (length, out)
        assert pc.shape[0] == out and pv.shape[0] == out
        # padding must be inert for the sorted segment-sum
        assert (pv[length:] == 0).all()
        assert (pr[length:] == 999).all()
        assert (np.diff(pr.astype(np.int64)) >= 0).all()


def test_count_overflow_check():
    """A wrapped (negative) int32 count raises the descriptive overflow
    error; healthy counts pass."""
    import jax.numpy as jnp

    good = [(jnp.array([1, 2], jnp.int32), jnp.array([3, 4], jnp.int32),
             jnp.array([5, 6], jnp.int32), 2)]
    cooccur._check_count_overflow(good, 10)  # no raise
    bad = [(jnp.array([1, 2], jnp.int32), jnp.array([3, 4], jnp.int32),
            jnp.array([5, -2147483000], jnp.int32), 2)]
    with pytest.raises(ValueError, match="overflow"):
        cooccur._check_count_overflow(bad, 10)


def test_device_counts_empty():
    ranges, m = cooccur.device_pair_counts(lambda: iter(()), 10, 3)
    assert m == 0 and ranges == []


def _ranges_payload(ranges, n):
    return [
        (np.asarray(c[:m], np.int64) * n + np.asarray(x[:m], np.int64),
         np.asarray(k[:m], np.int64))
        for c, x, k, m in ranges
    ]


@pytest.mark.parametrize("ndev,passes", [(4, 5), (2, 2), (8, 3)])
def test_pass_parallel_counts_bit_identical(graph, ndev, passes,
                                            monkeypatch):
    """Pass-parallel counting (one hash partition per device, threaded —
    ROADMAP design (a), the multi-device path when the sweep reduce is
    unavailable) returns the SAME ranges as the sequential path: same
    pass order, same keys, same counts, same compaction."""
    import jax

    monkeypatch.setenv("CLEORA_COOC_SWEEP", "0")
    n = graph.num_entities
    factory = lambda: alg._device_walks(graph, 2, 10, seed=9, batch=1 << 13,
                                        resident=True)
    seq, m_seq = cooccur.device_pair_counts(factory, n, 3, passes=passes)
    par, m_par = cooccur.device_pair_counts(
        factory, n, 3, passes=passes, devices=jax.devices()[:ndev])
    assert m_seq == m_par
    assert len(seq) == len(par) == passes
    for (ks, cs), (kp, cp) in zip(_ranges_payload(seq, n),
                                  _ranges_payload(par, n)):
        assert np.array_equal(ks, kp)
        assert np.array_equal(cs, cp)
    # every returned range lives on ONE device (the factorization home)
    homes = {d for _, _, k, _ in par for d in k.devices()}
    assert len(homes) == 1


def test_pass_parallel_cache_budget_fallback(graph, monkeypatch):
    """A corpus past the walk-cache budget cannot be broadcast per device;
    counting must fall back to the sequential regenerating path (factory
    re-runs once per pass) with identical results."""
    import jax

    monkeypatch.setenv("CLEORA_COOC_SWEEP", "0")
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return alg._device_walks(graph, 2, 10, seed=9, batch=1 << 13,
                                 resident=True)

    n = graph.num_entities
    ref, _ = cooccur.device_pair_counts(factory, n, 3, passes=3)
    calls["n"] = 0
    monkeypatch.setattr(cooccur, "_WALK_CACHE_BYTES", 16)
    par, _ = cooccur.device_pair_counts(factory, n, 3, passes=3,
                                        devices=jax.devices()[:4])
    # one aborted broadcast probe + one regenerating sweep per pass
    assert calls["n"] == 4
    for (ks, cs), (kp, cp) in zip(_ranges_payload(ref, n),
                                  _ranges_payload(par, n)):
        assert np.array_equal(ks, kp)
        assert np.array_equal(cs, cp)


def test_mesh_pass_parallel_embedding(graph, monkeypatch):
    """Through the public API: a multi-device mesh + forced multi-pass
    counting fans passes across devices and yields the same embedding as
    the single-device run (same counts, same sketch seed)."""
    kw = dict(feature_dim=8, num_walks=2, walk_length=12, window_size=3,
              seed=7, backend="device", cooccurrence="device")
    single = alg.embed_deepwalk(graph, **kw)
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 100_000)
    multi = alg.embed_deepwalk(graph, n_devices=4, **kw)
    np.testing.assert_allclose(single, multi, rtol=2e-4, atol=2e-4)
    # hierarchical ("host", "chip") meshes fan out the same way — the
    # walk lanes shard over the axis tuple, the counting passes over
    # mesh.devices.flat
    from cleora_tpu.parallel.mesh import make_hier_mesh

    hier = alg.embed_deepwalk(graph, mesh=make_hier_mesh(2, 4), **kw)
    np.testing.assert_allclose(single, hier, rtol=2e-4, atol=2e-4)


def test_compacted_reduce_bit_identical(graph, monkeypatch):
    """CLEORA_COOC_COMPACT=1: the partition-compacted multi-pass reduce
    is key-for-key identical to the full-sort path AND the host radix
    path (the compaction is an order-preserving filter — the sort sees
    the same multiset).  _reduce_jit is poisoned, so the test also
    proves the fast path actually engaged (no silent fallback)."""
    ref_k, ref_c = _device_counts(graph, 2, 10, 3, seed=9, batch=1 << 15,
                                  passes=4)
    keys_h, counts_h = _host_counts(graph, 2, 10, 3, seed=9, batch=1 << 15)
    monkeypatch.setenv("CLEORA_COOC_COMPACT", "1")
    monkeypatch.setenv("CLEORA_COOC_SWEEP", "0")  # pin the per-pass path

    def _poisoned():
        raise AssertionError("full-sort reduce must not run")

    monkeypatch.setattr(cooccur, "_reduce_jit", _poisoned)
    got_k, got_c = _device_counts(graph, 2, 10, 3, seed=9, batch=1 << 15,
                                  passes=4)
    assert np.array_equal(ref_k, got_k)
    assert np.array_equal(ref_c, got_c)
    assert np.array_equal(keys_h, got_k)
    assert np.array_equal(counts_h, got_c)


def test_compacted_reduce_overflow_fallback(graph, monkeypatch):
    """A pathologically small bucket overflows on every batch: the
    dispatcher must detect live > bucket and rerun the exact full-sort
    reduce — counts unchanged."""
    ref_k, ref_c = _device_counts(graph, 2, 10, 3, seed=9, batch=1 << 15,
                                  passes=2)
    monkeypatch.setenv("CLEORA_COOC_COMPACT", "1")
    monkeypatch.setenv("CLEORA_COOC_SWEEP", "0")  # pin the per-pass path
    monkeypatch.setattr(cooccur, "_compact_bucket_for",
                        lambda shape, window, passes: 2048)
    got_k, got_c = _device_counts(graph, 2, 10, 3, seed=9, batch=1 << 15,
                                  passes=2)
    assert np.array_equal(ref_k, got_k)
    assert np.array_equal(ref_c, got_c)


def test_compact_bucket_gate(monkeypatch):
    """The compacted path stays off by default, off for single-pass
    counting, and declines when the bucket wouldn't shrink the sort."""
    monkeypatch.delenv("CLEORA_COOC_COMPACT", raising=False)
    assert cooccur._compact_bucket_for((1000, 10), 3, 4) is None  # gate off
    monkeypatch.setenv("CLEORA_COOC_COMPACT", "1")
    assert cooccur._compact_bucket_for((1000, 10), 3, 1) is None  # 1 pass
    b = cooccur._compact_bucket_for((1000, 10), 3, 4)
    lanes = 2 * 1000 * (3 * 10 - 6)
    assert b is not None and b < lanes
    # tiny batches: the pow2 floor exceeds the lane count -> decline
    assert cooccur._compact_bucket_for((8, 10), 3, 4) is None


def test_sweep_reduce_bit_identical(graph, monkeypatch):
    """The default multi-pass path is the single-sweep all-partitions
    reduce: range-for-range identical (keys, counts, per-range order,
    compaction buckets) to the legacy per-pass reduce and the host radix
    path.  Both per-pass reduce variants are poisoned, so the test also
    proves the sweep actually engaged."""
    monkeypatch.setenv("CLEORA_COOC_SWEEP", "0")
    factory = lambda: alg._device_walks(graph, 2, 10, seed=9,
                                        batch=1 << 13, resident=True)
    n = graph.num_entities
    ref, m_ref = cooccur.device_pair_counts(factory, n, 3, passes=4)
    keys_h, counts_h = _host_counts(graph, 2, 10, 3, seed=9, batch=1 << 13)

    monkeypatch.delenv("CLEORA_COOC_SWEEP", raising=False)

    def _poisoned():
        raise AssertionError("per-pass reduce must not run")

    monkeypatch.setattr(cooccur, "_reduce_jit", _poisoned)
    monkeypatch.setattr(cooccur, "_reduce_compact_jit", _poisoned)
    got, m_got = cooccur.device_pair_counts(factory, n, 3, passes=4)
    assert m_ref == m_got and len(ref) == len(got) == 4
    for (kr, cr), (kg, cg) in zip(_ranges_payload(ref, n),
                                  _ranges_payload(got, n)):
        assert np.array_equal(kr, kg)
        assert np.array_equal(cr, cg)
    for r, g in zip(ref, got):
        assert r[0].shape == g[0].shape  # same compaction buckets
    keys_d, counts_d = _device_counts(graph, 2, 10, 3, seed=9,
                                      batch=1 << 13, passes=4)
    assert np.array_equal(keys_h, keys_d)
    assert np.array_equal(counts_h, counts_d)


def test_sweep_gate(monkeypatch):
    """The sweep engages only for multi-pass counting with an
    int32-packable (partition, center) key; CLEORA_COOC_SWEEP=0
    restores the per-pass path."""
    monkeypatch.delenv("CLEORA_COOC_SWEEP", raising=False)
    assert cooccur._sweep_ok(1000, 4)
    assert not cooccur._sweep_ok(1000, 1)          # single pass
    assert not cooccur._sweep_ok(2**28, 8)         # packed key overflows
    assert cooccur._sweep_ok(2**27, 8)
    monkeypatch.setenv("CLEORA_COOC_SWEEP", "0")
    assert not cooccur._sweep_ok(1000, 4)          # explicit opt-out


@pytest.mark.parametrize("ndev,passes", [(4, 5), (2, 2), (8, 3)])
def test_batch_parallel_counts_bit_identical(graph, ndev, passes,
                                             monkeypatch):
    """Batch-parallel sweep counting (corpus dealt round-robin across
    devices, one sweep per device, per-partition home merges — the
    default multi-device path) returns the SAME ranges as the sequential
    path.  The per-pass reduce is poisoned, proving the sweep engaged on
    every device."""
    import jax

    n = graph.num_entities
    factory = lambda: alg._device_walks(graph, 2, 10, seed=9, batch=64,
                                        resident=True)
    nb = sum(1 for _ in factory())
    assert nb >= 2  # multi-batch corpus, or the split never engages
    seq, m_seq = cooccur.device_pair_counts(factory, n, 3, passes=passes)

    def _poisoned():
        raise AssertionError("per-pass reduce must not run")

    monkeypatch.setattr(cooccur, "_reduce_jit", _poisoned)
    monkeypatch.setattr(cooccur, "_reduce_compact_jit", _poisoned)
    par, m_par = cooccur.device_pair_counts(
        factory, n, 3, passes=passes, devices=jax.devices()[:ndev])
    assert m_seq == m_par
    assert len(seq) == len(par) == passes
    for (ks, cs), (kp, cp) in zip(_ranges_payload(seq, n),
                                  _ranges_payload(par, n)):
        assert np.array_equal(ks, kp)
        assert np.array_equal(cs, cp)
    for r, g in zip(seq, par):
        assert r[0].shape == g[0].shape  # same compaction buckets
    # gather_home: every returned range lives on ONE device
    homes = {d for _, _, k, _ in par for d in k.devices()}
    assert len(homes) == 1
    # gather_home=False leaves partition s on its home device s % P
    # (P = devices actually used = min(requested, corpus batches))
    spread, _ = cooccur.device_pair_counts(
        factory, n, 3, passes=passes, devices=jax.devices()[:ndev],
        gather_home=False)
    devs = jax.devices()[:min(ndev, nb)]
    for s, (_, _, k, _) in enumerate(spread):
        assert k.devices() == {devs[s % len(devs)]}


def test_batch_parallel_single_batch_falls_to_sequential(graph):
    """A single-batch corpus cannot split by batch: the multi-device
    entry must fall through to the sequential sweep (one factory run)
    with identical ranges."""
    import jax

    n = graph.num_entities
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return alg._device_walks(graph, 2, 10, seed=9, batch=1 << 15,
                                 resident=True)

    seq, m_seq = cooccur.device_pair_counts(factory, n, 3, passes=3)
    calls["n"] = 0
    par, m_par = cooccur.device_pair_counts(
        factory, n, 3, passes=3, devices=jax.devices()[:4])
    assert calls["n"] == 2  # one aborted split probe + one sweep
    assert m_seq == m_par
    for (ks, cs), (kp, cp) in zip(_ranges_payload(seq, n),
                                  _ranges_payload(par, n)):
        assert np.array_equal(ks, kp)
        assert np.array_equal(cs, cp)


def test_batch_parallel_checkpoint_resume(graph, tmp_path):
    """Batch-parallel counting persists per-partition checkpoints that a
    resumed multi-device run loads without touching the corpus, with the
    pass-parallel device placement (pass s on device s % P)."""
    import jax

    n = graph.num_entities
    factory_calls = {"n": 0}

    def factory():
        factory_calls["n"] += 1
        return alg._device_walks(graph, 2, 10, seed=9, batch=64,
                                 resident=True)

    devs = jax.devices()[:4]
    ck = cooccur.CountCheckpoint(str(tmp_path), "fp-bp")
    ref, m_ref = cooccur.device_pair_counts(factory, n, 3, passes=4,
                                            devices=devs, checkpoint=ck,
                                            gather_home=False)
    assert factory_calls["n"] == 1
    ck2 = cooccur.CountCheckpoint(str(tmp_path), "fp-bp")
    got, m_got = cooccur.device_pair_counts(factory, n, 3, passes=4,
                                            devices=devs, checkpoint=ck2,
                                            gather_home=False)
    assert factory_calls["n"] == 1  # resumed purely from disk
    assert m_ref == m_got
    for s, ((kr, cr), (kg, cg)) in enumerate(
            zip(_ranges_payload(ref, n), _ranges_payload(got, n))):
        assert np.array_equal(kr, kg)
        assert np.array_equal(cr, cg)
        assert got[s][2].devices() == {devs[s % len(devs)]}


def test_sweep_checkpoint_roundtrip(graph, tmp_path, monkeypatch):
    """Sweep-computed partitions persist through CountCheckpoint exactly
    like per-pass ones: a resumed run loads every pass without touching
    the walk corpus and returns identical ranges."""
    factory_calls = {"n": 0}

    def factory():
        factory_calls["n"] += 1
        return alg._device_walks(graph, 2, 10, seed=9, batch=1 << 13,
                                 resident=True)

    n = graph.num_entities
    ck = cooccur.CountCheckpoint(str(tmp_path), "fp-sweep")
    ref, m_ref = cooccur.device_pair_counts(factory, n, 3, passes=3,
                                            checkpoint=ck)
    assert factory_calls["n"] == 1
    ck2 = cooccur.CountCheckpoint(str(tmp_path), "fp-sweep")
    got, m_got = cooccur.device_pair_counts(factory, n, 3, passes=3,
                                            checkpoint=ck2)
    assert factory_calls["n"] == 1  # resumed purely from disk
    assert m_ref == m_got
    for (kr, cr), (kg, cg) in zip(_ranges_payload(ref, n),
                                  _ranges_payload(got, n)):
        assert np.array_equal(kr, kg)
        assert np.array_equal(cr, cg)
