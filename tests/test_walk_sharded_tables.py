"""Mesh-sharded walk tables (VERDICT r4 #5): the first-order walk
engine with the CSR row-partitioned across devices — owner-routed hops,
value-identical walks, and the fit-check fallback chain
replicated → sharded → actionable error."""

import numpy as np
import pytest

import cleora_tpu as ct
from cleora_tpu import algorithms as alg
from cleora_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(11)
    lines = [f"n{rng.integers(0, 150)} n{rng.integers(0, 150)}"
             for _ in range(900)]
    return ct.SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")


@pytest.mark.parametrize("nd", [2, 4, 8])
def test_sharded_tables_value_identical(graph, nd):
    """Same PRNG stream, one owner per valid row, psum of disjoint
    contributions ⇒ bitwise-identical walks to the replicated engine,
    on any mesh size (incl. one that doesn't divide n)."""
    mesh = make_mesh(nd)
    rep = np.concatenate(list(alg._device_walks(
        graph, 2, 12, seed=5, batch=200, mesh=mesh)))
    shd = np.concatenate(list(alg._device_walks(
        graph, 2, 12, seed=5, batch=200, mesh=mesh,
        walk_tables="sharded")))
    np.testing.assert_array_equal(rep, shd)


def test_sharded_tables_hier_mesh(graph):
    """The ("host", "chip") mesh shards the tables over the flattened
    axis tuple the same way."""
    from cleora_tpu.parallel.mesh import make_hier_mesh

    hier = make_hier_mesh(2, 4)
    rep = np.concatenate(list(alg._device_walks(
        graph, 1, 10, seed=3, batch=512, mesh=hier)))
    shd = np.concatenate(list(alg._device_walks(
        graph, 1, 10, seed=3, batch=512, mesh=hier,
        walk_tables="sharded")))
    np.testing.assert_array_equal(rep, shd)


def test_sharded_tables_embedding_identical(graph):
    kw = dict(feature_dim=8, num_walks=2, walk_length=12, window_size=3,
              seed=7, backend="device", cooccurrence="device")
    a = alg.embed_deepwalk(graph, n_devices=4, **kw)
    b = alg.embed_deepwalk(graph, n_devices=4, walk_tables="sharded", **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shard_walk_tables_layout(graph):
    """Per-shard indptr is local to the shard's cols slice and the
    row cut is the ceil(n/P) block partition."""
    mesh = make_mesh(4)
    indptr, cols, deg, n = alg._walk_csr(graph)
    ip_sh, cols_sh, deg_sh, rps = alg._shard_walk_tables(
        indptr, cols, deg, n, mesh)
    assert rps == -(-n // 4)
    ip_sh, cols_sh, deg_sh = map(np.asarray, (ip_sh, cols_sh, deg_sh))
    for k in range(4):
        lo, hi = k * rps, min((k + 1) * rps, n)
        if hi <= lo:
            continue
        np.testing.assert_array_equal(deg_sh[k, : hi - lo], deg[lo:hi])
        base = int(indptr[lo])
        np.testing.assert_array_equal(
            ip_sh[k, : hi - lo], indptr[lo:hi].astype(np.int64) - base)
        cnt = int(deg[lo:hi].astype(np.int64).sum())
        np.testing.assert_array_equal(cols_sh[k, :cnt],
                                      cols[base:base + cnt])


def test_auto_chain_fit_checks(monkeypatch):
    """'auto' resolves replicated → sharded → error as the simulated
    HBM budget shrinks (sizes chosen so the CSR, not the batch buffers,
    dominates — the regime sharded tables exist for)."""
    from cleora_tpu.ops import memory

    n, nnz = 1_000_000, 500_000_000  # ~2 GB replicated table
    mesh = make_mesh(8)
    # plenty of room: replicated
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: 16 << 30)
    assert alg._walk_table_mode("auto", mesh, n, nnz, False) == "replicated"
    # 1 GiB: the full table misses, the /8 shard fits
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: 1 << 30)
    assert alg._walk_table_mode("auto", mesh, n, nnz, False) == "sharded"
    with pytest.raises(ValueError, match="backend='host'"):
        alg._walk_table_mode("auto", None, n, nnz, False)
    # below even the sharded footprint: actionable error
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: 100 << 20)
    with pytest.raises(ValueError, match="backend='host'"):
        alg._walk_table_mode("auto", mesh, n, nnz, False)
    # second-order shards too (round 5): its table is ~2× (adds vals +
    # wmax/wsum), so it needs ~2 GiB replicated but /8 fits in 1 GiB
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: 1 << 30)
    assert alg._walk_table_mode("auto", mesh, n, nnz, True) == "sharded"
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: 100 << 20)
    with pytest.raises(ValueError, match="backend='host'"):
        alg._walk_table_mode("auto", mesh, n, nnz, True)


def test_sharded_tables_validation(graph):
    with pytest.raises(ValueError, match="mesh"):
        alg.embed_deepwalk(graph, feature_dim=8, backend="device",
                           walk_tables="sharded")
    with pytest.raises(ValueError, match="walk_tables"):
        alg.embed_deepwalk(graph, feature_dim=8, backend="device",
                           walk_tables="bogus")


# ------------------------------------- second-order sharded tables
@pytest.mark.parametrize("p,q", [(0.5, 2.0), (1.0, 0.7), (4.0, 1.0)])
def test_second_order_sharded_bitwise(graph, p, q):
    """Owner-routed rejection sampling (cur's owner proposes, prev's
    owner answers the common-neighbor test, psums combine) with the
    replicated engine's key splits: BITWISE-identical walks below the
    replicated engine's compaction threshold."""
    mesh = make_mesh(4)
    rep = np.concatenate(list(alg._device_walks2(
        graph, 1, 10, p, q, seed=5, batch=512, mesh=mesh)))
    shd = np.concatenate(list(alg._device_walks2(
        graph, 1, 10, p, q, seed=5, batch=512, mesh=mesh,
        walk_tables="sharded")))
    np.testing.assert_array_equal(rep, shd)


def test_second_order_sharded_embedding(graph):
    """Through the public API: small batches stay under the compaction
    threshold, so the full pipeline output is identical too."""
    kw = dict(feature_dim=8, num_walks=1, walk_length=8, window_size=3,
              p=0.5, q=2.0, seed=4, backend="device",
              cooccurrence="device", n_devices=4)
    a = alg.embed_node2vec(graph, **kw)
    b = alg.embed_node2vec(graph, walk_tables="sharded", **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_second_order_sharded_tables_cached(graph):
    mesh = make_mesh(4)
    graph._device_cache.pop(
        ("walk_tables2_sharded", tuple(d.id for d in mesh.devices.flat)),
        None,
    )
    calls = {"n": 0}
    orig = alg._shard_walk_tables2

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    alg._shard_walk_tables2 = spy
    try:
        for _ in range(2):
            list(alg._device_walks2(graph, 1, 6, 0.5, 2.0, seed=1,
                                    mesh=mesh, walk_tables="sharded"))
    finally:
        alg._shard_walk_tables2 = orig
    assert calls["n"] == 1


def test_sharded_tables_cached_per_graph(graph):
    """Repeated walk sweeps (multi-pass counting) reuse the packed
    device tables instead of re-packing the CSR."""
    mesh = make_mesh(4)
    graph._device_cache.pop(
        ("walk_tables_sharded", tuple(d.id for d in mesh.devices.flat)),
        None,
    )
    calls = {"n": 0}
    orig = alg._shard_walk_tables

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    alg._shard_walk_tables = spy
    try:
        for _ in range(3):
            list(alg._device_walks(graph, 1, 8, seed=1, mesh=mesh,
                                   walk_tables="sharded"))
    finally:
        alg._shard_walk_tables = orig
    assert calls["n"] == 1


def test_replicated_ranges_factorize(graph):
    """Sharded-table walks + SEQUENTIAL counting produce mesh-REPLICATED
    count ranges (the sorts run SPMD over the replicated batches); the
    factorization-placement logic must home them, not crash — for both
    the default and the forced-sharded factorization (caught by a
    script smoke in round 5)."""
    kw = dict(feature_dim=8, num_walks=2, walk_length=10, window_size=3,
              seed=3, backend="device", cooccurrence="device")
    ref = alg.embed_deepwalk(graph, **kw)
    a = alg.embed_deepwalk(graph, n_devices=4, walk_tables="sharded", **kw)
    b = alg.embed_deepwalk(graph, n_devices=4, walk_tables="sharded",
                           factorization="sharded", **kw)
    np.testing.assert_array_equal(np.asarray(a), ref)
    np.testing.assert_allclose(np.asarray(b), ref, rtol=2e-4, atol=2e-4)


def test_pass_parallel_with_sharded_tables(graph, monkeypatch):
    """Pass-parallel counting commits the (replicated) sharded-table walk
    batches onto each counting device; results match the default-table
    run exactly (walks are value-identical and counts deterministic)."""
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    kw = dict(feature_dim=8, num_walks=2, walk_length=12, window_size=3,
              seed=7, backend="device", cooccurrence="device",
              n_devices=4)
    a = alg.embed_deepwalk(graph, **kw)
    b = alg.embed_deepwalk(graph, walk_tables="sharded", **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
