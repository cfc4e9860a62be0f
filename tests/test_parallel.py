"""Multi-device sharded embed vs single-device parity (8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from cleora_tpu import SparseMatrix, embed
from cleora_tpu.parallel.embed import embed_sharded
from cleora_tpu.parallel.mesh import make_mesh
from cleora_tpu.parallel.shard import shard_coo, shard_graph


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(7)
    lines = [f"n{rng.integers(0, 300)} n{rng.integers(0, 300)}"
             for _ in range(3000)]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")


def test_eight_devices_available():
    assert len(jax.devices()) >= 8  # conftest forces the virtual CPU mesh


def test_shard_coo_roundtrip(graph):
    sharded = shard_graph(graph, "left", 8)
    assert sharded.n_shards == 8
    # reassembling shard edges reproduces every (row, col, val) triple
    data = graph.data
    n = data.num_entities
    want = set()
    rows = np.repeat(np.arange(n), np.diff(data.indptr))
    for r, c, v in zip(rows, data.indices, data.left_vals):
        want.add((int(r), int(c), np.float32(v).tobytes()))
    got = set()
    for k in range(sharded.n_shards):
        for lr, c, v in zip(sharded.local_rows[k], sharded.cols[k],
                            sharded.vals[k]):
            if v != 0.0:
                got.add((int(lr) + k * sharded.rows_per_shard, int(c),
                         np.float32(v).tobytes()))
    assert got == want


@pytest.mark.parametrize("normalization", ["l2", "l1", "none"])
def test_sharded_matches_single(graph, normalization):
    kw = dict(feature_dim=16, num_iterations=5, normalization=normalization,
              whiten=False)
    single = embed(graph, **kw)
    sharded = embed_sharded(graph, **kw)
    assert np.allclose(single, sharded, atol=2e-5)


def test_sharded_whiten_matches_single(graph):
    kw = dict(feature_dim=16, num_iterations=4, whiten=True)
    single = embed(graph, **kw)
    sharded = embed_sharded(graph, **kw)
    # whitening involves eigh — compare geometry (Gram), not raw coords
    assert np.allclose(single @ single.T, sharded @ sharded.T, atol=1e-3)


def test_sharded_spectral(graph):
    out = embed_sharded(graph, feature_dim=16, num_iterations=3,
                        normalization="spectral", whiten=False)
    assert out.shape == (graph.num_entities, 16)
    assert np.isfinite(out).all()


def test_sharded_residual_and_symmetric(graph):
    kw = dict(feature_dim=16, num_iterations=4, whiten=False,
              residual_weight=0.3, propagation="symmetric")
    single = embed(graph, **kw)
    sharded = embed_sharded(graph, **kw)
    assert np.allclose(single, sharded, atol=2e-5)


def test_sharded_convergence(graph):
    out = embed_sharded(graph, feature_dim=16, num_iterations=30,
                        whiten=False, convergence_threshold=0.05)
    assert np.isfinite(out).all()


def test_sharded_initial_embeddings(graph):
    x0 = np.random.default_rng(0).standard_normal(
        (graph.num_entities, 12)
    ).astype(np.float32)
    single = embed(graph, num_iterations=3, whiten=False,
                   initial_embeddings=x0)
    sharded = embed_sharded(graph, num_iterations=3, whiten=False,
                            initial_embeddings=x0)
    assert np.allclose(single, sharded, atol=2e-5)


def test_sharded_small_device_counts(graph):
    base = embed(graph, feature_dim=8, num_iterations=3, whiten=False)
    for nd in (1, 2, 4):
        out = embed_sharded(graph, feature_dim=8, num_iterations=3,
                            whiten=False, n_devices=nd)
        assert np.allclose(base, out, atol=2e-5), nd


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert np.isfinite(out).all()


def test_halo_plan_correctness(graph):
    from cleora_tpu.parallel.shard import plan_halo

    sharded = shard_graph(graph, "left", 8)
    plan = plan_halo(sharded)
    rps = sharded.rows_per_shard
    P = sharded.n_shards
    # every edge's remapped slot resolves to its original global column
    for j in range(P):
        for e in range(sharded.cols.shape[1]):
            slot = plan.remapped_cols[j, e]
            k, pos = slot // plan.M, slot % plan.M
            local = plan.send_idx[k, j, pos]
            assert k * rps + local == sharded.cols[j, e]


@pytest.mark.parametrize("halo", [True, False, None])
def test_halo_matches_allgather(graph, halo):
    kw = dict(feature_dim=16, num_iterations=5, whiten=False)
    base = embed(graph, **kw)
    out = embed_sharded(graph, halo=halo, **kw)
    assert np.allclose(base, out, atol=2e-5)


def test_halo_with_whiten_and_residual(graph):
    kw = dict(feature_dim=16, num_iterations=4, whiten=True,
              residual_weight=0.2)
    a = embed_sharded(graph, halo=True, **kw)
    b = embed_sharded(graph, halo=False, **kw)
    assert np.allclose(a @ a.T, b @ b.T, atol=1e-3)


def test_sharded_bfloat16(graph):
    f32 = embed_sharded(graph, feature_dim=16, num_iterations=4,
                        whiten=False)
    bf16 = embed_sharded(graph, feature_dim=16, num_iterations=4,
                         whiten=False, dtype="bfloat16")
    assert bf16.dtype == np.float32
    cos = np.sum(f32 * bf16, axis=1) / np.maximum(
        np.linalg.norm(f32, axis=1) * np.linalg.norm(bf16, axis=1), 1e-10
    )
    assert np.min(cos) > 0.98
    with pytest.raises(ValueError, match="Unknown dtype"):
        embed_sharded(graph, dtype="float64")


def test_sharded_chunked_local_spmm(graph, monkeypatch):
    """The per-shard SpMM goes through spmm_inner; force its chunked-scan
    branch (the production memory-bounded path) inside shard_map and check
    parity with the single-device result."""
    import cleora_tpu.ops.spmm as _s
    import importlib

    spmm_mod = importlib.import_module("cleora_tpu.ops.spmm")
    monkeypatch.setattr(
        spmm_mod, "_chunk_edges_for", lambda n, d, table_rows=None, **kw: 128
    )
    kw = dict(feature_dim=16, num_iterations=4, whiten=False)
    single = embed(graph, **kw)
    sharded = embed_sharded(graph, ell=False, banded=False, **kw)
    assert np.allclose(single, sharded, atol=2e-5)


def test_band_shards_roundtrip(graph):
    """Banded per-shard layout holds exactly the 1-D layout's edge triples."""
    from cleora_tpu.parallel.shard import band_shards

    sharded = shard_graph(graph, "left", 8)
    banded = band_shards(sharded, n_bands=4)
    assert banded is not None and banded.local_rows.shape[:2] == (8, 4)
    for k in range(8):
        want = {
            (int(r), int(c), np.float32(v).tobytes())
            for r, c, v in zip(
                sharded.local_rows[k], sharded.cols[k], sharded.vals[k]
            )
            if v != 0.0
        }
        got = {
            (int(banded.local_rows[k, i, e]) + i * banded.band_rows, int(c),
             np.float32(v).tobytes())
            for i in range(banded.n_bands)
            for e, (c, v) in enumerate(zip(banded.cols[k, i],
                                           banded.vals[k, i]))
            if v != 0.0
        }
        assert got == want


def test_sharded_banded_matches_single(graph):
    """Forced banded local SpMM (allgather and halo) equals single-device."""
    kw = dict(feature_dim=16, num_iterations=5, whiten=False)
    single = embed(graph, **kw)
    for halo in (False, True):
        out = embed_sharded(graph, banded=4, halo=halo, **kw)
        assert np.allclose(single, out, atol=2e-5)


def test_sharded_banded_whiten_and_bf16(graph):
    """Banded layout composes with whitening and bf16 state."""
    a = embed_sharded(graph, feature_dim=16, num_iterations=4, whiten=True,
                      banded=4)
    b = embed_sharded(graph, feature_dim=16, num_iterations=4, whiten=True,
                      banded=False)
    assert np.allclose(a @ a.T, b @ b.T, atol=1e-3)
    f32 = embed_sharded(graph, feature_dim=16, num_iterations=4,
                        whiten=False, banded=4)
    bf16 = embed_sharded(graph, feature_dim=16, num_iterations=4,
                         whiten=False, banded=4, dtype="bfloat16")
    cos = np.sum(f32 * bf16, axis=1) / np.maximum(
        np.linalg.norm(f32, axis=1) * np.linalg.norm(bf16, axis=1), 1e-10
    )
    assert np.min(cos) > 0.98

def test_sharded_callback_matches_fused(graph):
    """Per-iteration callback path equals the fused sharded loop."""
    kw = dict(feature_dim=16, num_iterations=4, whiten=False)
    fused = embed_sharded(graph, **kw)
    seen = []
    stepped = embed_sharded(graph, callback=lambda i, e: seen.append(i), **kw)
    assert seen == [0, 1, 2, 3]
    assert np.allclose(fused, stepped, atol=2e-5)


def test_sharded_callback_convergence_early_stop(graph):
    seen = []
    embed_sharded(
        graph, feature_dim=16, num_iterations=30, whiten=False,
        convergence_threshold=0.5, callback=lambda i, e: seen.append(i),
    )
    assert 1 < len(seen) < 30  # stopped early, after the first check


def test_sharded_zero_iterations_callback(graph):
    """num_iterations=0 with a callback returns the initial embeddings, like
    the non-callback path (regression: `host` was unbound)."""
    x0 = np.random.default_rng(3).standard_normal(
        (graph.num_entities, 8)
    ).astype(np.float32)
    calls = []
    out_cb = embed_sharded(graph, num_iterations=0, whiten=False,
                           initial_embeddings=x0,
                           callback=lambda i, e: calls.append(i))
    out_plain = embed_sharded(graph, num_iterations=0, whiten=False,
                              initial_embeddings=x0)
    assert calls == []
    assert np.allclose(out_cb, out_plain, atol=1e-6)


def test_hier_mesh_matches_single(graph):
    """Hierarchical ("host","chip") mesh: same results as the flat mesh and
    the single-device loop, with and without the halo exchange."""
    from cleora_tpu.parallel import make_hier_mesh

    mesh = make_hier_mesh(n_hosts=2, chips_per_host=4)
    assert mesh.axis_names == ("host", "chip")
    kw = dict(feature_dim=16, num_iterations=4, whiten=False)
    single = embed(graph, **kw)
    for halo in (False, True):
        out = embed_sharded(graph, mesh=mesh, halo=halo, **kw)
        assert np.allclose(single, out, atol=2e-5), halo
    # whitening uses psum over the axis tuple
    sw = embed(graph, feature_dim=16, num_iterations=3, whiten=True)
    ow = embed_sharded(graph, mesh=mesh, feature_dim=16, num_iterations=3,
                       whiten=True)
    assert np.allclose(sw @ sw.T, ow @ ow.T, atol=1e-3)


def test_hier_mesh_banded_and_bf16(graph):
    from cleora_tpu.parallel import make_hier_mesh

    mesh = make_hier_mesh(n_hosts=4, chips_per_host=2)
    f32 = embed_sharded(graph, mesh=mesh, feature_dim=16, num_iterations=4,
                        whiten=False, banded=2)
    bf16 = embed_sharded(graph, mesh=mesh, feature_dim=16, num_iterations=4,
                         whiten=False, dtype="bfloat16")
    single = embed(graph, feature_dim=16, num_iterations=4, whiten=False)
    assert np.allclose(single, f32, atol=2e-5)
    cos = np.sum(single * bf16, axis=1) / np.maximum(
        np.linalg.norm(single, axis=1) * np.linalg.norm(bf16, axis=1), 1e-10
    )
    assert cos.min() > 0.98


def test_overlap_halo_matches_single(graph):
    """Pipelined (ppermute-round) halo exchange: parity with the
    single-device loop for l2/whiten/residual, bf16, and both mesh shapes."""
    from cleora_tpu.parallel import make_hier_mesh

    kw = dict(feature_dim=16, num_iterations=4, whiten=False)
    single = embed(graph, **kw)
    out = embed_sharded(graph, halo="overlap", **kw)
    assert np.allclose(single, out, atol=2e-5)

    sw = embed(graph, feature_dim=16, num_iterations=3, whiten=True,
               residual_weight=0.3)
    ow = embed_sharded(graph, halo="overlap", feature_dim=16,
                       num_iterations=3, whiten=True, residual_weight=0.3)
    assert np.allclose(sw @ sw.T, ow @ ow.T, atol=1e-3)

    hier = make_hier_mesh(n_hosts=2, chips_per_host=4)
    oh = embed_sharded(graph, halo="overlap", mesh=hier, **kw)
    assert np.allclose(single, oh, atol=2e-5)

    bf = embed_sharded(graph, halo="overlap", dtype="bfloat16", **kw)
    cos = np.sum(single * bf, axis=1) / np.maximum(
        np.linalg.norm(single, axis=1) * np.linalg.norm(bf, axis=1), 1e-10
    )
    assert cos.min() > 0.98


def test_overlap_plan_groups_cover_all_edges(graph):
    """Every real edge appears in exactly one per-round group."""
    from cleora_tpu.parallel.shard import plan_overlap, shard_graph

    sharded = shard_graph(graph, "left", 4)
    plan = plan_overlap(sharded)
    total = sum(int((g[2] != 0).sum()) for g in plan.groups)
    assert total == int((sharded.vals != 0).sum())
    # round-r group of shard j only references owner (j - r) % 4 slots
    assert len(plan.groups) == 4


def test_sharded_banded_false_still_selects_ell(graph, monkeypatch):
    """banded=False disables only the banded fallback; the sliced-ELL
    auto-selection still runs (regression: the dispatch condition used to
    treat banded=False like a forced band count and silently fell to the
    flat 1-D layout)."""
    import cleora_tpu.parallel.ell as pe

    called = {}
    real = pe.ell_shards

    def spy(*a, **k):
        called["ell"] = True
        return real(*a, **k)

    monkeypatch.setattr(pe, "ell_shards", spy)
    kw = dict(feature_dim=16, num_iterations=3, whiten=False)
    single = embed(graph, **kw)
    out = embed_sharded(graph, banded=False, **kw)
    assert called.get("ell")
    assert np.allclose(single, out, atol=2e-5)


def test_sharded_initial_embeddings_validated(graph):
    """Row-count mismatch raises instead of silently zero-padding."""
    with pytest.raises(ValueError, match="initial_embeddings"):
        embed_sharded(graph, num_iterations=2,
                      initial_embeddings=np.zeros((3, 8), np.float32))


def test_sharded_single_entity_whiten_finite():
    """1-entity graph with whiten=True: parity with the single-chip path,
    which skips whitening for n<=1 (regression: cov/(n-1) divided by zero
    and produced all-NaN embeddings)."""
    g = SparseMatrix.from_iterator(iter(["a a"]), "complex::reflexive::node")
    kw = dict(feature_dim=8, num_iterations=2, whiten=True)
    out = embed_sharded(g, **kw)
    single = embed(g, **kw)
    assert np.all(np.isfinite(out))
    assert np.allclose(out, single, atol=1e-5)


def test_build_sharded_embed_place_validates_dim(graph):
    """place() rejects state whose feature dim differs from the one the
    loop was compiled for."""
    from cleora_tpu.parallel.embed import build_sharded_embed
    from cleora_tpu.parallel.shard import pad_rows

    mesh = make_mesh(8)
    sharded = shard_graph(graph, "left", 8)
    fn, place = build_sharded_embed(mesh, sharded, 16, 1)
    x0 = graph.initialize_deterministically(8, 0)  # wrong width
    with pytest.raises(ValueError, match="feature_dim=16"):
        place(pad_rows(x0, sharded.n_rows_padded))


def test_plan_halo_distributed_single_process_parity(graph):
    """With one process owning every shard the distributed planner's
    allgathers are identities, so it must reproduce plan_halo byte for
    byte (the multi-process path is exercised in test_multiprocess.py)."""
    from cleora_tpu.parallel.shard import plan_halo, plan_halo_distributed

    sharded = shard_graph(graph, "left", 8)
    mesh = make_mesh(8)
    a = plan_halo(sharded)
    b = plan_halo_distributed(sharded, mesh)
    assert a.M == b.M
    assert np.array_equal(a.send_idx, b.send_idx)
    assert np.array_equal(a.remapped_cols, b.remapped_cols)


def test_allgather_degrees_matches_local(graph):
    from cleora_tpu.parallel.shard import (
        allgather_degrees,
        local_shard_degrees,
    )

    sharded = shard_graph(graph, "left", 8)
    mesh = make_mesh(8)
    got = allgather_degrees(sharded, mesh)
    want = local_shard_degrees(sharded)
    assert np.array_equal(got, want)
    # real (non-padding) edge count is preserved
    assert int(got.sum()) == int((sharded.vals != 0.0).sum())


def test_ell_shards_global_deg_matches_local(graph):
    """Supplying the true degree histogram explicitly must reproduce the
    locally-computed layout exactly (piece mode builds deg by allgather)."""
    from cleora_tpu.parallel.ell import ell_shards
    from cleora_tpu.parallel.shard import local_shard_degrees

    sharded = shard_graph(graph, "left", 8)
    a = ell_shards(sharded, d=16, force=True)
    b = ell_shards(sharded, d=16, force=True,
                   global_deg=local_shard_degrees(sharded))
    assert a is not None and b is not None
    assert a.R == b.R and a.nnz == b.nnz
    assert np.array_equal(a.rank, b.rank)
    assert np.array_equal(a.valid, b.valid)
    for (ca, va), (cb, vb) in zip(a.buckets, b.buckets):
        assert np.array_equal(ca, cb) and np.array_equal(va, vb)


def test_ell_shards_global_deg_rejects_split(graph):
    from cleora_tpu.parallel.ell import ell_shards
    from cleora_tpu.parallel.shard import local_shard_degrees, plan_halo

    sharded = shard_graph(graph, "left", 8)
    plan = plan_halo(sharded)
    with pytest.raises(ValueError, match="split"):
        ell_shards(sharded, d=16, halo=plan, split=True, force=True,
                   global_deg=local_shard_degrees(sharded))
