"""Sharded sliced-ELL layout (parallel/ell.py) vs single-device parity.

The single-chip sliced-ELL layout is the production SpMM (ops/spmm_ell.py,
RESULTS.md); these tests pin its per-device twin inside the shard_map loop —
mirroring how the reference runs the same row-parallel kernel on every
worker (/root/reference/src/embedding.rs:59-63).
"""

import numpy as np
import pytest

from cleora_tpu import SparseMatrix, embed
from cleora_tpu.parallel.ell import ell_shards
from cleora_tpu.parallel.embed import embed_sharded
from cleora_tpu.parallel.shard import plan_halo, shard_coo, shard_graph


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(11)
    lines = [f"n{rng.integers(0, 300)} n{rng.integers(0, 300)}"
             for _ in range(3000)]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")


@pytest.fixture(scope="module")
def hub_graph():
    """Zipf-ish graph with rows beyond the _K_MAX width cap (hub split path)."""
    rng = np.random.default_rng(3)
    lines = [f"n{rng.integers(0, 200)} n{rng.integers(0, 200)}"
             for _ in range(1500)]
    lines += [f"hub n{rng.integers(0, 200)}" for _ in range(400)]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")


def _propagate_oracle(graph, x):
    data = graph.data
    n = data.num_entities
    rows = np.repeat(np.arange(n), np.diff(data.indptr))
    out = np.zeros_like(x)
    np.add.at(out, rows, data.left_vals[:, None] * x[data.indices])
    return out


@pytest.mark.parametrize("use_halo", [False, True])
def test_ell_shards_propagate_oracle(hub_graph, use_halo):
    """Host emulation of the per-shard ELL propagate vs a dense oracle,
    for both column encodings (concat ELL space / halo receive slots)."""
    n = hub_graph.num_entities
    sharded = shard_graph(hub_graph, "left", 4)
    halo = plan_halo(sharded) if use_halo else None
    plan = ell_shards(sharded, d=8, halo=halo, force=True)
    assert plan is not None
    assert plan.n_hub >= 1  # the hub row exercises the virtual-row split
    assert plan.slots >= plan.nnz

    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    x_padded = np.zeros((sharded.n_rows_padded, 8), dtype=np.float32)
    x_padded[:n] = x
    x_ell = plan.permute_state(x_padded)
    assert np.allclose(plan.unpermute_state(x_ell), x_padded)

    P = plan.n_shards
    arrs = plan.arrays()
    out = np.zeros((P, plan.R, 8), dtype=np.float32)
    xr = x_ell.reshape(P, plan.R, 8)
    for k in range(P):
        if use_halo:
            table = np.zeros((P * halo.M, 8), dtype=np.float32)
            for j in range(P):
                table[j * halo.M:(j + 1) * halo.M] = (
                    xr[j][plan.send_idx[j, k]]
                )
        else:
            table = x_ell
        pos = plan.n_zero
        for c, v in arrs["buckets"]:
            nb = c[k].shape[0]
            out[k, pos:pos + nb] = (table[c[k]] * v[k][:, :, None]).sum(axis=1)
            pos += nb
        if arrs["hub"] is not None:
            hc, hv, seg = arrs["hub"]
            raw = (table[hc[k]] * hv[k][:, :, None]).sum(axis=1)
            hub_out = np.zeros((plan.n_hub, 8), dtype=np.float32)
            np.add.at(hub_out, seg[k], raw)
            out[k, pos:pos + plan.n_hub] = hub_out

    got = plan.unpermute_state(out.reshape(P * plan.R, 8))[:n]
    assert np.allclose(got, _propagate_oracle(hub_graph, x), atol=1e-5)


@pytest.mark.parametrize("halo", [False, None])
def test_sharded_ell_matches_single(graph, halo):
    kw = dict(feature_dim=16, num_iterations=5, whiten=False)
    single = embed(graph, **kw)
    sharded = embed_sharded(graph, ell=True, halo=halo, **kw)
    assert np.allclose(single, sharded, atol=2e-5)


def test_sharded_ell_whiten_matches_single(graph):
    kw = dict(feature_dim=16, num_iterations=4, whiten=True)
    single = embed(graph, **kw)
    sharded = embed_sharded(graph, ell=True, **kw)
    assert np.allclose(single @ single.T, sharded @ sharded.T, atol=1e-3)


def test_sharded_ell_hub_rows_match_single(hub_graph):
    kw = dict(feature_dim=16, num_iterations=5, whiten=False)
    single = embed(hub_graph, **kw)
    sharded = embed_sharded(hub_graph, ell=True, **kw)
    assert np.allclose(single, sharded, atol=2e-5)


def test_sharded_ell_bfloat16(graph):
    kw = dict(feature_dim=16, num_iterations=4, whiten=False)
    f32 = embed_sharded(graph, ell=True, **kw)
    bf16 = embed_sharded(graph, ell=True, dtype="bfloat16", **kw)
    # direction-preserving: row cosines close to 1
    num = np.sum(f32 * bf16, axis=1)
    den = np.linalg.norm(f32, axis=1) * np.linalg.norm(bf16, axis=1)
    mask = den > 1e-6
    assert np.min(num[mask] / den[mask]) > 0.98


def test_sharded_ell_residual_and_convergence(graph):
    kw = dict(feature_dim=16, num_iterations=12, whiten=False,
              residual_weight=0.3, convergence_threshold=1e-3)
    single = embed(graph, **kw)
    sharded = embed_sharded(graph, ell=True, **kw)
    assert np.allclose(single, sharded, atol=2e-4)


def test_sharded_ell_callback_matches_fused(graph):
    kw = dict(feature_dim=16, num_iterations=3, whiten=False)
    fused = embed_sharded(graph, ell=True, **kw)
    seen = []
    stepped = embed_sharded(
        graph, ell=True, callback=lambda i, x: seen.append((i, x.copy())),
        **kw,
    )
    assert len(seen) == 3
    assert np.allclose(fused, stepped, atol=1e-6)
    assert np.allclose(seen[-1][1], stepped)


def test_ell_shards_declines_on_waste():
    """A single extreme hub over tiny shards wastes too many slots —
    the planner declines (embed_sharded falls back to banded/flat)."""
    rng = np.random.default_rng(5)
    # one row with degree ~500, everything else degree ~1
    rows = np.concatenate([
        np.zeros(500, dtype=np.int64),
        np.arange(1, 2000, dtype=np.int64),
    ])
    cols = rng.integers(0, 2000, rows.shape[0]).astype(np.int64)
    vals = np.ones(rows.shape[0], dtype=np.float32)
    order = np.argsort(rows, kind="stable")
    sharded = shard_coo(rows[order], cols[order], vals[order], 2000, 8)
    plan = ell_shards(sharded, d=16, max_waste=1.01, row_waste=1.01)
    assert plan is None
    # force=True overrides for tests/tuning
    assert ell_shards(sharded, d=16, max_waste=1.01, force=True) is not None


@pytest.mark.parametrize("g", ["graph", "hub_graph"])
def test_sharded_ell_split_matches_single(g, request):
    """split mode: local-owner edges bucketed against own state, remote
    remainder via the received slab — must match the plain paths."""
    gr = request.getfixturevalue(g)
    kw = dict(feature_dim=16, num_iterations=5, whiten=False)
    single = embed(gr, **kw)
    sharded = embed_sharded(gr, ell="split", **kw)
    assert np.allclose(single, sharded, atol=2e-5)


def test_sharded_ell_split_whiten_and_bf16(graph):
    kw = dict(feature_dim=16, num_iterations=4)
    single = embed(graph, whiten=True, **kw)
    split = embed_sharded(graph, ell="split", whiten=True, **kw)
    assert np.allclose(single @ single.T, split @ split.T, atol=1e-3)
    bf16 = embed_sharded(graph, ell="split", whiten=False,
                         dtype="bfloat16", **kw)
    f32 = embed_sharded(graph, ell="split", whiten=False, **kw)
    num = np.sum(f32 * bf16, axis=1)
    den = np.linalg.norm(f32, axis=1) * np.linalg.norm(bf16, axis=1)
    mask = den > 1e-6
    assert np.min(num[mask] / den[mask]) > 0.98


def test_ell_split_remote_partition(hub_graph):
    """Every real edge lands in exactly one of {bucket slabs, hub, remote},
    and remote edges' owners are all non-local."""
    sharded = shard_graph(hub_graph, "left", 4)
    plan = ell_shards(sharded, d=8, halo=plan_halo(sharded), force=True,
                      split=True)
    assert plan.remote is not None
    rcols, rvals, rpos = plan.remote
    n_bucketed = sum(int((v != 0).sum()) for _, v in plan.buckets)
    if plan.hub is not None:
        n_bucketed += int((plan.hub[1] != 0).sum())
    n_remote = int((rvals != 0).sum())
    assert n_bucketed + n_remote == plan.nnz
    # padding slots point at the last ELL row with zero value
    assert ((rvals != 0) | (rpos == plan.R - 1)).all()
