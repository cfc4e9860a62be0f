"""Canonical (compile-cache-portable) sliced-ELL shapes — VERDICT r2 #4.

The canonical planner (ops/spmm_ell.py:_plan_ell_canonical) quantizes every
slab shape to a graph-independent grid so graphs of similar scale lower to
the SAME XLA program.  These tests assert (a) numeric parity with the
default exact-shape layout across embed() configurations, and (b) the
cache-portability property itself: two graphs with different degree
histograms produce pytrees with identical treedef + shapes, and the second
embed_loop call hits the jit cache (cache size does not grow).
"""

import jax
import numpy as np
import pytest

from cleora_tpu import SparseMatrix, embed
from cleora_tpu.ops.loop import embed_loop
from cleora_tpu.ops.spmm_ell import _grid_up, plan_ell, spmm_ell


@pytest.fixture(scope="module")
def graph():
    # skewed degrees incl. >64-degree hubs to exercise the hub slab
    rng = np.random.default_rng(11)
    hubs = rng.integers(0, 5, size=600)
    tails = rng.integers(0, 400, size=2400)
    lines = [f"h{a} n{b}" for a, b in zip(hubs, tails[:600])]
    lines += [
        f"n{rng.integers(0, 400)} n{t}" for t in tails[600:]
    ]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")


def test_grid_up_properties():
    for n in [0, 1, 7, 8, 9, 100, 949, 950, 1000, 1023, 1024, 1025, 10**6]:
        g = _grid_up(n)
        assert g >= max(n, 8)
        assert g % 8 == 0
        # overshoot bounded by an eighth step of the next power of two
        # (<25% worst case, just above a power of two)
        if n > 64:
            assert g < n * 1.25
    # similar counts collapse to one grid value
    assert _grid_up(950) == _grid_up(1000) == 1024


def _coo(deg_counts, seed):
    """COO with a prescribed degree sequence (row-sorted)."""
    rng = np.random.default_rng(seed)
    degs = np.concatenate(
        [np.full(c, d, dtype=np.int64) for d, c in deg_counts.items()]
    )
    n = int(degs.shape[0])
    rows = np.repeat(np.arange(n, dtype=np.int64), degs)
    cols = rng.integers(0, n, size=rows.shape[0])
    vals = np.repeat(1.0 / degs.astype(np.float32), degs)
    return rows, cols.astype(np.int64), vals.astype(np.float32), n


def test_canonical_plan_matches_dense_spmm():
    rows, cols, vals, n = _coo({2: 100, 5: 60, 70: 3}, 3)
    plan = plan_ell(rows, cols, vals, n, canonical=True)
    assert plan is not None
    assert plan.state_rows > n
    dense = np.zeros((n, n), dtype=np.float32)
    np.add.at(dense, (rows, cols), vals)
    x = np.random.default_rng(0).standard_normal((n, 8)).astype(np.float32)
    xp = np.zeros((plan.state_rows, 8), dtype=np.float32)
    xp[:n] = x
    x_rel = xp[np.asarray(plan.order)]
    out_rel = np.asarray(spmm_ell(plan.device(), jax.numpy.asarray(x_rel)))
    out = out_rel[np.asarray(plan.rank)][:n]
    assert np.allclose(out, dense @ x, atol=1e-4)
    # garbage positions stay exactly zero
    valid = np.asarray(plan.valid)[:, 0].astype(bool)
    assert np.all(out_rel[~valid] == 0.0)


def test_canonical_program_reuse_across_graphs():
    """Two graphs with DIFFERENT degree histograms (950/950 vs 1000/1000
    rows of degree 3/4) quantize to identical shapes; the default exact
    planner would emit two different programs."""
    pa = plan_ell(*_coo({3: 950, 4: 950}, 0), canonical=True)
    pb = plan_ell(*_coo({3: 1000, 4: 1000}, 1), canonical=True)
    la, ta = jax.tree_util.tree_flatten(pa)
    lb, tb = jax.tree_util.tree_flatten(pb)
    assert ta == tb
    assert [x.shape for x in la] == [x.shape for x in lb]
    assert pa.state_rows == pb.state_rows

    # default exact plans differ in shape (sanity: the test discriminates)
    da = plan_ell(*_coo({3: 950, 4: 950}, 0))
    db = plan_ell(*_coo({3: 1000, 4: 1000}, 1))
    assert [c.shape for c, _ in da.buckets] != [c.shape for c, _ in db.buckets]

    def run(plan):
        rng = np.random.default_rng(7)
        x0 = np.zeros((plan.state_rows, 16), dtype=np.float32)
        x0[: int(np.asarray(plan.count))] = rng.standard_normal(
            (int(np.asarray(plan.count)), 16)
        ).astype(np.float32)
        x0_rel = jax.numpy.asarray(x0)
        return embed_loop(
            plan.device(), (), (), jax.numpy.asarray(x0),
            n_rows=plan.state_rows, num_iterations=3, do_whiten=True,
        )

    before = embed_loop._cache_size()
    out_a = run(pa)
    mid = embed_loop._cache_size()
    out_b = run(pb)
    after = embed_loop._cache_size()
    assert mid == before + 1
    assert after == mid, "second graph retraced: canonical shapes diverged"
    assert np.isfinite(np.asarray(out_a)).all()
    assert np.isfinite(np.asarray(out_b)).all()


@pytest.mark.parametrize("normalization", ["l2", "l1", "spectral", "none"])
def test_canonical_embed_parity_no_whiten(graph, normalization):
    kw = dict(feature_dim=24, num_iterations=5, whiten=False,
              normalization=normalization)
    base = embed(graph, **kw)
    canon = embed(graph, canonical_shapes=True, **kw)
    assert canon.shape == base.shape
    if normalization == "spectral":
        # spectral uses an SVD — u·s column signs are ambiguous across
        # layouts; compare geometry
        assert np.allclose(base @ base.T, canon @ canon.T, atol=1e-3)
    else:
        assert np.allclose(base, canon, atol=2e-5)


def test_canonical_embed_parity_whiten(graph):
    kw = dict(feature_dim=24, num_iterations=4, whiten=True)
    base = embed(graph, **kw)
    canon = embed(graph, canonical_shapes=True, **kw)
    # whitening involves eigh — compare geometry (Gram), not raw coords
    assert np.allclose(base @ base.T, canon @ canon.T, atol=1e-3)


def test_canonical_embed_residual_and_symmetric(graph):
    kw = dict(feature_dim=16, num_iterations=4, whiten=False,
              residual_weight=0.3, propagation="symmetric")
    base = embed(graph, **kw)
    canon = embed(graph, canonical_shapes=True, **kw)
    assert np.allclose(base, canon, atol=2e-5)


def test_canonical_embed_convergence(graph):
    kw = dict(feature_dim=16, num_iterations=30, whiten=False,
              convergence_threshold=0.05)
    base = embed(graph, **kw)
    canon = embed(graph, canonical_shapes=True, **kw)
    assert np.allclose(base, canon, atol=2e-5)


def test_canonical_embed_callback_path(graph):
    seen = []
    base = embed(graph, feature_dim=16, num_iterations=3, whiten=True,
                 callback=lambda i, e: None)
    canon = embed(graph, feature_dim=16, num_iterations=3, whiten=True,
                  canonical_shapes=True,
                  callback=lambda i, e: seen.append(e.shape))
    assert all(s == (graph.num_entities, 16) for s in seen)
    assert np.allclose(base @ base.T, canon @ canon.T, atol=1e-3)


def test_canonical_embed_bf16_and_initial(graph):
    out = embed(graph, feature_dim=16, num_iterations=3, whiten=False,
                dtype="bfloat16", canonical_shapes=True)
    assert out.shape == (graph.num_entities, 16)
    assert np.isfinite(out).all()

    x0 = np.random.default_rng(0).standard_normal(
        (graph.num_entities, 12)
    ).astype(np.float32)
    base = embed(graph, num_iterations=3, whiten=False,
                 initial_embeddings=x0)
    canon = embed(graph, num_iterations=3, whiten=False,
                  initial_embeddings=x0, canonical_shapes=True)
    assert np.allclose(base, canon, atol=2e-5)


def test_canonical_env_var_default(graph, monkeypatch):
    monkeypatch.setenv("CLEORA_TPU_CANON", "1")
    kw = dict(feature_dim=16, num_iterations=3, whiten=False)
    base = embed(graph, canonical_shapes=False, **kw)
    via_env = embed(graph, **kw)
    assert np.allclose(base, via_env, atol=2e-5)


def test_canonical_small_graph_builds():
    lines = ["u1\tapple banana", "u2\tbanana cherry", "u3\tapple cherry d"]
    g = SparseMatrix.from_iterator(iter(lines), "user complex::product")
    base = embed(g, feature_dim=8, num_iterations=4, whiten=False)
    canon = embed(g, feature_dim=8, num_iterations=4, whiten=False,
                  canonical_shapes=True)
    assert np.allclose(base, canon, atol=2e-5)
    # whiten on n < d is rank-deficient (eps-amplified null directions
    # differ per summation order) — assert it runs and stays finite
    w = embed(g, feature_dim=8, num_iterations=4, canonical_shapes=True)
    assert w.shape == (g.num_entities, 8) and np.isfinite(w).all()
