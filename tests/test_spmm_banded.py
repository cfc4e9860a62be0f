"""Row-banded (accumulator-free) SpMM layout: plan_banded_coo + the 2-D
dispatch in spmm_inner.

Banding only engages above the chunk threshold (~1M edges), so these tests
monkeypatch ``_chunk_edges_for`` down to toy sizes and check the banded
result against a scipy oracle and against the 1-D layout bit-for-bit
semantics (same math, different summation grouping → allclose).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import importlib

spmm_mod = importlib.import_module("cleora_tpu.ops.spmm")
from cleora_tpu.ops.spmm import pad_coo, plan_banded_coo, spmm


def _random_coo(n_rows, nnz, seed=0, n_cols=None):
    rng = np.random.default_rng(seed)
    rows = np.sort(rng.integers(0, n_rows, nnz)).astype(np.int32)
    cols = rng.integers(0, n_cols or n_rows, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return rows, cols, vals


def _oracle(rows, cols, vals, x, n_rows):
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n_rows, x.shape[0]))
    return np.asarray(a @ x, dtype=np.float32)


@pytest.fixture
def tiny_chunks(monkeypatch):
    monkeypatch.setattr(
        spmm_mod, "_chunk_edges_for", lambda n, d, table_rows=None, **kw: 64
    )


@pytest.mark.parametrize("n_rows,nnz", [(100, 1000), (97, 531), (257, 2000)])
def test_banded_matches_oracle(tiny_chunks, n_rows, nnz):
    rows, cols, vals = _random_coo(n_rows, nnz, seed=n_rows)
    x = np.random.default_rng(1).standard_normal((n_rows, 16)).astype(np.float32)
    triple = plan_banded_coo(rows, cols, vals, n_rows, d=16)
    assert triple is not None and triple[0].ndim == 2
    import jax.numpy as jnp

    out = np.asarray(spmm(*(jnp.asarray(a) for a in triple),
                          jnp.asarray(x), n_rows=n_rows))
    np.testing.assert_allclose(out, _oracle(rows, cols, vals, x, n_rows),
                               rtol=2e-5, atol=2e-5)


def test_banded_matches_1d_path(tiny_chunks):
    n_rows, nnz = 120, 900
    rows, cols, vals = _random_coo(n_rows, nnz, seed=3)
    x = np.random.default_rng(2).standard_normal((n_rows, 8)).astype(np.float32)
    import jax.numpy as jnp

    banded = plan_banded_coo(rows, cols, vals, n_rows, d=8)
    flat = pad_coo(rows, cols, vals, n_rows)
    out_b = np.asarray(spmm(*(jnp.asarray(a) for a in banded),
                            jnp.asarray(x), n_rows=n_rows))
    out_f = np.asarray(spmm(*(jnp.asarray(a) for a in flat),
                            jnp.asarray(x), n_rows=n_rows))
    np.testing.assert_allclose(out_b, out_f, rtol=2e-5, atol=2e-5)


def test_small_graph_declines():
    rows, cols, vals = _random_coo(50, 200)
    assert plan_banded_coo(rows, cols, vals, 50, d=16) is None


def test_skewed_graph_declines(tiny_chunks):
    # star graph: every edge lands on row 0 → one band would hold all edges
    nnz, n_rows = 4096, 512
    rows = np.zeros(nnz, dtype=np.int32)
    cols = np.arange(nnz, dtype=np.int32) % n_rows
    vals = np.ones(nnz, dtype=np.float32)
    assert plan_banded_coo(rows, cols, vals, n_rows, d=16) is None


def test_banded_bf16_storage(tiny_chunks):
    n_rows, nnz = 64, 512
    rows, cols, vals = _random_coo(n_rows, nnz, seed=9)
    x = np.random.default_rng(4).standard_normal((n_rows, 8)).astype(np.float32)
    import jax.numpy as jnp

    banded = plan_banded_coo(rows, cols, vals, n_rows, d=8)
    out = np.asarray(
        spmm(*(jnp.asarray(a) for a in banded),
             jnp.asarray(x).astype(jnp.bfloat16), n_rows=n_rows),
        dtype=np.float32,
    )
    np.testing.assert_allclose(out, _oracle(rows, cols, vals, x, n_rows),
                               rtol=0.05, atol=0.05)


def test_device_coo_banded_cache(tiny_chunks):
    """_device_coo(banded_dim=...) returns the sliced-ELL layout for large
    graphs (the preferred fused-loop layout) and the 1-D layout without
    banded_dim."""
    from cleora_tpu import SparseMatrix
    from cleora_tpu.ops.spmm_ell import EllPlan

    rng = np.random.default_rng(7)
    lines = [f"{rng.integers(0, 200)} {rng.integers(0, 200)}"
             for _ in range(600)]
    g = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
    r2, _, _ = g._device_coo("left", banded_dim=16)
    assert isinstance(r2, EllPlan)
    r1, _, _ = g._device_coo("left")
    assert r1.ndim == 1


def test_device_coo_banded_fallback(tiny_chunks, monkeypatch):
    """When plan_ell declines (waste bound), the row-banded 2-D layout is
    the fallback."""
    import cleora_tpu.ops.spmm_ell as se
    from cleora_tpu import SparseMatrix

    monkeypatch.setattr(se, "plan_ell", lambda *a, **k: None)
    rng = np.random.default_rng(7)
    lines = [f"{rng.integers(0, 200)} {rng.integers(0, 200)}"
             for _ in range(600)]
    g = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
    r2, _, _ = g._device_coo("left", banded_dim=16)
    assert hasattr(r2, "ndim") and r2.ndim == 2


def test_embed_banded_equals_unbanded(tiny_chunks):
    """Full embed() through the banded layout matches the 1-D layout."""
    from cleora_tpu import SparseMatrix, embed

    rng = np.random.default_rng(11)
    lines = [f"u{rng.integers(0, 40)}\tp{rng.integers(0, 60)}"
             for _ in range(500)]
    g1 = SparseMatrix.from_iterator(iter(lines), "user complex::product")
    g2 = SparseMatrix.from_iterator(iter(lines), "user complex::product")
    e_banded = embed(g1, feature_dim=16, num_iterations=5, whiten=False)
    # force the 1-D path by pre-populating the cache
    g2._device_cache[("coo", "left", 16, False)] = g2._device_coo("left")
    e_flat = embed(g2, feature_dim=16, num_iterations=5, whiten=False)
    np.testing.assert_allclose(e_banded, e_flat, rtol=2e-5, atol=2e-5)


def test_boundary_nnz_at_chunk(monkeypatch):
    """nnz == chunk stays 1-D; nnz == chunk+1 bands; tiny n_rows works."""
    import importlib

    spmm_mod = importlib.import_module("cleora_tpu.ops.spmm")
    monkeypatch.setattr(
        spmm_mod, "_chunk_edges_for", lambda n, d, table_rows=None, **kw: 100
    )
    rows, cols, vals = _random_coo(50, 100, seed=1)
    assert plan_banded_coo(rows, cols, vals, 50, d=8) is None
    rows, cols, vals = _random_coo(50, 101, seed=1)
    t = plan_banded_coo(rows, cols, vals, 50, d=8)
    assert t is not None and t[0].shape[0] == 2

    # n_rows < n_bands: B == 1; every band holds one row's edges
    import jax.numpy as jnp

    rows = np.sort(np.random.default_rng(2).integers(0, 3, 300)).astype(np.int32)
    cols = np.random.default_rng(3).integers(0, 3, 300).astype(np.int32)
    vals = np.ones(300, dtype=np.float32)
    t = plan_banded_coo(rows, cols, vals, 3, d=8)
    if t is not None:  # may decline on skew; if planned, must be correct
        x = np.random.default_rng(4).standard_normal((3, 8)).astype(np.float32)
        out = np.asarray(spmm(*(jnp.asarray(a) for a in t),
                              jnp.asarray(x), n_rows=3))
        np.testing.assert_allclose(out, _oracle(rows, cols, vals, x, 3),
                                   rtol=2e-5, atol=2e-5)


def test_band_rows_shared_formula():
    """Planner and device derive B identically: local rows stay in range."""
    import importlib

    spmm_mod = importlib.import_module("cleora_tpu.ops.spmm")
    for n_rows, n_bands in [(100, 7), (97, 3), (8, 8), (1000, 13)]:
        B = spmm_mod._band_rows(n_rows, n_bands)
        assert n_bands * B >= n_rows
        assert (n_bands - 1) * B < n_rows  # no all-empty trailing band


def test_extreme_skew_declines(tiny_chunks):
    """Star graph: the row-banded planner declines (hub overflows the cap)."""
    nnz, n_rows = 4096, 512
    rows = np.zeros(nnz, dtype=np.int32)
    cols = np.arange(nnz, dtype=np.int32) % n_rows
    vals = np.ones(nnz, dtype=np.float32)
    assert plan_banded_coo(rows, cols, vals, n_rows, d=16) is None


# ---------------------------------------------------------- equal-edge-cut


@pytest.mark.parametrize("skew", [False, True])
def test_edgecut_matches_oracle(tiny_chunks, skew):
    """Equal-edge-cut bands equal the oracle on uniform and hub graphs."""
    from cleora_tpu.ops.spmm import EdgeCutBands, plan_edgecut_coo

    rng = np.random.default_rng(31)
    n_rows, nnz = 180, 3000
    if skew:  # a few hub rows spanning many bands
        rows = np.sort(np.concatenate([
            rng.integers(0, n_rows, 1000), rng.integers(0, 3, 2000),
        ])).astype(np.int32)
    else:
        rows = np.sort(rng.integers(0, n_rows, nnz)).astype(np.int32)
    cols = rng.integers(0, n_rows, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((n_rows, 8)).astype(np.float32)

    t = plan_edgecut_coo(rows, cols, vals, n_rows, d=8)
    assert t is not None and isinstance(t[0], EdgeCutBands)
    assert t[0].local_rows.shape == t[1].shape == t[2].shape
    import jax.numpy as jnp

    out = np.asarray(spmm(t[0].device(), jnp.asarray(t[1]), jnp.asarray(t[2]),
                          jnp.asarray(x), n_rows=n_rows))
    np.testing.assert_allclose(out, _oracle(rows, cols, vals, x, n_rows),
                               rtol=2e-5, atol=2e-5)


def test_edgecut_declines_small():
    from cleora_tpu.ops.spmm import plan_edgecut_coo

    rows, cols, vals = _random_coo(50, 100, seed=1)
    assert plan_edgecut_coo(rows, cols, vals, 50, d=8) is None


def test_embed_loop_accepts_edgecut(tiny_chunks):
    """The fused loop runs the EdgeCutBands pytree; parity with flat 1-D."""
    from cleora_tpu.ops.loop import embed_loop
    from cleora_tpu.ops.spmm import plan_edgecut_coo

    rng = np.random.default_rng(41)
    n_rows, nnz = 150, 3000
    rows = np.sort(np.concatenate([
        rng.integers(0, n_rows, 2200), rng.integers(0, 4, 800),
    ])).astype(np.int32)
    cols = rng.integers(0, n_rows, nnz).astype(np.int32)
    deg = np.bincount(rows, minlength=n_rows).astype(np.float64)
    vals = (1.0 / np.maximum(deg, 1.0))[rows].astype(np.float32)
    x0 = rng.standard_normal((n_rows, 8)).astype(np.float32)
    import jax.numpy as jnp

    t = plan_edgecut_coo(rows, cols, vals, n_rows, d=8)
    out_e = np.asarray(embed_loop(
        t[0].device(), jnp.asarray(t[1]), jnp.asarray(t[2]), jnp.asarray(x0),
        n_rows=n_rows, num_iterations=4, normalization="l2", do_whiten=True,
    ))
    f = pad_coo(rows, cols, vals, n_rows)
    out_f = np.asarray(embed_loop(
        *(jnp.asarray(a) for a in f), jnp.asarray(x0),
        n_rows=n_rows, num_iterations=4, normalization="l2", do_whiten=True,
    ))
    np.testing.assert_allclose(out_e @ out_e.T, out_f @ out_f.T, atol=1e-3)


def test_embed_edgecut_end_to_end(tiny_chunks, monkeypatch):
    """embed() on a skewed graph with ELL declined routes through
    EdgeCutBands and matches the forced 1-D layout."""
    import cleora_tpu.ops.spmm_ell as se
    from cleora_tpu import SparseMatrix, embed
    from cleora_tpu.ops.spmm import EdgeCutBands

    monkeypatch.setattr(se, "plan_ell", lambda *a, **k: None)
    rng = np.random.default_rng(17)
    lines = [f"a{(rng.zipf(1.4) - 1) % 60} a{rng.integers(0, 60)}"
             for _ in range(1200)]
    g1 = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::a")
    g2 = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::a")
    # exact shapes pinned: canonical is the round-4 embed() default and
    # would change the device-cache key this test inspects
    e_c = embed(g1, feature_dim=16, num_iterations=5, whiten=False,
                canonical_shapes=False)
    cached = g1._device_cache[("coo", "left", 16, False)]
    assert isinstance(cached[0], EdgeCutBands)  # skew -> edge-cut engaged
    g2._device_cache[("coo", "left", 16, False)] = g2._device_coo("left")
    e_f = embed(g2, feature_dim=16, num_iterations=5, whiten=False,
                canonical_shapes=False)
    np.testing.assert_allclose(e_c, e_f, rtol=2e-5, atol=2e-5)


def test_edgecut_declines_on_hub_plus_sparse_tail(tiny_chunks):
    """A hub band followed by a long sparse tail inflates band_height (row
    SPAN, including gap rows); the ys/slot combine buffers are
    (n_bands·band_height, D) and must stay bounded — the planner declines
    rather than planning a buffer far larger than the embedding itself."""
    from cleora_tpu.ops.spmm import plan_edgecut_coo

    n_rows = 20_000
    # 960 edges on row 0 (hub), then one edge each on rows spread over the
    # whole id range: the second band spans ~n_rows rows
    tail_rows = np.linspace(1, n_rows - 1, 64).astype(np.int32)
    rows = np.sort(np.concatenate([
        np.zeros(960, dtype=np.int32), tail_rows,
    ]))
    cols = np.zeros(rows.shape[0], dtype=np.int32)
    vals = np.ones(rows.shape[0], dtype=np.float32)
    assert plan_edgecut_coo(rows, cols, vals, n_rows, d=16) is None
