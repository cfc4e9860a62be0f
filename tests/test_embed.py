"""embed() and advanced-mode tests, including parity vs the host oracle loop."""

import numpy as np
import pytest

import cleora_tpu as ct
from cleora_tpu import SparseMatrix


def make_graph(n=60, m=400, seed=5):
    import random

    random.seed(seed)
    lines = [f"n{random.randint(0, n - 1)} n{random.randint(0, n - 1)}" for _ in range(m)]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")


@pytest.fixture(scope="module")
def graph():
    return make_graph()


def host_loop(graph, dim, iters, propagation="left", normalization="l2",
              whiten=True, residual_weight=0.0, x0=None):
    adj = ct._to_scipy_sparse(graph, propagation)
    x = x0 if x0 is not None else graph.initialize_deterministically(dim, 0)
    x = x.astype(np.float32)
    for _ in range(iters):
        y = (adj @ x).astype(np.float32)
        if residual_weight > 0:
            y = (1 - residual_weight) * y + residual_weight * x
        x = ct._postprocess_iteration(y, normalization, whiten)
    return x


def gram_close(a, b, tol=2e-2):
    ga, gb = a @ a.T, b @ b.T
    scale = max(np.abs(gb).max(), 1e-9)
    return np.abs(ga - gb).max() / scale < tol


def test_embed_no_whiten_matches_host(graph):
    out = ct.embed(graph, feature_dim=16, num_iterations=6, whiten=False)
    expected = host_loop(graph, 16, 6, whiten=False)
    assert np.allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_embed_whiten_gram_parity(graph):
    out = ct.embed(graph, feature_dim=16, num_iterations=4)
    expected = host_loop(graph, 16, 4, whiten=True)
    assert gram_close(out, expected)


def test_embed_symmetric_propagation(graph):
    out = ct.embed(graph, feature_dim=16, num_iterations=3,
                   propagation="symmetric", whiten=False)
    expected = host_loop(graph, 16, 3, propagation="symmetric", whiten=False)
    assert np.allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_embed_l1_and_none_normalization(graph):
    for norm in ("l1", "none"):
        out = ct.embed(graph, feature_dim=8, num_iterations=3,
                       normalization=norm, whiten=False)
        expected = host_loop(graph, 8, 3, normalization=norm, whiten=False)
        assert np.allclose(out, expected, rtol=1e-3, atol=1e-4), norm


def test_embed_spectral_normalization(graph):
    out = ct.embed(graph, feature_dim=8, num_iterations=2,
                   normalization="spectral", whiten=False)
    expected = host_loop(graph, 8, 2, normalization="spectral", whiten=False)
    assert gram_close(out, expected)


def test_embed_residual(graph):
    out = ct.embed(graph, feature_dim=8, num_iterations=4,
                   residual_weight=0.3, whiten=False)
    expected = host_loop(graph, 8, 4, residual_weight=0.3, whiten=False)
    assert np.allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_embed_initial_embeddings(graph):
    x0 = np.random.default_rng(0).standard_normal(
        (graph.num_entities, 12)
    ).astype(np.float32)
    out = ct.embed(graph, num_iterations=3, initial_embeddings=x0, whiten=False)
    expected = host_loop(graph, 12, 3, whiten=False, x0=x0)
    assert np.allclose(out, expected, rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError, match="initial_embeddings has"):
        ct.embed(graph, initial_embeddings=np.zeros((3, 4), dtype=np.float32))


def test_embed_callback(graph):
    seen = []
    ct.embed(graph, feature_dim=8, num_iterations=3, whiten=False,
             callback=lambda i, e: seen.append((i, e.shape)))
    assert [s[0] for s in seen] == [0, 1, 2]
    assert all(s[1] == (graph.num_entities, 8) for s in seen)


def test_embed_callback_matches_fused(graph):
    outs = []
    cb_final = ct.embed(graph, feature_dim=8, num_iterations=4, whiten=False,
                        callback=lambda i, e: outs.append(e))
    fused = ct.embed(graph, feature_dim=8, num_iterations=4, whiten=False)
    assert np.allclose(cb_final, fused, rtol=1e-5, atol=1e-6)


def test_embed_convergence(graph):
    out = ct.embed(graph, feature_dim=8, num_iterations=200, whiten=False,
                   convergence_threshold=1e-4)
    # converged result: one more iteration barely moves it
    adj = ct._to_scipy_sparse(graph, "left")
    y = (adj @ out).astype(np.float32)
    y = ct._normalize(y, "l2")
    assert ct._compute_rmse(y, out) < 5e-4


def test_embed_num_iterations_auto(graph):
    out = ct.embed(graph, feature_dim=8, num_iterations="auto", whiten=False)
    expected = ct.embed(graph, feature_dim=8, num_iterations=40, whiten=False)
    assert np.array_equal(out, expected)
    with pytest.raises(ValueError, match="num_iterations must be an int"):
        ct.embed(graph, num_iterations="banana")


def test_embed_validation(graph):
    with pytest.raises(ValueError, match="Unknown propagation"):
        ct.embed(graph, propagation="banana")
    with pytest.raises(ValueError, match="Unknown normalization"):
        ct.embed(graph, normalization="banana")


def test_whiten_embeddings_host():
    x = np.random.default_rng(1).standard_normal((300, 8)).astype(np.float32) * 5 + 2
    w = ct.whiten_embeddings(x)
    cov = np.cov(w, rowvar=False)
    assert np.allclose(cov, np.eye(8), atol=1e-2)
    w4 = ct.whiten_embeddings(x, n_components=4)
    assert w4.shape == (300, 4)
    tiny = np.ones((1, 4), dtype=np.float32)
    assert np.array_equal(ct.whiten_embeddings(tiny), tiny)


def test_embed_multiscale(graph):
    out = ct.embed_multiscale(graph, feature_dim=8, scales=[2, 4], whiten=False)
    assert out.shape == (graph.num_entities, 16)
    assert np.allclose(
        out[:, :8], ct.embed(graph, feature_dim=8, num_iterations=2, whiten=False),
        rtol=1e-4, atol=1e-5,
    )
    with pytest.raises(ValueError, match="scales"):
        ct.embed_multiscale(graph, scales=[])


def test_embed_with_node_features(graph):
    feats = {"n0": np.ones(8, dtype=np.float32)}
    out = ct.embed_with_node_features(graph, feats, num_iterations=2)
    assert out.shape == (graph.num_entities, 8)
    with pytest.raises(ValueError, match="non-empty"):
        ct.embed_with_node_features(graph, {})


def test_embed_with_attention(graph):
    out = ct.embed_with_attention(graph, feature_dim=8, num_iterations=3, whiten=False)
    assert out.shape == (graph.num_entities, 8)
    assert np.isfinite(out).all()
    with pytest.raises(ValueError, match="attention_temperature"):
        ct.embed_with_attention(graph, attention_temperature=0)


def test_embed_weighted():
    edges = [("a b", 1.0), ("b c", 2.0), ("c a", 1.0)]
    g, emb = ct.embed_weighted(edges, "complex::reflexive::node",
                               feature_dim=8, num_iterations=3, whiten=False)
    assert emb.shape == (3, 8)
    assert np.isfinite(emb).all()


def test_embed_directed():
    edges = ["a b", "b c", "c a"]
    g, emb = ct.embed_directed(edges, "complex::reflexive::node",
                               feature_dim=8, num_iterations=3, whiten=False)
    assert emb.shape == (3, 8)


def test_update_and_remove_edges():
    g = ct.update_graph(["a b"], ["b c"], "complex::reflexive::node")
    assert g.num_entities == 3
    g2 = ct.remove_edges(["a b", "b c"], ["b c"], "complex::reflexive::node")
    assert g2.num_entities == 2
    with pytest.raises(ValueError, match="Cannot remove all edges"):
        ct.remove_edges(["a b"], ["a b"], "complex::reflexive::node")


def test_embed_inductive(graph):
    emb = ct.embed(graph, feature_dim=8, num_iterations=2, whiten=False)
    edges = [f"n{i} n{i + 1}" for i in range(59)]
    g2, e2 = ct.embed_inductive(graph, emb, edges, ["n0 newnode"],
                                "complex::reflexive::node", num_iterations=2)
    assert "newnode" in g2.entity_ids
    assert e2.shape[0] == g2.num_entities


def test_embed_streaming():
    batches = [["a b", "b c"], ["c d"]]
    calls = []
    g, emb = ct.embed_streaming(
        batches, "complex::reflexive::node", feature_dim=8, num_iterations=2,
        batch_callback=lambda i, g, e: calls.append(i),
    )
    assert calls == [0, 1]
    assert g.num_entities == 4


def test_predict_links(graph):
    emb = ct.embed(graph, feature_dim=8, num_iterations=3, whiten=False)
    preds = ct.predict_links(graph, emb, top_k=5)
    assert len(preds) <= 5
    for p in preds:
        assert set(p) == {"source", "target", "score"}


def test_find_most_similar(graph):
    emb = ct.embed(graph, feature_dim=8, num_iterations=3, whiten=False)
    res = ct.find_most_similar(graph, emb, graph.entity_ids[0], top_k=3)
    assert len(res) == 3
    assert res[0]["entity_id"] != graph.entity_ids[0]  # excluded self


def test_cosine_similarity():
    a = np.array([1.0, 0.0])
    assert ct.cosine_similarity(a, a) == pytest.approx(1.0)
    assert ct.cosine_similarity(a, np.array([0.0, 1.0])) == pytest.approx(0.0)
    assert ct.cosine_similarity(a, np.zeros(2)) == 0.0


def test_supervised_refine(graph):
    emb = ct.embed(graph, feature_dim=8, num_iterations=2, whiten=False)
    losses = []
    refined = ct.supervised_refine(
        graph, emb, [("n0", "n1")], num_epochs=3,
        callback=lambda e, l: losses.append(l),
    )
    assert refined.shape == emb.shape
    assert len(losses) <= 3
    sim_before = ct.cosine_similarity(
        emb[graph.get_entity_index("n0")], emb[graph.get_entity_index("n1")]
    )
    sim_after = ct.cosine_similarity(
        refined[graph.get_entity_index("n0")], refined[graph.get_entity_index("n1")]
    )
    assert sim_after >= sim_before - 1e-6


def test_embed_edge_features(graph):
    ef = {"n0 n1": np.ones(4, dtype=np.float32)}
    out = ct.embed_edge_features(graph, ef, feature_dim=8, num_iterations=2,
                                 whiten=False)
    assert out.shape == (graph.num_entities, 12)  # concat 8 + 4
    out_m = ct.embed_edge_features(graph, ef, feature_dim=8, num_iterations=2,
                                   combine="mean", whiten=False)
    assert out_m.shape == (graph.num_entities, 4)


def test_cleora_embedder(graph):
    edges = ["a b", "b c", "c a"]
    emb = ct.CleoraEmbedder(feature_dim=8, num_iterations=3, whiten=False)
    out = emb.fit_transform(edges)
    assert out.shape == (3, 8)
    sub = emb.transform(["b c"])
    assert sub.shape == (2, 8)
    params = emb.get_params()
    assert params["feature_dim"] == 8
    emb.set_params(feature_dim=4)
    assert emb.feature_dim == 4
    with pytest.raises(ValueError, match="Invalid parameter"):
        emb.set_params(banana=1)
    e2 = ct.CleoraEmbedder()
    with pytest.raises(RuntimeError, match="fit"):
        e2.transform()


def test_propagate_gpu_wrapper(graph):
    x = graph.initialize_deterministically(8)
    out = ct.propagate_gpu(graph, x, num_iterations=2, whiten=False)
    expected = host_loop(graph, 8, 2, whiten=False, x0=x)
    assert np.allclose(out, expected, rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError, match="GPU propagation supports"):
        ct.propagate_gpu(graph, x, normalization="spectral")


def test_embed_using_baseline_cleora(graph):
    out = ct.embed_using_baseline_cleora(graph, 8, 2)
    assert out.shape == (graph.num_entities, 8)


def test_embed_dim_sharded(graph):
    import cleora_tpu as ct

    out = ct.embed_dim_sharded(graph, feature_dim=32, slice_dim=16,
                               num_iterations=4)
    assert out.shape == (graph.num_entities, 32)
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # slice seeding reproduces the full-dim deterministic init exactly
    full_init = graph.initialize_deterministically(32, 0)
    part0 = graph.initialize_deterministically(16, 0)
    part1 = graph.initialize_deterministically(16, 16)
    assert np.array_equal(full_init, np.concatenate([part0, part1], axis=1))
    with pytest.raises(ValueError, match="multiple of slice_dim"):
        ct.embed_dim_sharded(graph, feature_dim=30, slice_dim=16)
    calls = []
    ct.embed_dim_sharded(graph, feature_dim=16, slice_dim=8,
                         num_iterations=2,
                         slice_callback=lambda k, e: calls.append(k))
    assert calls == [0, 1]


def test_embed_with_attention_matches_host_oracle(graph):
    """Device attention loop vs a scipy re-statement of the reference
    algorithm (pycleora/__init__.py:206-276), whiten off for elementwise
    comparability."""
    import cleora_tpu as ct
    from scipy.sparse import csr_matrix, diags

    T, iters, dim = 0.7, 5, 16
    ours = ct.embed_with_attention(
        graph, feature_dim=dim, num_iterations=iters,
        attention_temperature=T, whiten=False,
    )

    emb = graph.initialize_deterministically(dim, 0)
    emb = graph.left_markov_propagate(emb)
    emb = ct._normalize(emb, "l2")
    adj = ct._to_scipy_sparse(graph, "left")
    r, c = adj.nonzero()
    for _ in range(1, iters):
        normed = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-10
        )
        scores = np.sum(normed[r] * normed[c], axis=1) / T
        row_max = np.full(adj.shape[0], -np.inf)
        np.maximum.at(row_max, r, scores)
        row_max[row_max == -np.inf] = 0.0
        exp_scores = np.exp(scores - row_max[r])
        attn = csr_matrix((exp_scores, (r, c)), shape=adj.shape)
        attn = diags(
            1.0 / np.maximum(np.asarray(attn.sum(axis=1)).ravel(), 1e-10)
        ) @ attn
        weighted = attn.multiply(adj)
        weighted = diags(
            1.0 / np.maximum(np.asarray(weighted.sum(axis=1)).ravel(), 1e-10)
        ) @ weighted
        emb = (weighted @ emb).astype(np.float32)
        emb = ct._normalize(emb, "l2")

    assert np.allclose(ours, emb, atol=2e-4)


def test_embed_weighted_matches_host_oracle():
    """Device weighted loop vs a scipy restatement of the reference
    (pycleora/__init__.py:312-359), whiten off for elementwise compare."""
    import cleora_tpu as ct
    from scipy.sparse import diags

    rng = np.random.default_rng(2)
    ew = [(f"n{rng.integers(0, 20)} n{rng.integers(0, 20)}",
           float(rng.uniform(0.5, 3.0))) for _ in range(60)]
    g, ours = ct.embed_weighted(ew, "complex::reflexive::n", feature_dim=16,
                                num_iterations=4, whiten=False)

    adj = ct._to_scipy_sparse(g, "left").astype(np.float64)
    n = g.num_entities
    wd = np.ones(n)
    im = {e: i for i, e in enumerate(g.entity_ids)}
    for s, w in ew:
        for ent in s.strip().split():
            if ent in im:
                wd[im[ent]] = max(wd[im[ent]], w)
    weighted = diags(wd) @ adj
    weighted = diags(
        1.0 / np.maximum(np.asarray(weighted.sum(axis=1)).ravel(), 1e-10)
    ) @ weighted
    emb = g.initialize_deterministically(16, 0)
    for _ in range(4):
        emb = (weighted @ emb).astype(np.float32)
        emb = ct._normalize(emb, "l2")
    assert np.allclose(ours, emb, atol=2e-4)


def test_embed_directed_matches_host_oracle():
    """Device directed loop vs a scipy restatement of the reference
    (pycleora/__init__.py:362-410)."""
    import cleora_tpu as ct
    from scipy.sparse import csr_matrix, diags

    rng = np.random.default_rng(4)
    edges = [f"n{rng.integers(0, 15)} n{rng.integers(0, 15)}"
             for _ in range(50)]
    g, ours = ct.embed_directed(edges, "complex::reflexive::n",
                                feature_dim=16, num_iterations=4,
                                whiten=False)

    pairs = set()
    for e in edges:
        parts = e.strip().split()
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pairs.add((parts[i], parts[j]))
    r, c, v, n, _ = g.to_sparse_csr("left")
    keep = [
        (int(ri), int(ci), float(vi)) for ri, ci, vi in zip(r, c, v)
        if (g.entity_ids[int(ri)], g.entity_ids[int(ci)]) in pairs
    ]
    adj = csr_matrix(
        ([k[2] for k in keep], ([k[0] for k in keep], [k[1] for k in keep])),
        shape=(n, n),
    )
    adj = diags(
        1.0 / np.maximum(np.asarray(adj.sum(axis=1)).ravel(), 1e-10)
    ) @ adj
    emb = g.initialize_deterministically(16, 0)
    for _ in range(4):
        emb = (adj @ emb).astype(np.float32)
        emb = ct._normalize(emb, "l2")
    assert np.allclose(ours, emb, atol=2e-4)


def test_embed_bfloat16_storage(graph):
    import cleora_tpu as ct

    f32 = ct.embed(graph, feature_dim=16, num_iterations=6, whiten=False)
    bf16 = ct.embed(graph, feature_dim=16, num_iterations=6, whiten=False,
                    dtype="bfloat16")
    assert bf16.dtype == np.float32  # host return is always f32
    assert np.allclose(np.linalg.norm(bf16, axis=1), 1.0, atol=2e-2)
    # bf16 state loses ~8 mantissa bits per step; direction is preserved
    cos = np.sum(f32 * bf16, axis=1) / (
        np.linalg.norm(f32, axis=1) * np.linalg.norm(bf16, axis=1)
    )
    assert np.min(cos) > 0.98
    wh = ct.embed(graph, feature_dim=16, num_iterations=4, dtype="bfloat16")
    assert np.isfinite(wh).all()
    with pytest.raises(ValueError, match="Unknown dtype"):
        ct.embed(graph, dtype="float64")


def test_embed_callback_matches_fused_ell(monkeypatch):
    """Callback path on a sliced-ELL layout: the state stays in relabeled
    row space across iterations and every host-visible view (callback args,
    final result) is back in original entity order."""
    import importlib

    from cleora_tpu.ops.spmm_ell import EllPlan

    spmm_mod = importlib.import_module("cleora_tpu.ops.spmm")

    monkeypatch.setattr(
        spmm_mod, "_chunk_edges_for", lambda n, d, table_rows=None, **kw: 64
    )
    g = make_graph(n=50, m=600, seed=8)
    rows, _, _ = g._device_coo("left", banded_dim=8)
    assert isinstance(rows, EllPlan)  # the layout under test
    outs = []
    cb = ct.embed(g, feature_dim=8, num_iterations=4, whiten=False,
                  callback=lambda i, e: outs.append(e.copy()))
    fused = ct.embed(g, feature_dim=8, num_iterations=4, whiten=False)
    assert np.allclose(cb, fused, rtol=1e-5, atol=1e-6)
    assert np.allclose(outs[-1], fused, rtol=1e-5, atol=1e-6)


def test_residual_weight_one_reference_path_semantics(graph):
    """The reference's two residual behaviors (ops/loop.py:
    effective_residual_weight): the Rust fast path ignores w >= 1, while the
    Python slow path (whiten=True default) applies it — at w=1 each
    iteration reduces to normalize+whiten of the previous state."""
    base = ct.embed(graph, feature_dim=8, num_iterations=3, whiten=False)
    fast_w1 = ct.embed(graph, feature_dim=8, num_iterations=3, whiten=False,
                       residual_weight=1.0)
    assert np.allclose(base, fast_w1)

    out = ct.embed(graph, feature_dim=8, num_iterations=3, whiten=True,
                   residual_weight=1.0)
    x = graph.initialize_deterministically(8, 0).astype(np.float64)
    for _ in range(3):
        x = x / np.maximum(
            np.linalg.norm(x, axis=1, keepdims=True), 1e-10)
        x = ct.whiten_embeddings(x)
    assert np.allclose(out @ out.T, x @ x.T, atol=5e-3)


def test_from_iterator_rejects_embedded_newline():
    # the native path would split it into two lines; the numpy fallback /
    # reference would embed '\n' into an entity id — both silent
    with pytest.raises(ValueError, match="single lines"):
        SparseMatrix.from_iterator(
            iter(["a b\nc d"]), "complex::reflexive::node")


def test_embed_dim_sharded_rejects_initial_embeddings(graph):
    with pytest.raises(ValueError, match="initial_embeddings"):
        ct.embed_dim_sharded(graph, feature_dim=16, slice_dim=8,
                             initial_embeddings=np.zeros((7, 16), np.float32))
