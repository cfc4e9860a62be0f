"""Metrics parity vs the reference implementation (imported standalone)."""

import importlib.util

import numpy as np
import pytest

import cleora_tpu.metrics as m


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "ref_metrics", "/root/reference/pycleora/metrics.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def setup():
    from cleora_tpu import SparseMatrix, embed
    from cleora_tpu.datasets import load_dataset

    d = load_dataset("karate_club")
    g = SparseMatrix.from_iterator(iter(d["edges"]), d["columns"])
    emb = embed(g, feature_dim=32, num_iterations=8)
    return g, emb, d["labels"], d["edges"]


def test_node_classification_parity(ref, setup):
    g, emb, labels, _ = setup
    ours = m.node_classification_scores(g, emb, labels)
    theirs = ref.node_classification_scores(g, emb, labels)
    assert ours == theirs


def test_link_prediction_parity(ref, setup):
    # batched f32 row-sums differ from the reference's per-pair BLAS dot in
    # the last ulp; ranks/AUC still match, score means to ~1e-7
    g, emb, _, edges = setup
    test_edges = [tuple(e.split()) for e in edges[:30]]
    ours = m.link_prediction_scores(g, emb, test_edges)
    theirs = ref.link_prediction_scores(g, emb, test_edges)
    for k in ours:
        assert ours[k] == pytest.approx(theirs[k], rel=1e-5, abs=1e-6), k


def test_link_prediction_explicit_negatives(ref, setup):
    g, emb, _, edges = setup
    test_edges = [tuple(e.split()) for e in edges[:20]]
    negs = [("0", "25"), ("1", "33"), ("4", "30")]
    ours = m.link_prediction_scores(g, emb, test_edges, negative_edges=negs)
    theirs = ref.link_prediction_scores(g, emb, test_edges, negative_edges=negs)
    for k in ours:
        assert ours[k] == pytest.approx(theirs[k], rel=1e-5, abs=1e-6), k


def test_clustering_scores_parity(ref, setup):
    g, emb, labels, _ = setup
    y = np.array([labels[eid] for eid in g.entity_ids])
    ours = m.clustering_scores(emb, y)
    theirs = ref.clustering_scores(emb, y)
    for k in ours:
        assert ours[k] == pytest.approx(theirs[k], rel=1e-9), k


def test_map_ndcg_parity(ref, setup):
    g, emb, _, edges = setup
    test_edges = [tuple(e.split()) for e in edges[40:60]]
    assert m.map_at_k(g, emb, test_edges) == pytest.approx(
        ref.map_at_k(g, emb, test_edges), rel=1e-12
    )
    assert m.ndcg_at_k(g, emb, test_edges) == pytest.approx(
        ref.ndcg_at_k(g, emb, test_edges), rel=1e-12
    )


def test_ari_parity(ref):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 4, 200)
    b = rng.integers(0, 5, 200)
    assert m.adjusted_rand_index(a, b) == pytest.approx(
        ref.adjusted_rand_index(a, b), rel=1e-12
    )
    assert m.adjusted_rand_index(a, a) == pytest.approx(1.0)


def test_silhouette_parity(ref, setup):
    g, emb, labels, _ = setup
    y = np.array([labels[eid] for eid in g.entity_ids])
    assert m.silhouette_score(emb, y) == pytest.approx(
        ref.silhouette_score(emb, y), abs=1e-5
    )


def test_cross_validate_parity(ref, setup):
    g, emb, labels, _ = setup
    ours = m.cross_validate(g, emb, labels, k_folds=3)
    theirs = ref.cross_validate(g, emb, labels, k_folds=3)
    for k in ours:
        assert ours[k] == pytest.approx(theirs[k], rel=1e-9), k


def test_validation_errors(setup):
    g, emb, labels, _ = setup
    with pytest.raises(ValueError, match="at least 4"):
        m.node_classification_scores(g, emb, {"0": 0})
    with pytest.raises(ValueError, match="No valid positive"):
        m.link_prediction_scores(g, emb, [("zz", "yy")])
    with pytest.raises(ValueError, match="k_folds"):
        m.cross_validate(g, emb, labels, k_folds=1)
