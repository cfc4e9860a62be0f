"""Classifier semantics tests (reference: pycleora/classify.py).

Gradient math runs in f32 on device (vs the reference's f64 numpy backprop),
so parity is at the semantics/quality level: identical splits, and accuracy
within tolerance of the reference implementation on karate_club.
"""

import importlib.util

import numpy as np
import pytest

import cleora_tpu.classify as cl


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "ref_classify", "/root/reference/pycleora/classify.py"
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
    return g, emb, d["labels"]


def test_label_propagation_matches_reference(ref, setup):
    g, _, labels = setup
    train = {eid: l for i, (eid, l) in enumerate(labels.items()) if i % 3 == 0}
    ours = cl.label_propagation(g, train)
    theirs = ref.label_propagation(g, train)
    same = sum(ours[e] == theirs[e] for e in ours)
    # f32-vs-f64 argmax can flip only near-exact ties
    assert same >= len(ours) - 1
    for eid in train:
        assert ours[eid] == train[eid]  # clamped


def test_label_propagation_empty():
    from cleora_tpu import SparseMatrix

    g = SparseMatrix.from_iterator(iter(["a b"]), "complex::reflexive::n")
    with pytest.raises(ValueError, match="non-empty"):
        cl.label_propagation(g, {})


def test_label_propagation_predict(ref, setup):
    g, emb, labels = setup
    ours = cl.label_propagation_predict(g, emb, labels)
    theirs = ref.label_propagation_predict(g, emb, labels)
    assert ours["train_size"] == theirs["train_size"]
    assert ours["test_size"] == theirs["test_size"]
    assert abs(ours["accuracy"] - theirs["accuracy"]) <= 0.3


def test_mlp_classify_quality(ref, setup):
    g, emb, labels = setup
    ours = cl.mlp_classify(g, emb, labels, num_epochs=60)
    theirs = ref.mlp_classify(g, emb, labels, num_epochs=60)
    assert ours["train_size"] == theirs["train_size"]
    assert ours["test_size"] == theirs["test_size"]
    assert ours["num_classes"] == theirs["num_classes"]
    assert set(ours) == set(theirs)
    assert ours["accuracy"] >= theirs["accuracy"] - 0.3


def test_mlp_validation(setup):
    g, emb, labels = setup
    with pytest.raises(ValueError, match="non-empty"):
        cl.mlp_classify(g, emb, {})
    with pytest.raises(ValueError, match="train_ratio"):
        cl.mlp_classify(g, emb, labels, train_ratio=1.5)
    with pytest.raises(ValueError, match="at least 4"):
        cl.mlp_classify(g, emb, {"0": 0, "1": 1})


def test_gcn_classify_quality(setup):
    g, emb, labels = setup
    out = cl.gcn_classify(g, emb, labels, num_epochs=60)
    assert set(out) == {
        "accuracy", "macro_f1", "num_classes", "train_size", "test_size",
        "num_layers", "hidden_dim",
    }
    # 7-sample test split on karate — coarse quality floor only
    assert out["accuracy"] >= 0.4
    assert out["num_layers"] == 2


def test_gcn_three_layers(setup):
    g, emb, labels = setup
    out = cl.gcn_classify(g, emb, labels, num_epochs=30, num_layers=3,
                          hidden_dim=16)
    assert out["num_layers"] == 3
    assert 0.0 <= out["accuracy"] <= 1.0


def test_mlp_hidden_dim_zero_is_linear_probe():
    """hidden_dim=0 runs a logistic-regression (single linear layer) probe
    — the BASELINE config-3 probe; must beat chance comfortably on a
    community dataset."""
    import numpy as np

    from cleora_tpu import SparseMatrix, embed
    from cleora_tpu.classify import mlp_classify
    from cleora_tpu.datasets import load_dataset

    d = load_dataset("cora")
    g = SparseMatrix.from_iterator(iter(d["edges"]), d["columns"])
    # whitened features: the linear probe relies on variance-equalized
    # inputs (raw L2-normalized rows leave it near chance at this lr)
    emb = embed(g, feature_dim=64, num_iterations=10, whiten=True)
    r = mlp_classify(g, emb, d["labels"], hidden_dim=0, num_epochs=100)
    n_classes = len(set(d["labels"].values()))
    assert r["accuracy"] > 2.0 / n_classes
    assert set(r) >= {"accuracy", "macro_f1"}
