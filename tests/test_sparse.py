"""SparseMatrix API-surface parity tests (reference: src/lib.rs pymethods)."""

import pickle

import numpy as np
import pytest

from cleora_tpu import SparseMatrix


LINES = ["a b", "b c", "c a", "a d", "d e"]


@pytest.fixture
def graph():
    return SparseMatrix.from_iterator(iter(LINES), "complex::reflexive::node")


def test_direct_construction_rejected():
    with pytest.raises(ValueError, match="cannot be constructed directly"):
        SparseMatrix("x")
    SparseMatrix()  # empty OK (unpickling)


def test_repr_and_len(graph):
    assert repr(graph) == (
        f"SparseMatrix(entities={graph.num_entities}, edges={graph.num_edges}, "
        "columns=('node', 'node'))"
    )
    assert len(graph) == graph.num_entities == 5


def test_entity_ids_order(graph):
    assert graph.entity_ids == ["a", "b", "c", "d", "e"]


def test_get_entity_index(graph):
    assert graph.get_entity_index("c") == 2
    with pytest.raises(ValueError, match="Entity 'zzz' not found"):
        graph.get_entity_index("zzz")
    assert graph.get_entity_indices(["b", "a"]) == [1, 0]
    with pytest.raises(ValueError, match="not found"):
        graph.get_entity_indices(["a", "nope"])


def test_entity_degrees(graph):
    deg = graph.entity_degrees
    assert deg.shape == (5,)
    assert deg.dtype == np.float32
    # "a" appears in 3 pair hyperedges; reflexive A=B=[a,b] gives each node
    # row_sum += 1/2 from each side = 1.0 per hyperedge
    assert deg[graph.get_entity_index("a")] == pytest.approx(3.0)


def test_column_mask(graph):
    # Reference quirk parity (src/lib.rs:175-198): for a reflexive graph both
    # descriptor names are equal, the name→id map keeps the LAST (virtual id 1),
    # but entities register under column 0 — so the mask is all-False.
    mask = graph.get_entity_column_mask("node")
    assert not mask.any()
    with pytest.raises(ValueError, match="Column name 'missing' not found"):
        graph.get_entity_column_mask("missing")


def test_column_mask_bipartite():
    g = SparseMatrix.from_iterator(
        iter(["u1\tp1 p2", "u2\tp1"]), "user complex::product"
    )
    um = g.get_entity_column_mask("user")
    pm = g.get_entity_column_mask("product")
    assert um.sum() == 2 and pm.sum() == 2
    assert not (um & pm).any()


def test_get_neighbors(graph):
    # Reference parity: reflexive cartesian products include self-pairs
    # (src/sparse_matrix_builder.rs:209-215 has no a==b skip), so "a" is its
    # own neighbor.
    nbrs = dict(graph.get_neighbors("a"))
    assert set(nbrs) == {"a", "b", "c", "d"}


def test_to_sparse_csr(graph):
    rows, cols, vals, n, m = graph.to_sparse_csr()
    assert n == m == 5
    assert rows.dtype == np.uint32 and cols.dtype == np.uint32
    assert vals.dtype == np.float32
    assert rows.shape == cols.shape == vals.shape
    assert np.all(np.diff(rows.astype(np.int64)) >= 0)  # row-sorted
    with pytest.raises(ValueError, match="Unknown markov_type"):
        graph.to_sparse_csr("banana")
    _, _, sym_vals, _, _ = graph.to_sparse_csr("symmetric")
    assert not np.array_equal(vals, sym_vals)


def test_propagate_shape_check(graph):
    with pytest.raises(ValueError, match="rows but graph has"):
        graph.left_markov_propagate(np.zeros((3, 4), dtype=np.float32))


def test_propagate_matches_scipy(graph):
    import cleora_tpu as ct

    x = graph.initialize_deterministically(16, 0)
    for mt, fn in [
        ("left", graph.left_markov_propagate),
        ("symmetric", graph.symmetric_markov_propagate),
    ]:
        adj = ct._to_scipy_sparse(graph, mt)
        assert np.allclose(fn(x), adj @ x, rtol=1e-5, atol=1e-6)


def test_initialize_deterministically(graph):
    a = graph.initialize_deterministically(8)
    b = graph.initialize_deterministically(8, 0)
    assert np.array_equal(a, b)
    assert a.shape == (5, 8)
    assert a.dtype == np.float32


def test_l2_normalize_method(graph):
    x = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    out = graph.l2_normalize(x)
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)


def test_pickle_roundtrip(graph):
    blob = pickle.dumps(graph)
    g2 = pickle.loads(blob)
    assert g2.entity_ids == graph.entity_ids
    assert g2.num_edges == graph.num_edges
    x = graph.initialize_deterministically(8)
    assert np.array_equal(g2.initialize_deterministically(8), x)
    assert np.allclose(
        g2.left_markov_propagate(x), graph.left_markov_propagate(x), rtol=1e-6
    )


def test_embed_fast_deterministic(graph):
    a = graph.embed_fast(16, 5)
    b = graph.embed_fast(16, 5)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def test_embed_fast_invalid_propagation(graph):
    with pytest.raises(ValueError, match="Unknown propagation"):
        graph.embed_fast(8, 2, propagation="banana")


def test_from_files(tmp_path):
    p = tmp_path / "edges.tsv"
    p.write_text("a b\nb c\n\nc a\n")
    g = SparseMatrix.from_files([str(p)], "complex::reflexive::node")
    assert g.num_entities == 3
    with pytest.raises(ValueError, match="Unsupported file format"):
        SparseMatrix.from_files(["x.json"], "complex::reflexive::node")
    with pytest.raises(ValueError, match="At least one file path"):
        SparseMatrix.from_files([], "complex::reflexive::node")


def test_from_iterator_rejects_nonstring():
    with pytest.raises(ValueError, match="must be strings"):
        SparseMatrix.from_iterator(iter([123]), "complex::reflexive::node")
