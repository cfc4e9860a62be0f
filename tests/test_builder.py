"""Graph builder parity tests against the sequential oracle (tests/oracle.py),
which mirrors the reference buffer/reducer loop
(/root/reference/src/sparse_matrix_builder.rs) literally.
"""

import random

import numpy as np
import pytest

from cleora_tpu.graph.builder import build_graph

from oracle import oracle_build


def assert_matches_oracle(lines, columns, trim=16):
    o = oracle_build(lines, columns, trim)
    g = build_graph(lines, columns, trim)
    assert g.entity_ids == o["entity_ids"]
    assert np.array_equal(g.column_ids, o["column_ids"])
    assert np.allclose(g.row_sums, o["row_sums"], rtol=1e-6)
    assert np.array_equal(g.indptr, o["indptr"])
    assert np.array_equal(g.indices, o["indices"])
    assert np.allclose(g.left_vals, o["left_vals"], rtol=1e-5, atol=1e-7)
    assert np.allclose(g.sym_vals, o["sym_vals"], rtol=1e-5, atol=1e-7)
    return g


def test_reflexive_pairs():
    assert_matches_oracle(["a b", "b c", "c a", "a d"], "complex::reflexive::node")


def test_user_product_bipartite():
    g = assert_matches_oracle(
        ["u1\tp1 p2", "u2\tp2 p3", "u1\tp3"], "user complex::product"
    )
    # bipartite: user rows only reference products and vice versa
    mask_u = g.column_ids == 0
    assert mask_u.sum() == 2


def test_noncomplex_takes_first_token_only():
    # reference: non-complex columns use .first() (src/entity.rs:96)
    assert_matches_oracle(["a extra\tb"], "user complex::product")


def test_duplicate_entities_within_hyperedge():
    assert_matches_oracle(["a a b", "b b b"], "complex::reflexive::node")


def test_malformed_lines_skipped():
    with pytest.warns(UserWarning, match="Wrong number of columns"):
        g = build_graph(["a\tb", "onlyonecol_nocomma_notab", "c\td"], "x y")
    assert g.num_entities == 4


def test_left_markov_row_stochastic_when_untrimmed():
    random.seed(3)
    lines = [f"n{random.randint(0, 49)} n{random.randint(0, 49)}" for _ in range(400)]
    g = build_graph(lines, "complex::reflexive::node")
    n = g.num_entities
    rowsum = np.zeros(n)
    rows = np.repeat(np.arange(n), np.diff(g.indptr))
    np.add.at(rowsum, rows, g.left_vals.astype(np.float64))
    assert np.allclose(rowsum, 1.0, atol=1e-5)


def test_random_reflexive_matches_oracle():
    random.seed(2137)
    ents = [f"e{i}" for i in range(100)]
    lines = [
        " ".join(random.choice(ents) for _ in range(random.randint(2, 5)))
        for _ in range(500)
    ]
    assert_matches_oracle(lines, "complex::reflexive::entity_id")


def test_random_two_column_matches_oracle():
    random.seed(42)
    lines = [
        f"a{random.randint(0, 50)}\t"
        + " ".join(f"b{random.randint(0, 80)}" for _ in range(random.randint(1, 4)))
        for _ in range(500)
    ]
    assert_matches_oracle(lines, "complex::entity_a complex::entity_b")


def test_trimming_matches_oracle():
    random.seed(9)
    lines = [
        " ".join(f"n{random.randint(0, 60)}" for _ in range(30)) for _ in range(25)
    ] + ["n1 n2 n3"]
    assert_matches_oracle(lines, "complex::reflexive::node", trim=5)


def test_trimming_bipartite_matches_oracle():
    random.seed(11)
    lines = [
        f"u{random.randint(0, 10)}\t"
        + " ".join(f"p{random.randint(0, 200)}" for _ in range(random.randint(15, 40)))
        for _ in range(60)
    ]
    assert_matches_oracle(lines, "user complex::product", trim=16)


def test_trimming_drops_low_low_pairs():
    # one huge clique: with trim_n=2 the kept pairs are hi×hi, hi×lo, lo×hi
    nodes = [f"n{i}" for i in range(10)]
    g = build_graph([" ".join(nodes)], "complex::reflexive::node", hyperedge_trim_n=2)
    # full clique would give 10*10=100 directed entries; trimming keeps
    # 2*10 + 8*2 = 36 ordered pairs, each inserted in both directions and deduped
    full = build_graph([" ".join(nodes)], "complex::reflexive::node", hyperedge_trim_n=16)
    assert g.num_edges < full.num_edges


def test_entity_registration_order_is_first_seen():
    g = build_graph(["b a", "c a", "d b"], "complex::reflexive::node")
    assert g.entity_ids == ["b", "a", "c", "d"]


def test_build_graph_pairs_matches_lines():
    from cleora_tpu import SparseMatrix

    rng = np.random.default_rng(8)
    src = rng.integers(0, 500, 4000)
    dst = rng.integers(0, 500, 4000)
    g_arr = SparseMatrix.from_edge_arrays(src, dst)
    lines = [f"{a} {b}" for a, b in zip(src, dst)]
    g_str = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
    assert g_arr.entity_ids == g_str.entity_ids
    assert np.array_equal(g_arr.data.entity_hashes, g_str.data.entity_hashes)
    assert np.array_equal(g_arr.data.indptr, g_str.data.indptr)
    assert np.array_equal(g_arr.data.indices, g_str.data.indices)
    assert np.allclose(g_arr.data.left_vals, g_str.data.left_vals, atol=1e-6)
    assert np.allclose(g_arr.data.sym_vals, g_str.data.sym_vals, atol=1e-6)


def test_build_graph_pairs_validation():
    from cleora_tpu import SparseMatrix

    with pytest.raises(ValueError, match="single reflexive"):
        SparseMatrix.from_edge_arrays([0], [1], columns="a b")
    with pytest.raises(ValueError, match="equal length"):
        SparseMatrix.from_edge_arrays([0, 1], [1])
    with pytest.raises(ValueError, match="No valid"):
        SparseMatrix.from_edge_arrays([], [])
