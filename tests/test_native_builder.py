"""Native (C++) builder equivalence vs the numpy builder and the oracle."""

import numpy as np
import pytest

from cleora_tpu.graph.builder import build_graph
from cleora_tpu.graph.native import build_graph_native, native_available

from oracle import oracle_build

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native builder unavailable"
)


def _assert_same(a, b, atol=1e-6):
    assert a.entity_ids == b.entity_ids
    assert np.array_equal(a.entity_hashes, b.entity_hashes)
    assert np.array_equal(a.column_ids, b.column_ids)
    assert np.allclose(a.row_sums, b.row_sums, atol=atol)
    assert np.array_equal(a.indptr, b.indptr)
    assert np.array_equal(a.indices, b.indices)
    assert np.allclose(a.left_vals, b.left_vals, atol=atol)
    assert np.allclose(a.sym_vals, b.sym_vals, atol=atol)


CASES = [
    (["a b", "b c", "c a", "a d", "d e"], "complex::reflexive::node", 16),
    (["u1\tp1 p2", "u2\tp1", "u3\tp2 p3 p4"], "user complex::product", 16),
    (["a b c d e f", "b c", "a f"], "complex::reflexive::n", 3),  # trimming
    (["x, a b", "y, b c", "x, c"], "tag complex::item", 16),  # comma sep
    (["a b", "bad\tline\there", "b c"], "complex::reflexive::n", 16),  # skip
]


@pytest.mark.parametrize("lines,columns,trim", CASES)
def test_native_matches_numpy(lines, columns, trim):
    nat = build_graph_native(lines, columns, trim)
    ref = build_graph(lines, columns, trim)
    _assert_same(nat, ref)


@pytest.mark.parametrize("lines,columns,trim", CASES)
def test_native_matches_oracle(lines, columns, trim):
    nat = build_graph_native(lines, columns, trim)
    o = oracle_build(lines, columns, trim)
    assert nat.entity_ids == o["entity_ids"]
    assert np.allclose(nat.row_sums, o["row_sums"], atol=1e-5)
    assert np.array_equal(nat.indptr, o["indptr"])
    assert np.array_equal(nat.indices, o["indices"])
    assert np.allclose(nat.left_vals, o["left_vals"], atol=1e-5)
    assert np.allclose(nat.sym_vals, o["sym_vals"], atol=1e-5)


def test_native_random_graph():
    rng = np.random.default_rng(11)
    lines = [
        f"n{rng.integers(0, 200)} n{rng.integers(0, 200)} n{rng.integers(0, 200)}"
        for _ in range(2000)
    ]
    nat = build_graph_native(lines, "complex::reflexive::node", 16)
    ref = build_graph(lines, "complex::reflexive::node", 16)
    _assert_same(nat, ref)


def test_native_trimming_random():
    rng = np.random.default_rng(5)
    lines = [
        " ".join(f"e{rng.integers(0, 50)}" for _ in range(rng.integers(2, 40)))
        for _ in range(200)
    ]
    nat = build_graph_native(lines, "complex::reflexive::e", 8)
    ref = build_graph(lines, "complex::reflexive::e", 8)
    _assert_same(nat, ref, atol=1e-5)


def test_native_via_sparse_matrix():
    from cleora_tpu import SparseMatrix

    g = SparseMatrix.from_iterator(
        iter(["a b", "b c", "c a"]), "complex::reflexive::node"
    )
    assert g.entity_ids == ["a", "b", "c"]
    x = g.initialize_deterministically(8)
    assert np.isfinite(g.left_markov_propagate(x)).all()


def test_native_empty_error():
    with pytest.raises(ValueError, match="No valid"):
        build_graph_native([], "complex::reflexive::node")


def test_native_unicode():
    lines = ["café naïve", "naïve 日本語", "日本語 café"]
    nat = build_graph_native(lines, "complex::reflexive::word")
    ref = build_graph(lines, "complex::reflexive::word")
    _assert_same(nat, ref)


@pytest.mark.parametrize("seed,columns,fmt", [
    (21, "complex::reflexive::node", "space"),
    (22, "user complex::product", "tab"),
    (23, "a b", "tab"),                      # two simple columns
    (24, "complex::a complex::b", "tab"),    # both complex
    (25, "tag complex::item", "comma"),
])
def test_native_fuzz_column_specs(seed, columns, fmt):
    rng = np.random.default_rng(seed)
    lines = []
    for _ in range(600):
        left = " ".join(f"L{rng.integers(0, 40)}"
                        for _ in range(rng.integers(1, 5)))
        right = " ".join(f"R{rng.integers(0, 40)}"
                         for _ in range(rng.integers(1, 5)))
        if fmt == "space":
            lines.append(left)
        elif fmt == "tab":
            lines.append(f"{left}\t{right}")
        else:
            lines.append(f"{left}, {right}")
    nat = build_graph_native(lines, columns, 16)
    ref = build_graph(lines, columns, 16)
    _assert_same(nat, ref, atol=1e-5)


def test_invalid_utf8_lines_skipped(tmp_path):
    from cleora_tpu import SparseMatrix

    p = tmp_path / "bad.tsv"
    p.write_bytes(b"a b\n\xff\xfe bad\nb c\ncaf\xc3\xa9 d\n")
    g = SparseMatrix.from_files([str(p)], "complex::reflexive::n")
    assert g.entity_ids == ["a", "b", "c", "café", "d"]
    # numpy fallback behaves the same
    import os

    os.environ["CLEORA_TPU_NATIVE"] = "0"
    try:
        import cleora_tpu.native as nat

        nat._lib, nat._load_failed = None, False
        g2 = SparseMatrix.from_files([str(p)], "complex::reflexive::n")
        assert g2.entity_ids == g.entity_ids
    finally:
        os.environ.pop("CLEORA_TPU_NATIVE", None)
        nat._lib, nat._load_failed = None, False


def test_surrogate_and_overlong_utf8_skipped(tmp_path):
    """UTF-16 surrogates (ED A0-BF) and overlong forms (E0 80-9F, F0 80-8F,
    F4 90+) must be rejected by the native validator — Python's .decode
    raises on them, and one bad line must not abort the whole ingest."""
    from cleora_tpu import SparseMatrix

    p = tmp_path / "surr.tsv"
    p.write_bytes(
        b"a b\n"
        b"\xed\xa0\x80 c\n"      # UTF-16 surrogate D800
        b"\xe0\x80\xaf d\n"      # overlong 3-byte
        b"\xf0\x80\x80\xaf e\n"  # overlong 4-byte
        b"\xf4\x90\x80\x80 f\n"  # > U+10FFFF
        b"g h\n"
    )
    g = SparseMatrix.from_files([str(p)], "complex::reflexive::n")
    assert g.entity_ids == ["a", "b", "g", "h"]
