"""Column DSL parsing parity tests (reference: src/configuration.rs, src/sparse_matrix.rs)."""

import pytest

from cleora_tpu.graph.columns import (
    create_relation_descriptor,
    create_relation_descriptors,
    parse_fields,
    parse_line,
)


def test_parse_simple_columns():
    cols = parse_fields("user product")
    assert [c.name for c in cols] == ["user", "product"]
    assert all(not c.complex and not c.reflexive for c in cols)


def test_parse_modifiers_case_insensitive():
    cols = parse_fields("COMPLEX::Reflexive::node")
    assert cols[0].name == "node"
    assert cols[0].complex and cols[0].reflexive


def test_reflexive_requires_complex():
    with pytest.raises(ValueError, match="REFLEXIVE but NOT COMPLEX"):
        parse_fields("reflexive::node")


def test_unknown_modifier():
    with pytest.raises(ValueError, match="Unrecognized column field modifier"):
        parse_fields("banana::node")


def test_descriptor_single_reflexive():
    cols = parse_fields("complex::reflexive::node")
    d = create_relation_descriptor(cols)
    # reflexive column pairs with a virtual id = num_fields + k
    assert (d.col_a_id, d.col_b_id) == (0, 1)
    assert d.col_a_name == d.col_b_name == "node"


def test_descriptor_two_columns():
    d = create_relation_descriptor(parse_fields("user complex::product"))
    assert (d.col_a_id, d.col_b_id) == (0, 1)
    assert (d.col_a_name, d.col_b_name) == ("user", "product")


def test_multiple_relations_rejected():
    with pytest.raises(ValueError, match="More than one relation"):
        create_relation_descriptor(parse_fields("a b c"))
    with pytest.raises(ValueError, match="More than one relation"):
        create_relation_descriptor(parse_fields("complex::reflexive::a b"))


def test_three_column_descriptor_enumeration():
    descs = create_relation_descriptors(parse_fields("a b complex::reflexive::c"))
    pairs = [(d.col_a_id, d.col_b_id) for d in descs]
    # i<j pairs plus reflexive (2, 3)
    assert pairs == [(0, 1), (0, 2), (1, 2), (2, 3)]


def test_parse_line_tab():
    assert parse_line("u1\tp1 p2") == [["u1"], ["p1", "p2"]]


def test_parse_line_comma():
    assert parse_line("u1, p1 p2") == [["u1"], ["p1", "p2"]]


def test_parse_line_single_column():
    assert parse_line("a b c") == [["a", "b", "c"]]


def test_parse_line_tab_wins_over_comma():
    assert parse_line("u1,x\tp1") == [["u1,x"], ["p1"]]
