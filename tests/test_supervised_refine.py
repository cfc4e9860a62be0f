"""supervised_refine parity: run the REFERENCE's own function (extracted via
ast from pycleora/__init__.py, which can't be imported whole because of its
native-module import) against ours on identical inputs."""

import ast

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_fns():
    src = open("/root/reference/pycleora/__init__.py").read()
    tree = ast.parse(src)
    wanted = {"supervised_refine", "_normalize"}
    nodes = [
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in wanted
    ]
    assert {n.name for n in nodes} == wanted
    module = ast.Module(body=nodes, type_ignores=[])
    import typing

    from cleora_tpu import SparseMatrix

    ns = {"np": np, "Optional": typing.Optional, "List": typing.List,
          "Tuple": typing.Tuple, "Callable": typing.Callable,
          "Dict": typing.Dict, "SparseMatrix": SparseMatrix}
    exec(compile(ast.fix_missing_locations(module), "<ref>", "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def setup():
    from cleora_tpu import SparseMatrix

    rng = np.random.default_rng(9)
    lines = [f"n{rng.integers(0, 30)} n{rng.integers(0, 30)}"
             for _ in range(120)]
    g = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
    emb = rng.standard_normal((g.num_entities, 12)).astype(np.float32)
    ids = g.entity_ids
    pos = [(ids[0], ids[1]), (ids[2], ids[3]), (ids[4], ids[5])]
    neg = [(ids[0], ids[6]), (ids[1], ids[7])]
    return g, emb, pos, neg


def test_supervised_refine_parity(ref_fns, setup):
    from cleora_tpu import supervised_refine

    g, emb, pos, neg = setup
    ours = supervised_refine(g, emb.copy(), pos, num_epochs=10)
    theirs = ref_fns["supervised_refine"](g, emb.copy(), pos, num_epochs=10)
    assert np.allclose(ours, theirs, atol=1e-5)


def test_supervised_refine_explicit_negatives(ref_fns, setup):
    from cleora_tpu import supervised_refine

    g, emb, pos, neg = setup
    ours = supervised_refine(g, emb.copy(), pos, negative_pairs=neg,
                             num_epochs=8, learning_rate=0.05)
    theirs = ref_fns["supervised_refine"](g, emb.copy(), pos,
                                          negative_pairs=neg, num_epochs=8,
                                          learning_rate=0.05)
    assert np.allclose(ours, theirs, atol=1e-5)


def test_supervised_refine_callback_and_errors(setup):
    from cleora_tpu import supervised_refine

    g, emb, pos, _ = setup
    losses = []
    supervised_refine(g, emb.copy(), pos, num_epochs=3,
                      callback=lambda e, l: losses.append(l))
    assert len(losses) == 3
    with pytest.raises(ValueError, match="not found"):
        supervised_refine(g, emb.copy(), [("zzz", "yyy")])
    with pytest.raises(ValueError, match="rows but graph"):
        supervised_refine(g, emb[:2].copy(), pos)
