"""The pycleora drop-in shim mirrors the reference package surface."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")  # repo root holds the shim package


def test_shim_top_level():
    import pycleora

    assert pycleora.SparseMatrix is not None
    g = pycleora.SparseMatrix.from_iterator(
        iter(["a b", "b c"]), "complex::reflexive::node"
    )
    emb = pycleora.embed(g, feature_dim=8, num_iterations=2)
    assert emb.shape == (3, 8)
    assert np.allclose(
        pycleora.whiten_embeddings(emb), pycleora.whiten_embeddings(emb)
    )


def test_shim_native_module_path():
    from pycleora.pycleora import SparseMatrix  # the reference's PyO3 path

    g = SparseMatrix.from_iterator(iter(["x y"]), "complex::reflexive::n")
    assert g.num_entities == 2


def test_shim_submodules():
    import pycleora

    assert pycleora.metrics.node_classification_scores is not None
    assert pycleora.datasets.list_datasets()[0]["name"] == "karate_club"
    assert len(pycleora.algorithms.list_algorithms()) == 7


def test_determinism_bitwise():
    """Deterministic restartability (SURVEY §5): identical runs are
    bit-identical — build, init, and the fused device loop."""
    import cleora_tpu as ct

    lines = ["a b c", "b d", "c e", "e a"]
    g1 = ct.SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")
    g2 = ct.SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")
    assert np.array_equal(g1.data.left_vals, g2.data.left_vals)
    e1 = ct.embed(g1, feature_dim=16, num_iterations=6)
    e2 = ct.embed(g2, feature_dim=16, num_iterations=6)
    assert np.array_equal(e1, e2)


def test_outputs_are_writable():
    """The reference returns plain numpy that callers mutate in place (README
    manual loop does `embeddings /= norm`); device-backed returns must be
    writable."""
    import cleora_tpu as ct

    g = ct.SparseMatrix.from_iterator(iter(["a b", "b c"]),
                                      "complex::reflexive::n")
    for out in (
        g.initialize_deterministically(8),
        g.left_markov_propagate(np.zeros((3, 8), np.float32)),
        g.embed_fast(8, 2),
        ct.embed(g, feature_dim=8, num_iterations=2),
        ct.embed(g, feature_dim=8, num_iterations=2,
                 callback=lambda i, e: None),
    ):
        assert out.flags.writeable
        out[0, 0] = 1.0  # must not raise


def test_shim_import_statements():
    """`import pycleora.X` (the import STATEMENT — goes through the import
    system, not module __getattr__) resolves every reference submodule path,
    matching real-package behavior."""
    import importlib
    import subprocess
    import sys

    for sub in ("metrics", "viz", "pycleora", "datasets", "cli"):
        mod = importlib.import_module(f"pycleora.{sub}")
        assert mod is not None, sub
    import pycleora.metrics as m

    assert m.node_classification_scores is not None
    # `python -m pycleora` drives the CLI like the reference package
    out = subprocess.run(
        [sys.executable, "-m", "pycleora", "--help"],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode == 0 and "embed" in out.stdout
