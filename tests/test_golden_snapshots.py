"""Golden numeric parity vs the reference's committed insta snapshots.

The reference's only numeric regression tests (/root/reference/tests/
snapshot.rs) build two StdRng(2137)-seeded graphs, run one SpMM with Left and
Symmetric Markov, round ×1000 to i32, and snapshot the result.  Here the same
graphs/embeddings are regenerated with a bit-exact replica of Rust's RNG
stack (tests/rust_rng.py) and our propagate is checked against the snapshot
files verbatim — the strongest cross-implementation anchor available.

f32 accumulation order inside the SpMM is implementation-defined (the
reference sums in CSR edge order, XLA fuses its own order), so entries whose
×1000 value lands within one ulp of an integer boundary may differ by 1;
everything else must match exactly.
"""

import re

import numpy as np
import pytest

from rust_rng import StdRng

SNAP_DIR = "/root/reference/tests/snapshots"


def _load_snapshot(name: str) -> np.ndarray:
    with open(f"{SNAP_DIR}/snapshot__tests__{name}.snap") as f:
        text = f.read()
    body = text.split("---", 2)[2]
    rows = re.findall(r"\[([-0-9,\s]+)\]", body)
    parsed = [
        [int(v) for v in row.split(",") if v.strip()] for row in rows
    ]
    # drop the ndarray debug footer (shape=[100, 32], strides=[32, 1])
    width = max(len(p) for p in parsed)
    return np.array([p for p in parsed if len(p) == width], dtype=np.int64)


def _reflexive_setup():
    rng = StdRng(21_37)
    edges = []
    for _ in range(1000):
        a = rng.next_u32() % 100
        b = rng.next_u32() % 100
        edges.append(f"{a} {b}")
    return edges, "reflexive::complex::entity_id", rng


def _two_column_setup():
    rng = StdRng(21_37)
    edges = []
    for _ in range(1000):
        c1a = rng.next_u32() % 100
        c1b = rng.next_u32() % 100
        c2a = rng.next_u32() % 100
        c2b = rng.next_u32() % 100
        edges.append(f"{c1a} {c1b}\t{c2a} {c2b}")
    return edges, "complex::entity_a complex::entity_b", rng


def _embeddings(rng: StdRng, n=100, d=32) -> np.ndarray:
    out = np.empty((n, d), dtype=np.float32)
    for i in range(n):
        for j in range(d):
            out[i, j] = rng.uniform_f32(0.0, 10.0)
    return out


def _run(setup, markov):
    from cleora_tpu import SparseMatrix

    edges, columns, rng = setup()
    graph = SparseMatrix.from_iterator(iter(edges), columns, 16)
    x = _embeddings(rng)
    assert graph.num_entities == 100
    if markov == "left":
        out = graph.left_markov_propagate(x)
    else:
        out = graph.symmetric_markov_propagate(x)
    return np.trunc(out.astype(np.float64) * 1000.0).astype(np.int64)


def _check(ours: np.ndarray, golden: np.ndarray):
    assert ours.shape == golden.shape
    diff = np.abs(ours - golden)
    exact = float(np.mean(diff == 0))
    # boundary entries may flip the last rounding unit due to f32 sum order
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert exact > 0.995, f"only {exact:.4%} exact"


@pytest.mark.parametrize(
    "snap,setup,markov",
    [
        ("markov_left_01", _reflexive_setup, "left"),
        ("markov_sym_01", _reflexive_setup, "symmetric"),
        ("markov_left_02", _two_column_setup, "left"),
        ("markov_sym_02", _two_column_setup, "symmetric"),
    ],
)
def test_golden_snapshot(snap, setup, markov):
    golden = _load_snapshot(snap)
    ours = _run(setup, markov)
    _check(ours, golden)
