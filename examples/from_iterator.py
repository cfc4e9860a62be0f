"""Streaming-iterator graph build (reference: examples/from_iterator.py).

Feeds hyperedge lines from a generator (here: multiple files concatenated),
then runs the propagate → normalize loop by hand with random init.  For the
fused one-dispatch loop use cleora_tpu.embed().

Usage: python examples/from_iterator.py [edge_file ...]
(with no arguments, a small synthetic edge set is used)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from cleora_tpu import SparseMatrix, whiten_embeddings

start_time = time.time()


def edges_iterator():
    files = sys.argv[1:]
    if not files:
        rng = np.random.default_rng(0)
        for _ in range(10_000):
            yield f"p{rng.integers(0, 500)} p{rng.integers(0, 500)}"
        return
    for file in files:
        with open(file, "rt") as f:
            yield from f


graph = SparseMatrix.from_iterator(edges_iterator(), "complex::reflexive::product")

print("Entities n", len(graph.entity_ids))
print(graph.entity_ids[:10])

embeddings = np.random.randn(len(graph.entity_ids), 256).astype(np.float32)

for i in range(40):
    embeddings = graph.left_markov_propagate(embeddings)
    embeddings /= np.linalg.norm(embeddings, ord=2, axis=-1, keepdims=True)
    embeddings = whiten_embeddings(embeddings)

print(f"Took {time.time() - start_time:.2f} seconds")
