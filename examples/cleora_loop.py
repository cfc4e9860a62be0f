"""Explicit per-iteration Cleora loop (reference: examples/cleora_loop.py).

The canonical workload driven by hand: build → deterministic init → 40 ×
[left-Markov propagate → L2 normalize → whiten].  For production use prefer
cleora_tpu.embed(), which fuses the whole loop into one device dispatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from cleora_tpu import SparseMatrix, whiten_embeddings

start_time = time.time()

files = sys.argv[1:] or None
if files:
    graph = SparseMatrix.from_files(files, "complex::reflexive::name")
else:
    rng = np.random.default_rng(0)
    lines = [f"n{rng.integers(0, 1000)} n{rng.integers(0, 1000)}"
             for _ in range(10_000)]
    graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::name")

print("Entities n", len(graph.entity_ids))
embeddings = graph.initialize_deterministically(feature_dim=256, seed=0)

for i in range(40):
    embeddings = graph.left_markov_propagate(embeddings)
    embeddings /= np.linalg.norm(embeddings, ord=2, axis=-1, keepdims=True)
    embeddings = whiten_embeddings(embeddings)
    pass  # per-iteration hook point

print(graph.entity_ids[:10])
print(f"Took {time.time() - start_time} seconds ")
