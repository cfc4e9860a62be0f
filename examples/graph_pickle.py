"""Graph pickle round-trip (reference: examples/graph_pickle.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pickle

import numpy as np

from cleora_tpu import SparseMatrix, whiten_embeddings

lines = ["a b c", "b d", "c d e", "e f", "f a"]
graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::name")
print("Entities n", len(graph.entity_ids))

blob = pickle.dumps(graph)
graph_reread = pickle.loads(blob)

print(graph.entity_ids[:10])
print(graph_reread.entity_ids[:10])

embeddings = graph_reread.initialize_deterministically(feature_dim=256, seed=0)
embeddings = graph_reread.left_markov_propagate(embeddings)
embeddings /= np.linalg.norm(embeddings, ord=2, axis=-1, keepdims=True)
embeddings = whiten_embeddings(embeddings)
print(embeddings)
