"""One-call baseline embedding (reference: examples/predefined_cleora_loop.py).

embed_using_baseline_cleora runs the canonical loop (deterministic init,
left-Markov, L2, whitening) at the given dim and iteration count.

Usage: python examples/predefined_cleora_loop.py [edge_file ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
import time

import numpy as np

from cleora_tpu import SparseMatrix, embed_using_baseline_cleora

files = sys.argv[1:]
if not files:
    rng = np.random.default_rng(0)
    tmp = tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False)
    for _ in range(10_000):
        tmp.write(f"p{rng.integers(0, 500)} p{rng.integers(0, 500)}\n")
    tmp.close()
    files = [tmp.name]

start_time = time.time()
graph = SparseMatrix.from_files(files, "complex::reflexive::name")
embeddings = embed_using_baseline_cleora(graph, 128, 3)
print(embeddings.shape)
print(f"Took {time.time() - start_time:.2f} seconds")
