"""DeepWalk / Node2Vec with every stage on the TPU.

``backend="device"`` generates the random walks on the accelerator;
``cooccurrence="device"`` ALSO counts the windowed co-occurrence pairs,
builds the positive-PMI matrix, and runs the randomized-SVD
factorization there — only scalar counts and the final (n, k) embedding
cross the host link.  On a 1M-node graph the fully-device pipeline
measured 3.5× the host-counted twin (RESULTS.md).

Run on a TPU, or on CPU:
  JAX_PLATFORMS=cpu python examples/device_walk_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from cleora_tpu import SparseMatrix
from cleora_tpu.algorithms import embed_deepwalk, embed_node2vec

rng = np.random.default_rng(0)
lines = [f"n{rng.integers(0, 3000)} n{rng.integers(0, 3000)}"
         for _ in range(30_000)]
graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
print(repr(graph))

dw = embed_deepwalk(graph, feature_dim=64, num_walks=4, walk_length=20,
                    backend="device", cooccurrence="device")
print("deepwalk (device walks + device counting):", dw.shape)

# second-order biasing (p, q) runs on device too — rejection sampling
# with an exact backtrack component; any p, q
n2v = embed_node2vec(graph, feature_dim=64, num_walks=2, walk_length=20,
                     p=0.5, q=2.0, backend="device",
                     cooccurrence="device")
print("node2vec p=0.5 q=2 (fully device):", n2v.shape)

# the host-counted twin (default) — right choice on many-core
# direct-attached hosts.  Its walk batching and sketch RNG differ, so
# the embeddings live in different bases; Procrustes-align them (the
# toolkit's align module) to compare the geometry they agree on.
from cleora_tpu.align import alignment_score

dw_host = embed_deepwalk(graph, feature_dim=64, num_walks=4,
                         walk_length=20, backend="device",
                         factorization="device")
print("post-Procrustes agreement with the host-counted twin:",
      round(alignment_score(dw, dw_host), 3))

# production lifecycle (round 5): durable per-pass counting + streamed
# .npy output; rerunning after a kill resumes byte-identically, and a
# finished run returns its memmap instantly
import tempfile

with tempfile.TemporaryDirectory() as ck:
    emb = embed_deepwalk(graph, feature_dim=64, num_walks=4,
                         walk_length=20, backend="device",
                         cooccurrence="device", checkpoint_dir=ck,
                         out=os.path.join(ck, "dw.npy"))
    again = embed_deepwalk(graph, feature_dim=64, num_walks=4,
                           walk_length=20, backend="device",
                           cooccurrence="device", checkpoint_dir=ck,
                           out=os.path.join(ck, "dw.npy"))
    print("lifecycle: streamed", emb.shape, "— instant resume identical:",
          bool(np.array_equal(np.asarray(emb), np.asarray(again))))
