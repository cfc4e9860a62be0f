"""Multi-host sharded out-of-core build, then embed off the merged graph.

Simulates the P-host ingest flow on one machine: every "host" scans the
same input (the first-seen entity registry and trimming state are global
and input-order-dependent), but each sorts/spills/merges only its own row
block — the expensive phase of a 1B-edge build parallelizes P-fold.  The
disjoint pieces concatenate bitwise into the complete on-disk graph.

CLI equivalent:
    cleora-tpu embed -i edges.txt --streaming p0 --shard 0/4
    ... (one per host, shared or gathered storage) ...
    cleora-tpu merge-shards -o merged p0 p1 p2 p3
    cleora-tpu embed -i merged -o embeddings.npz
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import cleora_tpu as ct
from cleora_tpu.graph.stream import (
    build_graph_streaming_sharded,
    merge_disk_graph_shards,
)

rng = np.random.default_rng(7)
lines = [f"u{rng.integers(0, 500)}\tp{rng.integers(0, 800)}"
         for _ in range(20_000)]
columns = "complex::user complex::product"
P = 4

with tempfile.TemporaryDirectory() as tmp:
    pieces = []
    for host in range(P):  # in production: one process per host
        dg = build_graph_streaming_sharded(
            lines, columns, os.path.join(tmp, f"piece{host}"), host, P,
        )
        lo, hi = dg.meta["row_range"]
        print(f"host {host}: rows [{lo}, {hi})  {dg.num_edges} edges")
        pieces.append(dg.path)

    merged = merge_disk_graph_shards(pieces, os.path.join(tmp, "merged"))
    print(f"merged: {merged}")

    # embed() streams row blocks straight off the on-disk CSR
    emb = ct.embed(merged, feature_dim=64, num_iterations=10)
    print(f"embeddings: {emb.shape}, finite={np.isfinite(emb).all()}")

    sm = merged.to_sparse_matrix()
    top = ct.find_most_similar(sm, emb, "p1", top_k=3)
    print("most similar to p1:", [r["entity_id"] for r in top])
