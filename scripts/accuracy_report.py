"""Reproduce the reference's published node-classification table (BASELINE.md).

Runs the canonical embed (dim 256, 40 iters, whiten) + the centroid
classifier on the bundled datasets and prints accuracy next to the
reference's published numbers.  Usage:

    python scripts/accuracy_report.py [--cpu] [datasets...]
"""

import sys
import time

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cleora_tpu import SparseMatrix, embed  # noqa: E402
from cleora_tpu.datasets import load_dataset  # noqa: E402
from cleora_tpu.metrics import node_classification_scores  # noqa: E402

PUBLISHED = {  # reference README.md:256-260
    "facebook": 0.990,
    "cora": 0.861,
    "citeseer": 0.824,
    "pubmed": 0.879,
    "ppi": 1.000,
    "karate_club": None,
}

DEFAULT = ["karate_club", "cora", "citeseer", "pubmed", "ppi"]


def main():
    names = sys.argv[1:] or DEFAULT
    print(f"{'dataset':<14} {'nodes':>7} {'edges':>8} {'time_s':>7} "
          f"{'accuracy':>9} {'published':>10}")
    for name in names:
        ds = load_dataset(name)
        t0 = time.time()
        graph = SparseMatrix.from_iterator(iter(ds["edges"]), ds["columns"])
        emb = embed(graph, feature_dim=256, num_iterations=40)
        elapsed = time.time() - t0
        scores = node_classification_scores(graph, emb, ds["labels"])
        pub = PUBLISHED.get(name)
        print(f"{name:<14} {ds['num_nodes']:>7} {ds['num_edges']:>8} "
              f"{elapsed:>7.1f} {scores['accuracy']:>9.3f} "
              f"{pub if pub is not None else '—':>10}")


if __name__ == "__main__":
    main()
