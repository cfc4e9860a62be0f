"""Reproduce the reference's published node-classification table (BASELINE.md).

Runs the canonical embed (dim 256, 40 iters, whiten) + the centroid
classifier on the bundled datasets and prints accuracy next to the
reference's published numbers.  Usage:

    python scripts/accuracy_report.py [--cpu] [datasets...]

ego-Facebook — the reference's flagship published number (0.990,
reference README.md:256) — is a real SNAP download, blocked in
zero-egress environments.  Seed the cache directory
(``~/.cleora_tpu_datasets`` or ``$CLEORA_TPU_CACHE``) manually and the
row is emitted automatically, no flags needed:

    facebook.txt.gz   https://snap.stanford.edu/data/facebook_combined.txt.gz
                      (the combined edge list, verbatim; plain
                      ``facebook.txt`` also accepted)
    facebook.tar.gz   https://snap.stanford.edu/data/facebook.tar.gz
                      (the per-ego archive; provides the ego-network-
                      membership labels the classifier needs — nodes are
                      labeled by which of the 10 ego networks they appear
                      in, lowest ego id first)

Any other cached SNAP dataset passed by name runs the same way from its
.npz / .txt.gz seed.
"""

import sys
import time

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cleora_tpu import SparseMatrix, embed  # noqa: E402
from cleora_tpu.datasets import load_dataset, snap_cache_status  # noqa: E402
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

# reference README.md:257-258 — the full per-algorithm comparison rows
PUBLISHED_ALGOS = {
    "cora": {"cleora": 0.861, "netmf": 0.839, "deepwalk": 0.835,
             "node2vec": 0.835, "hope": 0.821, "grarep": 0.809,
             "prone": 0.179, "randne": 0.247},
    "citeseer": {"cleora": 0.824, "netmf": 0.810, "deepwalk": 0.806,
                 "node2vec": 0.806, "hope": 0.740, "grarep": 0.756,
                 "prone": 0.189, "randne": 0.244},
}


def algorithms_table(names, device=False):
    """Per-algorithm accuracy vs the reference's published comparison
    (--algorithms flag).  Each sibling runs with its reference-default
    hyperparameters on the same RNG-exact synthetic loaders.
    ``--device`` routes every sibling through its TPU backend — the mode
    that completes the rows the reference's table reports as OOM / T-O
    (e.g. NetMF and the walk algorithms on pubmed)."""
    from cleora_tpu import algorithms as alg

    kw = {"backend": "device"} if device else {}
    wkw = dict(kw, cooccurrence="device") if device else {}
    runners = {
        "cleora": lambda g: embed(g, feature_dim=256, num_iterations=40),
        "netmf": lambda g: alg.embed_netmf(g, **kw),
        "deepwalk": lambda g: alg.embed_deepwalk(g, **wkw),
        "node2vec": lambda g: alg.embed_node2vec(g, **wkw),
        "hope": lambda g: alg.embed_hope(g, **kw),
        "grarep": lambda g: alg.embed_grarep(g, **kw),
        "prone": lambda g: alg.embed_prone(g, **kw),
        "randne": lambda g: alg.embed_randne(g, **kw),
    }
    for name in names:
        ds = load_dataset(name)
        graph = SparseMatrix.from_iterator(iter(ds["edges"]), ds["columns"])
        pub = PUBLISHED_ALGOS.get(name, {})
        print(f"\n{name} ({ds['num_nodes']} nodes): "
              f"{'algorithm':<10} {'accuracy':>9} {'published':>10} "
              f"{'time_s':>7}")
        for aname, fn in runners.items():
            t0 = time.time()
            try:
                emb = fn(graph)
                scores = node_classification_scores(graph, emb,
                                                    ds["labels"])
                acc = f"{scores['accuracy']:>9.3f}"
            except Exception as e:  # mirror the reference's T/O-OOM cells
                acc = f"{'error':>9}"
                sys.stderr.write(f"{aname} on {name}: {e}\n")
            p = pub.get(aname)
            print(f"  {aname:<10} {acc} "
                  f"{p if p is not None else '—':>10} "
                  f"{time.time() - t0:>7.1f}", flush=True)


def default_datasets():
    """The bundled set, plus ego-Facebook whenever its cache is seeded."""
    names = list(DEFAULT)
    if snap_cache_status("facebook") is not None:
        names.append("facebook")
    else:
        sys.stderr.write(
            "note: ego-Facebook skipped — seed facebook.txt.gz (+ "
            "facebook.tar.gz for labels) into the dataset cache to "
            "include the reference's flagship 0.990 row (see module "
            "docstring)\n"
        )
    return names


def main():
    if "--algorithms" in sys.argv:
        sys.argv.remove("--algorithms")
        device = "--device" in sys.argv
        if device:
            sys.argv.remove("--device")
        algorithms_table(sys.argv[1:] or ["cora", "citeseer"],
                         device=device)
        return
    names = sys.argv[1:] or default_datasets()
    print(f"{'dataset':<14} {'nodes':>7} {'edges':>8} {'time_s':>7} "
          f"{'accuracy':>9} {'published':>10}")
    for name in names:
        ds = load_dataset(name)
        t0 = time.time()
        graph = SparseMatrix.from_iterator(iter(ds["edges"]), ds["columns"])
        emb = embed(graph, feature_dim=256, num_iterations=40)
        elapsed = time.time() - t0
        if ds["labels"]:
            scores = node_classification_scores(graph, emb, ds["labels"])
            acc = f"{scores['accuracy']:>9.3f}"
        else:
            acc = f"{'no labels':>9}"
        pub = PUBLISHED.get(name)
        print(f"{name:<14} {ds['num_nodes']:>7} {ds['num_edges']:>8} "
              f"{elapsed:>7.1f} {acc} "
              f"{pub if pub is not None else '—':>10}")


if __name__ == "__main__":
    main()
