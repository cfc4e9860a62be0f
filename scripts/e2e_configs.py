"""End-to-end runs of the BASELINE.json benchmark configs.

1. karate_club — canonical 40-iter dim-256 embed + centroid accuracy
2. synthetic customer-product bipartite hypergraph (~10k edges,
   complex::reflexive::product) + similarity sanity
3. ogbn-arxiv (1.2M edges) embed + classification (--big only)
4. heterogeneous multi-column hypergraph — per-relation embed, link
   prediction, ProNE + Cleora ensemble

    PYTHONPATH=. python scripts/e2e_configs.py [--cpu] [--big]
"""

import sys
import time

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import cleora_tpu as ct  # noqa: E402
from cleora_tpu import algorithms, ensemble, metrics  # noqa: E402
from cleora_tpu.datasets import load_dataset  # noqa: E402
from cleora_tpu.hetero import HeteroGraph  # noqa: E402
from cleora_tpu.sampling import train_test_split_edges  # noqa: E402


def config1_karate():
    d = load_dataset("karate_club")
    g = ct.SparseMatrix.from_iterator(iter(d["edges"]), d["columns"])
    t0 = time.time()
    emb = ct.embed(g)  # dim 256, 40 iters, whiten — the canonical workload
    acc = metrics.node_classification_scores(g, emb, d["labels"])["accuracy"]
    print(f"[1] karate_club: {g!r} embed {time.time()-t0:.1f}s "
          f"accuracy={acc:.3f}")


def config2_customer_product():
    rng = np.random.default_rng(11)
    n_customers, n_products, n_orders = 800, 300, 10_000 // 4
    lines = []
    for _ in range(n_orders):
        basket = rng.choice(n_products, size=rng.integers(2, 6), replace=False)
        lines.append(" ".join(f"p{b}" for b in basket))
    g = ct.SparseMatrix.from_iterator(iter(lines), "complex::reflexive::product")
    t0 = time.time()
    emb = ct.embed(g, feature_dim=128, num_iterations=20)
    sims = ct.find_most_similar(g, emb, g.entity_ids[0], top_k=5)
    print(f"[2] customer-product: {g!r} embed {time.time()-t0:.1f}s "
          f"top similar to {g.entity_ids[0]}: "
          f"{[s['entity_id'] for s in sims]}")


def config3_arxiv():
    d = load_dataset("ogbn_arxiv")
    g = ct.SparseMatrix.from_iterator(iter(d["edges"]), d["columns"])
    t0 = time.time()
    emb = ct.embed(g)
    elapsed = time.time() - t0
    acc = metrics.node_classification_scores(g, emb, d["labels"])["accuracy"]
    # linear (logistic-regression) probe per BASELINE config 3: the MLP
    # probe with hidden_dim=0 degenerates to softmax regression
    from cleora_tpu.classify import mlp_classify

    lin = mlp_classify(g, emb, d["labels"], hidden_dim=0)["accuracy"]
    eps = g.num_edges * 40 / elapsed
    print(f"[3] ogbn-arxiv: {g!r} embed {elapsed:.1f}s "
          f"({eps/1e6:.1f} M edge-ops/s) centroid-accuracy={acc:.3f} "
          f"logistic-probe={lin:.3f}")


def config4_hetero():
    rng = np.random.default_rng(5)
    h = HeteroGraph()
    h.add_node_type("user")
    h.add_node_type("item")

    def biased_pair():
        # community structure: users mostly interact within their group
        group = rng.integers(0, 5)
        u = group * 40 + rng.integers(0, 40)
        if rng.random() < 0.85:
            i = group * 20 + rng.integers(0, 20)
        else:
            i = rng.integers(0, 100)
        return f"u{u}", f"i{i}"

    buys = [biased_pair() for _ in range(2000)]
    views = [biased_pair() for _ in range(3000)]
    h.add_edge_type("buys", "user", "item", buys)
    h.add_edge_type("views", "user", "item", views)

    graphs, embs, combined = h.embed_per_relation(feature_dim=64,
                                                  num_iterations=10)
    # link prediction on held-out buys edges over the homogeneous graph
    edges = h.to_homogeneous_edges()
    g = ct.SparseMatrix.from_iterator(iter(edges), "complex::reflexive::node")
    split = train_test_split_edges(g, test_ratio=0.2)
    train_g = ct.SparseMatrix.from_iterator(
        iter(split["train_edge_strings"]), "complex::reflexive::node"
    )
    # whiten=False for raw-cosine link prediction: per-step PCA whitening
    # equalizes variance across directions, which helps downstream
    # classifiers but inverts raw neighbor-cosine ranking
    cleora_emb = ct.embed(train_g, feature_dim=64, num_iterations=10,
                          whiten=False)
    prone_emb = algorithms.embed_prone(train_g, feature_dim=64)
    combo = ensemble.combine([cleora_emb, prone_emb], method="concat")
    test_edges = [
        (a, b) for a, b in split["test_edges"]
        if a in set(train_g.entity_ids) and b in set(train_g.entity_ids)
    ]
    lp = metrics.link_prediction_scores(train_g, combo, test_edges)
    # MRR here is pooled over all 50×|pos| negatives (reference semantics,
    # metrics.py:72-79) so its absolute value is tiny; hits@10 reads better
    print(f"[4] hetero: {h!r} ensemble link-pred AUC={lp['auc']:.3f} "
          f"MRR={lp['mrr']:.4f} hits@10={lp['hits@10']:.3f}")


def main():
    config1_karate()
    config2_customer_product()
    config4_hetero()
    if "--big" in sys.argv:
        config3_arxiv()


if __name__ == "__main__":
    main()
