"""Embedding QUALITY of the fully-device walk pipeline at scale: plant
communities, embed, and measure community recovery — the e2e wall-clock
runs (RESULTS.md) prove the pipeline finishes; this proves the output
means something at sizes the parity tests don't reach.

A 100k-node planted-partition graph (50 communities) is embedded by
(a) DeepWalk with device counting + device factorization,
(b) DeepWalk with host counting (the parity twin), and
(c) the canonical cleora embed — then scored by centroid classification
accuracy on the planted labels (chance = 1/communities).

    python scripts/walk_quality_probe.py --cpu --nodes 5000   # smoke
    python scripts/walk_quality_probe.py                      # v5e
"""

import argparse
import json
import time

import numpy as np


def planted_edges(n, communities, deg_in, deg_out, rng):
    """Block-structured random edges, vectorized (the reference-exact SBM
    generator is per-block-pair and too slow past ~10k nodes).  Handles
    n % communities != 0: the last block is smaller, and in-community
    destinations clamp into the block instead of wrapping into block 0."""
    size = -(-n // communities)
    comm = np.arange(n) // size
    m_in = n * deg_in
    src_in = rng.integers(0, n, m_in)
    dst_in = np.minimum(
        comm[src_in] * size + rng.integers(0, size, m_in), n - 1)
    m_out = n * deg_out
    src_out = rng.integers(0, n, m_out)
    dst_out = rng.integers(0, n, m_out)
    src = np.concatenate([src_in, src_out])
    dst = np.concatenate([dst_in, dst_out])
    return src, dst, comm


def centroid_accuracy(emb, labels, rng, train_frac=0.5):
    n = emb.shape[0]
    normed = emb / np.maximum(
        np.linalg.norm(emb, axis=1, keepdims=True), 1e-10)
    perm = rng.permutation(n)
    tr, te = perm[: int(n * train_frac)], perm[int(n * train_frac):]
    k = labels.max() + 1
    cents = np.zeros((k, emb.shape[1]), dtype=np.float64)
    for c in range(k):
        rows = tr[labels[tr] == c]
        if rows.size:
            cents[c] = normed[rows].mean(axis=0)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-10)
    pred = np.argmax(normed[te] @ cents.T, axis=1)
    return float(np.mean(pred == labels[te]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--communities", type=int, default=50)
    ap.add_argument("--deg-in", type=int, default=8)
    ap.add_argument("--deg-out", type=int, default=2)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--num-walks", type=int, default=2)
    ap.add_argument("--walk-length", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cleora_tpu as ct
    from cleora_tpu import algorithms as alg

    rng = np.random.default_rng(3)
    src, dst, comm = planted_edges(args.nodes, args.communities,
                                   args.deg_in, args.deg_out, rng)
    g = ct.SparseMatrix.from_edge_arrays(src, dst)
    # entity order is first-seen; map labels through the entity ids
    ids = np.array([int(e) for e in g.entity_ids])
    labels = comm[ids]
    n_comm = int(labels.max()) + 1  # == args.communities when it divides n
    print(f"[quality] {g.num_entities} nodes / {g.num_edges} nnz, "
          f"{n_comm} planted communities "
          f"(chance={1 / n_comm:.3f})", flush=True)

    out = {"nodes": g.num_entities, "nnz": g.num_edges,
           "communities": n_comm,
           "chance": round(1 / n_comm, 4)}
    runs = [
        ("deepwalk_device_cooc", lambda: alg.embed_deepwalk(
            g, args.dim, num_walks=args.num_walks,
            walk_length=args.walk_length, backend="device",
            cooccurrence="device")),
        ("deepwalk_host_cooc", lambda: alg.embed_deepwalk(
            g, args.dim, num_walks=args.num_walks,
            walk_length=args.walk_length, backend="device",
            factorization="device")),
        ("cleora_embed", lambda: ct.embed(
            g, feature_dim=args.dim, num_iterations=10)),
    ]
    for name, fn in runs:
        t0 = time.time()
        emb = fn()
        acc = centroid_accuracy(emb, labels, np.random.default_rng(1))
        out[name] = {"accuracy": round(acc, 4),
                     "wall_s": round(time.time() - t0, 1)}
        print(f"[quality] {name}: accuracy={acc:.4f} "
              f"({out[name]['wall_s']}s)", flush=True)
    print("QUALITY_SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
