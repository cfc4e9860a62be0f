"""Serving throughput of the device-resident exact top-k index on the
real chip: ShardedDeviceIndex.query_batch wall per dispatch → queries/s.

The reference's serving story keeps the table in host RAM and rebuilds
hnsw per process (/root/reference/pycleora/search.py); ours keeps the
L2-normalized table device-resident and answers each (Q, D) batch with
one jitted dispatch (MXU matmul + top-k + all_gather merge).  This probe
records the measured end-to-end rate — including the per-dispatch
host↔device round-trip, which on a tunneled runtime is the latency
floor (noted in the output; direct-attached hosts don't pay it).

    python scripts/serving_probe.py --rows 1000000 --dim 256 --batch 1024
    python scripts/serving_probe.py --cpu --rows 20000   # smoke
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cleora_tpu as ct
    from cleora_tpu.search import ShardedDeviceIndex

    rng = np.random.default_rng(0)
    t0 = time.time()
    src = rng.integers(0, args.rows, args.rows)
    dst = rng.integers(0, args.rows, args.rows)
    g = ct.SparseMatrix.from_edge_arrays(src, dst)
    n = g.num_entities
    emb = rng.standard_normal((n, args.dim)).astype(np.float32)
    print(f"[probe] graph {n} entities, table {emb.nbytes >> 20} MB "
          f"({time.time()-t0:.1f}s host build)", flush=True)

    t0 = time.time()
    idx = ShardedDeviceIndex(g, emb, dtype=args.dtype)
    print(f"[probe] table placed in {time.time()-t0:.1f}s", flush=True)

    queries = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    t0 = time.time()
    res = idx.query_batch(queries, top_k=args.top_k)  # compile + warm
    warm = time.time() - t0
    print(f"[probe] warm dispatch (incl. compile): {warm:.1f}s", flush=True)

    walls = []
    for _ in range(args.iters):
        t0 = time.time()
        res = idx.query_batch(queries, top_k=args.top_k)
        walls.append(time.time() - t0)
    best, med = min(walls), sorted(walls)[len(walls) // 2]
    assert len(res) == args.batch and len(res[0]) == args.top_k
    print(json.dumps({
        "rows": n, "dim": args.dim, "batch": args.batch,
        "top_k": args.top_k, "dtype": args.dtype,
        "wall_med_s": round(med, 4), "wall_best_s": round(best, 4),
        "qps_med": round(args.batch / med),
        "qps_best": round(args.batch / best),
        "note": "end-to-end incl. per-dispatch host round-trip; a "
                "tunneled runtime pays RTT per call",
    }), flush=True)


if __name__ == "__main__":
    main()
