"""End-to-end DeepWalk at 1M nodes on the v5e (VERDICT r3 #5): measure the
full walks → co-occurrence → PPMI → factorization pipeline with per-phase
wall clocks, so the host stage's share is a recorded fact instead of a
guess.

Pipeline phases:
  1. device walks        — first-order engine (23.6 M hops/s measured)
  2. host co-occurrence  — per-batch uint64 key pack + native radix
                           sort-reduce (_walk_pair_counts)
  3. PPMI + factorize    — sparse positive-PMI, then EITHER host ARPACK
                           svds or the device randomized SVD on the
                           production SpMM layout (--factorization)

    # CPU smoke:
    PYTHONPATH=. python scripts/deepwalk_e2e.py --cpu --nodes 20000 \
        --edges 110000 --num-walks 1 --dim 32
    # v5e headline:
    python scripts/deepwalk_e2e.py --nodes 1000000 --edges 11000000 \
        --num-walks 2 --dim 128 --factorization device
"""

import argparse
import json
import time

import numpy as np


def log(msg):
    print(f"[e2e {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=11_000_000)
    ap.add_argument("--num-walks", type=int, default=2)
    ap.add_argument("--walk-length", type=int, default=80)
    ap.add_argument("--walk-tables", default="auto",
                    choices=["auto", "replicated", "sharded"],
                    help="walk-CSR placement (sharded = row-partitioned "
                         "over the counting devices' mesh)")
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--factorization", default="device",
                    choices=["host", "device", "sharded"],
                    help="'sharded' (with --cooccurrence device and "
                         "--count-devices) keeps each count partition on "
                         "its counting device and runs the SVD "
                         "mesh-sharded; auto-engaged past one chip's HBM")
    ap.add_argument("--cooccurrence", default="host",
                    choices=["host", "device"],
                    help="device = fully TPU-resident pipeline "
                         "(ops/cooccur.py): pairs counted and factorized "
                         "on device, no multi-GB host sort-reduce")
    ap.add_argument("--p", type=float, default=1.0,
                    help="Node2Vec return bias; p=q=1 = first-order engine")
    ap.add_argument("--q", type=float, default=1.0,
                    help="Node2Vec in-out bias")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--count-devices", type=int, default=None,
                    help="With --cooccurrence device: fan the counting "
                         "passes out over the first N devices (pod A/B "
                         "for pass-parallel counting, ROADMAP 3a)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="With --cooccurrence device: durable per-pass "
                         "counting checkpoints + streamed npy output "
                         "(the production lifecycle); rerunning the same "
                         "command resumes")
    ap.add_argument("--out", default=None,
                    help="Stream the final embedding into this .npy "
                         "(bounded chunked fetches, no (n,d) host "
                         "materialization)")
    ap.add_argument("--kill-after-counting", action="store_true",
                    help="With --checkpoint-dir: exit(0) once every "
                         "counting pass is durable, BEFORE the "
                         "factorization — the lifecycle kill point; "
                         "rerun without this flag to resume")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cleora_tpu as ct
    from cleora_tpu import algorithms as alg

    rng = np.random.default_rng(7)
    src = rng.integers(0, args.nodes, args.edges // 2)
    dst = rng.integers(0, args.nodes, args.edges // 2)
    t0 = time.time()
    g = ct.SparseMatrix.from_edge_arrays(src, dst)
    log(f"graph: {g.num_entities} nodes, {g.num_edges} nnz "
        f"({time.time()-t0:.1f}s build)")

    second = not (args.p == 1.0 and args.q == 1.0)

    wt_mesh = None
    if args.walk_tables == "sharded":
        from cleora_tpu.parallel.mesh import make_mesh

        wt_mesh = make_mesh(args.count_devices or None)

    def resident_batches():
        if second:
            return alg._device_walks2(
                g, args.num_walks, args.walk_length, args.p, args.q,
                args.seed, resident=True, mesh=wt_mesh,
                walk_tables=args.walk_tables)
        return alg._device_walks(
            g, args.num_walks, args.walk_length, args.seed,
            batch=alg._WALK_BATCH // 2, resident=True, mesh=wt_mesh,
            walk_tables=args.walk_tables)

    if args.cooccurrence == "device":
        # fully device-resident: walks are consumed lazily by the device
        # sort-reduce, so walks+counting is ONE phase; only per-batch
        # scalar counts and the final embedding cross the host link
        t0 = time.time()
        n = g.num_entities
        from cleora_tpu.ops import cooccur

        passes = alg._cooc_passes(g, args.num_walks, args.walk_length,
                                  args.window)
        log(f"counting passes: {passes} (hash-partitioned by center id); "
            f"engine: {'second-order p/q' if second else 'first-order'}")
        devices = None
        if args.count_devices and args.count_devices > 1:
            import jax

            devices = jax.devices()[: args.count_devices]
            log(f"pass-parallel counting over {len(devices)} devices")
        checkpoint = None
        out = args.out
        if args.checkpoint_dir:
            # same fingerprint construction as embed_deepwalk/node2vec →
            # this script and the public API resume each other's runs
            import os

            fp_params = (
                dict(engine="walk2", num_walks=args.num_walks,
                     walk_length=args.walk_length, p=args.p, q=args.q)
                if second else
                dict(engine="walk1", num_walks=args.num_walks,
                     walk_length=args.walk_length)
            )
            fp = alg._walk_fingerprint(
                g, second,
                dict(fp_params, window=args.window, passes=passes, n=n,
                     seed=args.seed),
            )
            checkpoint = cooccur.CountCheckpoint(args.checkpoint_dir, fp)
            if out is None:
                out = os.path.join(args.checkpoint_dir, "embedding.npy")
            # matches embed_deepwalk/node2vec's fact_params (defaults) so
            # the script and the public API resume each other's runs
            fact_params = dict(
                feature_dim=args.dim, oversample=16, power_iters=4,
                factorization=("sharded" if args.factorization == "sharded"
                               else "device"))
            done = checkpoint.done_result(args.dim, fact_params)
            if done is not None:
                log(f"finished embedding found at {out} — nothing to do")
                return
        ranges, m = cooccur.device_pair_counts(
            resident_batches, n, args.window, passes=passes,
            devices=devices, checkpoint=checkpoint,
            gather_home=False,
        )
        cnt_total = cooccur.pair_total(ranges, n)  # scalar fetch per range
        cooc_wall = time.time() - t0
        log(f"device walks+co-occurrence: {cnt_total} pairs -> {m} unique "
            f"in {cooc_wall:.1f}s")
        if args.kill_after_counting:
            log("counting durable — exiting before factorization "
                "(lifecycle kill point); rerun to resume")
            print("E2E_SUMMARY " + json.dumps({
                "phase": "counting_done", "pairs": cnt_total,
                "unique_pairs": int(m), "cooccur_s": round(cooc_wall, 1),
                "checkpoint_dir": args.checkpoint_dir,
            }), flush=True)
            return
        t0 = time.time()
        emb = alg._factorize_ranges(
            ranges, m, n, args.dim, args.seed, out=out,
            factorization=args.factorization,
        )
        if checkpoint is not None:
            checkpoint.mark_done(out, emb.shape, fact_params)
        fact_wall = time.time() - t0
        log(f"device PPMI+factorize: {emb.shape} in {fact_wall:.1f}s"
            + (f" -> {out}" if out else ""))
        total = cooc_wall + fact_wall
        summary = {
            "nodes": n, "nnz": g.num_edges, "num_walks": args.num_walks,
            "walk_length": args.walk_length, "window": args.window,
            "dim": args.dim, "cooccurrence": "device",
            "p": args.p, "q": args.q,
            "cooccur_s": round(cooc_wall, 1),
            "factorize_s": round(fact_wall, 1), "total_s": round(total, 1),
            "pairs": cnt_total, "unique_pairs": int(m),
            "host_stage_fraction": 0.0,
            "finite": bool(np.isfinite(emb).all()),
        }
        print("E2E_SUMMARY " + json.dumps(summary), flush=True)
        return

    # phase 1: device walks (materialize every batch host-side, timed)
    t0 = time.time()
    if second:
        batches = list(alg._device_walks2(
            g, args.num_walks, args.walk_length, args.p, args.q, args.seed
        ))
    else:
        batches = list(alg._device_walks(
            g, args.num_walks, args.walk_length, args.seed
        ))
    n_walks = sum(b.shape[0] for b in batches)
    hops = n_walks * (args.walk_length - 1)
    walks_wall = time.time() - t0
    log(f"walks: {n_walks} x {args.walk_length} in {walks_wall:.1f}s "
        f"({hops/walks_wall/1e6:.1f} M hops/s incl. host fetch)")

    # phase 2: host co-occurrence sort-reduce (native radix)
    t0 = time.time()
    keys, counts = alg._walk_pair_counts(batches, g.num_entities,
                                         args.window)
    cooc_wall = time.time() - t0
    pairs = int(counts.sum())
    log(f"co-occurrence: {pairs} pairs -> {keys.shape[0]} unique in "
        f"{cooc_wall:.1f}s ({pairs/cooc_wall/1e6:.1f} M pairs/s)")

    # phase 3: PPMI + factorization
    t0 = time.time()
    emb = alg._counts_to_embeddings(
        keys, counts, g.num_entities, args.dim,
        factorization=args.factorization, seed=args.seed,
    )
    fact_wall = time.time() - t0
    log(f"PPMI+{args.factorization}-factorize: {emb.shape} in "
        f"{fact_wall:.1f}s")

    total = walks_wall + cooc_wall + fact_wall
    host_stage = cooc_wall + (fact_wall if args.factorization == "host"
                              else 0.0)
    summary = {
        "nodes": g.num_entities, "nnz": g.num_edges,
        "num_walks": args.num_walks, "walk_length": args.walk_length,
        "window": args.window, "dim": args.dim,
        "factorization": args.factorization,
        "walks_s": round(walks_wall, 1), "cooccur_s": round(cooc_wall, 1),
        "factorize_s": round(fact_wall, 1), "total_s": round(total, 1),
        "hops_per_s": round(hops / walks_wall),
        "pairs": pairs, "unique_pairs": int(keys.shape[0]),
        "host_stage_fraction": round(host_stage / total, 3),
        "finite": bool(np.isfinite(emb).all()),
    }
    print("E2E_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
