"""Full production-pipeline dress rehearsal on ONE command (VERDICT r3 #1):

    synthetic edge file → out-of-core stream-build (DiskGraph)
    → embed_sharded(checkpoint_dir=…, out="emb.npy")   [run A]
    → the same run KILLED (SIGKILL) after 2 checkpoints, then resumed
      [run B — must be byte-identical to run A]
    → ShardedDeviceIndex built from the .npy + query sanity
    → one JSON summary line (wall clocks, RSS, bitwise verdict)

This is the one integration proof available without a pod: every piece is
unit-tested on the CPU mesh (tests/test_parallel_lifecycle.py), but only
this drives stream-build → checkpointed sharded embed → memmap output →
device serving as one lifecycle on the real chip.  Reference anchor: the
end-to-end scale story /root/reference/README.md:272-276.

    # smoke (CPU mesh):
    PYTHONPATH=. python scripts/dress_rehearsal.py --cpu --nodes 20000 \
        --pairs 100000 --dim 32 --iters 8 --checkpoint-every 2
    # real chip at the single-chip ceiling (scale_probe shape):
    python scripts/dress_rehearsal.py --nodes 3000000 --pairs 30000000
"""

import argparse
import json
import os
import resource
import signal
import subprocess
import sys
import time


def log(msg):
    print(f"[dress {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def make_edge_file(path, nodes, pairs, seed=123):
    """Synthetic pair file (two-column lines), written in chunks."""
    import numpy as np

    if os.path.exists(path):
        return
    rng = np.random.default_rng(seed)
    t0 = time.time()
    with open(path, "w", buffering=1 << 22) as f:
        left = pairs
        while left:
            m = min(left, 2_000_000)
            a = rng.integers(0, nodes, m)
            b = rng.integers(0, nodes, m)
            s = "\n".join(f"n{x}\tn{y}" for x, y in zip(a, b))
            f.write(s)
            f.write("\n")
            left -= m
    log(f"edge file: {pairs} pairs -> {path} ({time.time()-t0:.1f}s)")


def run_embed(dg, args, out_path, ck_dir):
    from cleora_tpu.parallel.embed import embed_sharded

    t0 = time.time()
    mm = embed_sharded(
        dg, feature_dim=args.dim, num_iterations=args.iters,
        whiten=True, n_devices=1, out=out_path,
        checkpoint_dir=ck_dir, checkpoint_every=args.checkpoint_every,
    )
    wall = time.time() - t0
    return mm, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=3_000_000)
    ap.add_argument("--pairs", type=int, default=30_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/dress_rehearsal")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-kill", action="store_true",
                    help="skip the kill/resume phase (debug)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    kill_after = int(os.environ.get("DRESS_KILL_AFTER", "0") or 0)

    os.makedirs(args.workdir, exist_ok=True)
    edge_file = os.path.join(
        args.workdir, f"edges_{args.nodes}_{args.pairs}.txt"
    )
    import numpy as np

    make_edge_file(edge_file, args.nodes, args.pairs)

    # ---------------------------------------------------- stream build
    from cleora_tpu.graph.stream import DiskGraph, build_graph_streaming

    gdir = os.path.join(args.workdir, "graph")
    t0 = time.time()
    if os.path.exists(os.path.join(gdir, "meta.json")):
        dg = DiskGraph(gdir)
        build_wall = 0.0
        log(f"graph dir reused: {dg.num_entities} entities, "
            f"{dg.num_edges} edges")
    else:
        dg = build_graph_streaming(
            [edge_file], "node_a node_b", gdir, files=True
        )
        build_wall = time.time() - t0
        log(f"stream-build: {dg.num_entities} entities, {dg.num_edges} "
            f"edges in {build_wall:.1f}s (rss {rss_gb():.2f} GB)")

    if kill_after:
        # -------- worker mode: run B's first leg — SIGKILL mid-flight
        from cleora_tpu.parallel import state as lifecycle

        orig = lifecycle.ShardedCheckpoint.save
        count = {"n": 0}

        def killing(self, arr, it, extra=None):
            orig(self, arr, it, extra=extra)
            count["n"] += 1
            log(f"worker: checkpoint {count['n']} at iteration {it}")
            if count["n"] >= kill_after:
                log("worker: SIGKILL (simulated crash)")
                os.kill(os.getpid(), signal.SIGKILL)

        lifecycle.ShardedCheckpoint.save = killing
        run_embed(dg, args, os.path.join(args.workdir, "emb_b.npy"),
                  os.path.join(args.workdir, "ck_b"))
        log("worker: unexpectedly survived")  # pragma: no cover
        sys.exit(3)

    # ------------------------------------------------------ run A (clean)
    emb_a = os.path.join(args.workdir, "emb_a.npy")
    ck_a = os.path.join(args.workdir, "ck_a")
    t0 = time.time()
    mm_a, wall_a = run_embed(dg, args, emb_a, ck_a)
    log(f"run A: {mm_a.shape} -> {emb_a} in {wall_a:.1f}s "
        f"(incl. compile; rss {rss_gb():.2f} GB)")
    # warm re-run for the steady-state wall (compile amortized)
    for f in os.listdir(ck_a):
        os.remove(os.path.join(ck_a, f))
    _, wall_a2 = run_embed(dg, args, emb_a, ck_a)
    log(f"run A warm: {wall_a2:.1f}s "
        f"({dg.num_edges * args.iters / wall_a2 / 1e6:.1f} M edge-ops/s "
        "end-to-end incl. checkpoints+output)")

    # ------------------------------------------- run B (kill + resume)
    if not args.skip_kill:
        emb_b = os.path.join(args.workdir, "emb_b.npy")
        ck_b = os.path.join(args.workdir, "ck_b")
        for p in (emb_b,):
            if os.path.exists(p):
                os.remove(p)
        if os.path.isdir(ck_b):
            for f in os.listdir(ck_b):
                os.remove(os.path.join(ck_b, f))
        env = dict(os.environ, DRESS_KILL_AFTER="2")
        cmd = [sys.executable, os.path.abspath(__file__)] + [
            a for a in sys.argv[1:] if a != "--skip-kill"
        ]
        t0 = time.time()
        proc = subprocess.run(cmd, env=env)
        assert proc.returncode == -signal.SIGKILL, (
            f"worker exited {proc.returncode}, expected SIGKILL"
        )
        log(f"run B leg 1 killed after 2 checkpoints ({time.time()-t0:.1f}s)")
        meta = json.load(open(os.path.join(ck_b, "checkpoint.json")))
        assert meta["iteration"] == 2 * args.checkpoint_every, meta
        t0 = time.time()
        mm_b, wall_b = run_embed(dg, args, emb_b, ck_b)
        log(f"run B resumed from iteration {meta['iteration']} "
            f"in {wall_b:.1f}s")
        a = np.load(emb_a, mmap_mode="r")
        b = np.load(emb_b, mmap_mode="r")
        bitwise = all(
            np.array_equal(a[i:i + 262144], b[i:i + 262144])
            for i in range(0, a.shape[0], 262144)
        )
        log(f"kill/resume bitwise-identical to clean run: {bitwise}")
        assert bitwise, "resume diverged from the uninterrupted run"

    # ------------------------------------------------- serving + eval
    from cleora_tpu.search import ShardedDeviceIndex

    class _LazyIds:  # avoid materializing N id strings just for results
        def __getitem__(self, i):
            return f"n{i}"

    class _IdShim:
        entity_ids = _LazyIds()

    emb = np.load(emb_a, mmap_mode="r")
    t0 = time.time()
    idx = ShardedDeviceIndex(_IdShim(), emb)
    rng = np.random.default_rng(0)
    q = rng.integers(0, emb.shape[0], 32)
    res = idx.query_batch(np.asarray(emb[q], dtype=np.float32), top_k=5)
    self_hit = float(np.mean(
        [r[0]["index"] == qi for r, qi in zip(res, q)]
    ))
    eval_wall = time.time() - t0
    log(f"ShardedDeviceIndex: 32 queries in {eval_wall:.1f}s, "
        f"self-top1 rate {self_hit:.2f}")

    summary = {
        "nodes": dg.num_entities, "nnz": dg.num_edges, "dim": args.dim,
        "iters": args.iters, "build_wall_s": round(build_wall, 1),
        "embed_wall_cold_s": round(wall_a, 1),
        "embed_wall_warm_s": round(wall_a2, 1),
        "edge_ops_per_s": round(dg.num_edges * args.iters / wall_a2),
        "resume_bitwise": (None if args.skip_kill else bool(bitwise)),
        "self_top1": self_hit, "peak_rss_gb": round(rss_gb(), 2),
    }
    print("DRESS_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
