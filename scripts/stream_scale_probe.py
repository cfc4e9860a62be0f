"""Out-of-core build scale probe: stream a synthetic pair graph of arbitrary
size through the spill/merge path under a RAM cap, reporting wall time, peak
RSS, runs spilled, and output sizes.

The 1B-pair target (BASELINE.json; VERDICT r1 item 4):
    python scripts/stream_scale_probe.py --pairs 1000000000 --nodes 50000000 \
        --ram-cap-gb 4 --out /tmp/stream_1b
Smoke scale:
    python scripts/stream_scale_probe.py --pairs 20000000 --nodes 2000000

RAM profile: the pair stream is bounded by the cap (sorted runs spill to
disk); the entity registry (hash table, id arena, row sums, occurrence)
stays in RAM and scales with --nodes, not --pairs.
"""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=20_000_000)
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--ram-cap-gb", type=float, default=2.0)
    ap.add_argument("--chunk", type=int, default=8_000_000)
    ap.add_argument("--out", default="/tmp/stream_scale")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--shard", default=None, metavar="K/P",
                    help="Build only row shard K of P (multi-host sharded "
                         "ingest; rows cut by shard_row_bounds over --nodes "
                         "— exact for the two-column pair feed where ids "
                         "are first-seen-dense)")
    ap.add_argument("--columns", default="complex::reflexive::node",
                    help="'complex::a complex::b' emits 2 entries/pair "
                         "(roadNet-style) vs 8 for the reflexive clique — "
                         "use it for the 1B run to bound disk")
    args = ap.parse_args()

    from cleora_tpu.graph.stream import build_graph_streaming_pairs

    def chunks():
        rng = np.random.default_rng(7)
        left = args.pairs
        fed = 0
        t0 = time.perf_counter()
        while left > 0:
            n = min(args.chunk, left)
            yield (rng.integers(0, args.nodes, n),
                   rng.integers(0, args.nodes, n))
            left -= n
            fed += n
            el = time.perf_counter() - t0
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
            print(f"  fed {fed/1e6:.0f}M pairs  {fed/el/1e6:.1f} M pairs/s  "
                  f"peak RSS {rss:.1f} GB", flush=True)

    row_range = None
    if args.shard is not None:
        from cleora_tpu.graph.stream import shard_row_bounds

        k, p = (int(x) for x in args.shard.split("/"))
        # pair ids are dense in [0, nodes) and (for big runs) all appear,
        # so the entity count equals --nodes; no counting pass needed
        bounds = shard_row_bounds(args.nodes, p)
        row_range = (bounds[k], bounds[k + 1])
        print(f"shard {k}/{p}: rows [{row_range[0]}, {row_range[1]})")

    t0 = time.perf_counter()
    dg = build_graph_streaming_pairs(
        chunks(), args.columns, args.out,
        ram_cap_bytes=int(args.ram_cap_gb * (1 << 30)),
        row_range=row_range,
    )
    wall = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out_bytes = sum(
        os.path.getsize(os.path.join(args.out, f))
        for f in os.listdir(args.out)
    )
    print(f"DONE pairs={args.pairs:,} nodes={dg.num_entities:,} "
          f"nnz={dg.num_edges:,}")
    print(f"wall {wall:.1f}s = {args.pairs/wall/1e6:.1f} M pairs/s; "
          f"peak RSS {rss:.2f} GB (cap {args.ram_cap_gb} GB on the pair "
          f"stream); output {out_bytes/1e9:.1f} GB on disk")
    # sanity: CSR indptr is consistent
    assert int(dg.indptr[-1]) == dg.num_edges  # holds for shards too
    if not args.keep:
        import shutil

        shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
