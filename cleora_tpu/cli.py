"""Command-line interface (reference: /root/reference/pycleora/cli.py):
``cleora-tpu embed|info|benchmark|similar`` with the same flags and output.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cleora-tpu",
        description="cleora_tpu - TPU-native Graph Embedding CLI",
    )
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("embed", help="Generate graph embeddings")
    p.add_argument("--input", "-i", required=True,
                   help="Input edge file (TSV/CSV/space-separated)")
    p.add_argument("--output", "-o", default=None,
                   help="Output file (npz/csv/tsv); required except with "
                        "--shard (which builds a graph piece, no "
                        "embeddings)")
    p.add_argument("--dim", "-d", type=int, default=256,
                   help="Embedding dimension (default: 256)")
    p.add_argument("--iterations", "-n", type=int, default=40,
                   help="Number of iterations (default: 40)")
    p.add_argument("--propagation", "-p", choices=["left", "symmetric"],
                   default="left")
    p.add_argument("--normalization", choices=["l2", "l1", "none"], default="l2")
    p.add_argument("--columns", "-c", default="complex::reflexive::node",
                   help="Column definition")
    p.add_argument("--algorithm", "-a", default="cleora",
                   choices=["cleora", "prone", "randne", "hope", "netmf",
                            "grarep", "deepwalk", "node2vec"])
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="Embedding storage dtype (bfloat16 halves HBM)")
    p.add_argument("--backend", choices=["host", "device"], default="host",
                   help="Sibling-algorithm compute backend: 'device' runs "
                        "prone/randne/hope/netmf/grarep/deepwalk/node2vec "
                        "on the TPU (cleora itself always runs on device)")
    p.add_argument("--factorization", choices=["host", "device", "sharded"],
                   default=None,
                   help="deepwalk/node2vec PPMI factorization: 'device' "
                        "runs a randomized SVD on the TPU instead of host "
                        "ARPACK (requires --backend device; implied by "
                        "--cooccurrence device); 'sharded' keeps each "
                        "count partition on its counting device and runs "
                        "the SVD mesh-sharded (requires --cooccurrence "
                        "device + --sharded; auto-engaged past one chip's "
                        "HBM)")
    p.add_argument("--cooccurrence", choices=["host", "device"],
                   default="host",
                   help="deepwalk/node2vec pair counting: 'device' keeps "
                        "the whole walk pipeline TPU-resident — the right "
                        "mode on weak or remote hosts (requires --backend "
                        "device; implies the device factorization)")
    p.add_argument("--walk-tables",
                   choices=["auto", "replicated", "sharded"],
                   default="auto",
                   help="deepwalk/node2vec walk-CSR placement: 'sharded' "
                        "row-partitions the tables over the --sharded "
                        "mesh (owner-routed hops, value-identical walks) "
                        "for edge lists past one chip's HBM; 'auto' "
                        "fit-checks")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--streaming", metavar="DIR", default=None,
                   help="Out-of-core build: spill the graph to DIR "
                        "(bounded RAM; for inputs too big to build "
                        "in-memory; cleora algorithm only; unlike the "
                        "in-memory path, # comment lines are not stripped)")
    p.add_argument("--shard", metavar="K/P", default=None,
                   help="With --streaming: build only row shard K of P "
                        "(multi-host sharded ingest — every host scans the "
                        "input, each sorts/merges 1/P of it) and exit; "
                        "combine pieces with the merge-shards command")
    p.add_argument("--entities", type=int, default=None,
                   help="With --shard: the global entity count (e.g. from "
                        "host 0's pass), skipping the index-only first scan")
    p.add_argument("--sharded", nargs="?", const=0, type=int, default=None,
                   metavar="N",
                   help="Multi-device embed over an N-device mesh (omit N "
                        "to use every visible device).  cleora: sharded "
                        "loop; with a .npy --output the embedding streams "
                        "shard-by-shard into the file — no host ever holds "
                        "the full (N, D) matrix.  Sibling algorithms "
                        "(--backend device): sharded propagate loops / "
                        "walk lanes / pass-parallel counting")
    p.add_argument("--checkpoint-dir", default=None, metavar="DIR",
                   help="cleora + --sharded: persist the sharded loop "
                        "state to DIR every --checkpoint-every iterations. "
                        "deepwalk/node2vec + --cooccurrence device: "
                        "persist each finished counting pass (every K-th) "
                        "— a killed run resumes byte-identically.  Either "
                        "way an interrupted run resumes from the last "
                        "complete checkpoint")
    p.add_argument("--checkpoint-every", type=int, default=None, metavar="K",
                   help="Checkpoint cadence — iterations (cleora, default "
                        "10) or counting passes (walk pipeline, default 1)")
    p.add_argument("--verbose", "-v", action="store_true")

    p = sub.add_parser(
        "merge-shards",
        help="Concatenate sharded streaming-build pieces into one graph dir",
    )
    p.add_argument("pieces", nargs="+", help="Piece directories (any order)")
    p.add_argument("--output", "-o", required=True, help="Merged graph dir")
    p.add_argument("--verbose", "-v", action="store_true")

    p = sub.add_parser(
        "scaling",
        help="Measure multi-device scaling efficiency (hard >=80%% gate)",
    )
    p.add_argument("--smoke", action="store_true",
                   help="Tiny shapes / few iterations — structural check")
    p.add_argument("--check", nargs="?", const=-1.0, type=float,
                   default=None, metavar="X",
                   help="Gate: efficiency at the largest device count must "
                        "be >= X (default 0.80, the BASELINE target); "
                        "exits 2 on FAIL")
    p.add_argument("--json", default=None, metavar="PATH",
                   help="Write the measurement table as JSON")
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend (virtual mesh)")

    p = sub.add_parser("info", help="Show graph information")
    p.add_argument("--input", "-i", required=True, help="Input edge file")
    p.add_argument("--columns", "-c", default="complex::reflexive::node")

    p = sub.add_parser(
        "plan",
        help="Pre-deployment capacity report: layout, per-device HBM fit, "
             "walk-pipeline placement (pure host — no device dispatch)",
    )
    p.add_argument("--input", "-i", required=True,
                   help="Input edge file OR a streaming-build graph dir")
    p.add_argument("--columns", "-c", default="complex::reflexive::node")
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--devices", type=int, default=1,
                   help="Planned mesh size")
    p.add_argument("--hbm-gib", type=float, default=None,
                   help="Per-device HBM budget to plan for "
                        "(default: live device, else 16 = v5e)")
    p.add_argument("--walks", action="store_true",
                   help="Also plan the DeepWalk/Node2Vec device pipeline")
    p.add_argument("--num-walks", type=int, default=10)
    p.add_argument("--walk-length", type=int, default=80)
    p.add_argument("--window", type=int, default=5)
    p.add_argument("--second-order", action="store_true",
                   help="Plan the Node2Vec (p/q) engine's larger tables")
    p.add_argument("--json", default=None, metavar="PATH",
                   help="Also write the raw report dict as JSON "
                        "('-' for stdout instead of the text report)")

    p = sub.add_parser("benchmark", help="Run benchmarks")
    p.add_argument("--dataset", "-d", default="karate_club", help="Dataset name")
    p.add_argument("--dim", type=int, default=256)

    p = sub.add_parser("similar", help="Find similar entities")
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--columns", "-c", default="complex::reflexive::node")
    p.add_argument("--entity", "-e", required=True, help="Query entity")
    p.add_argument("--top-k", "-k", type=int, default=10)
    p.add_argument("--dim", "-d", type=int, default=256)

    args = parser.parse_args(argv)
    if args.command is None:
        parser.print_help()
        return
    rc = {"embed": _cmd_embed, "info": _cmd_info,
          "benchmark": _cmd_benchmark, "similar": _cmd_similar,
          "merge-shards": _cmd_merge_shards,
          "scaling": _cmd_scaling, "plan": _cmd_plan}[args.command](args)
    if rc:
        raise SystemExit(rc)


def _read_edges(filepath):
    """Strip blank lines and # comments (reference cli.py:58-66)."""
    edges = []
    with open(filepath, "r") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                edges.append(line)
    return edges


def _cmd_embed(args):
    from .sparse import SparseMatrix

    import os

    if args.shard is not None and args.streaming is None:
        raise SystemExit("--shard requires --streaming DIR")
    if args.output is None and args.shard is None:
        raise SystemExit("--output is required (omit it only with --shard)")

    if (args.streaming is None and os.path.isdir(args.input)
            and os.path.exists(os.path.join(args.input, "meta.json"))):
        # a finished streaming-build directory (e.g. merge-shards output):
        # embed straight off the on-disk CSR
        if args.algorithm != "cleora":
            raise SystemExit(
                "graph-directory input supports only --algorithm cleora"
            )
        from .graph.stream import DiskGraph

        _finish_embed(args, DiskGraph(args.input))
        return

    if args.streaming is not None:
        # out-of-core: file streams through the spill/merge builder and the
        # embed reads the resulting on-disk CSR one row block at a time
        if args.algorithm != "cleora":
            raise SystemExit(
                "--streaming supports only --algorithm cleora"
            )
        if args.shard is not None:
            from .graph.stream import build_graph_streaming_sharded

            try:
                k, p = (int(x) for x in args.shard.split("/"))
            except ValueError:
                raise SystemExit("--shard must look like K/P, e.g. 0/4")
            t0 = time.time()
            piece = build_graph_streaming_sharded(
                [args.input], args.columns, args.streaming, k, p, files=True,
                n_entities=args.entities,
            )
            lo, hi = piece.meta["row_range"]
            print(f"Built shard {k}/{p} (rows [{lo}, {hi}) of "
                  f"{piece.num_entities}; {piece.num_edges} edges, "
                  f"{time.time() - t0:.2f}s) -> {args.streaming}")
            return
        from .graph.stream import build_graph_streaming

        if args.verbose:
            print(f"Streaming build of {args.input} -> {args.streaming} ...")
        t0 = time.time()
        graph = build_graph_streaming(
            [args.input], args.columns, args.streaming, files=True
        )
        if args.verbose:
            print(f"  {graph.num_entities} entities, {graph.num_edges} "
                  f"edges ({time.time() - t0:.2f}s)")
        _finish_embed(args, graph)
        return

    if args.verbose:
        print(f"Reading edges from {args.input}...")
    edges = _read_edges(args.input)
    if args.verbose:
        print(f"  {len(edges)} edges loaded")
        print(f"Building graph (columns={args.columns})...")

    t0 = time.time()
    graph = SparseMatrix.from_iterator(iter(edges), args.columns)
    if args.verbose:
        print(f"  {graph.num_entities} entities, {graph.num_edges} edges "
              f"({time.time() - t0:.2f}s)")

    _finish_embed(args, graph)


def _finish_embed(args, graph):
    from . import embed
    from .algorithms import (embed_deepwalk, embed_grarep, embed_hope,
                             embed_netmf, embed_node2vec, embed_prone,
                             embed_randne)
    from .io_utils import save_embeddings

    if args.verbose:
        print(f"Generating {args.dim}-dim embeddings using {args.algorithm}...")

    t0 = time.time()
    be = getattr(args, "backend", "host")
    if be == "device" and args.algorithm == "cleora":
        raise SystemExit(
            "--backend device is not applicable to --algorithm cleora "
            "(cleora always runs on device)"
        )
    walk_algo = args.algorithm in ("deepwalk", "node2vec")
    walk_lifecycle = (walk_algo
                      and getattr(args, "cooccurrence", "host") == "device")
    if getattr(args, "checkpoint_dir", None):
        if walk_algo and not walk_lifecycle:
            raise SystemExit(
                "--checkpoint-dir with deepwalk/node2vec requires "
                "--cooccurrence device (the counting checkpoint is "
                "per device counting pass)"
            )
        if not walk_algo and args.sharded is None:
            raise SystemExit("--checkpoint-dir requires --sharded")
        if not walk_algo and args.algorithm != "cleora":
            raise SystemExit(
                "--checkpoint-dir supports --algorithm cleora and the "
                "device walk pipeline (deepwalk/node2vec + "
                "--cooccurrence device)"
            )
    mesh = None
    if getattr(args, "sharded", None) is not None and args.algorithm != "cleora":
        # sibling algorithms run their whole device pipeline over a mesh
        # (sharded propagate loops / walk lanes / pass-parallel counting /
        # mesh-sharded PPMI factorization)
        if be != "device":
            raise SystemExit(
                "--sharded with a sibling algorithm requires --backend device"
            )
        from .parallel.mesh import make_mesh

        mesh = make_mesh(args.sharded or None)
    elif getattr(args, "sharded", None) is not None:
        # scale lifecycle: the sharded loop with optional checkpointing and
        # memory-bounded direct-to-.npy output (parallel/embed.py)
        from .parallel.embed import embed_sharded

        to_npy = args.output.endswith(".npy")
        emb = embed_sharded(
            graph, feature_dim=args.dim, num_iterations=args.iterations,
            propagation=args.propagation, normalization=args.normalization,
            seed=args.seed, dtype=args.dtype,
            n_devices=args.sharded or None,
            out=args.output if to_npy else "full",
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=(10 if args.checkpoint_every is None
                              else args.checkpoint_every),
        )
        dt = time.time() - t0
        if to_npy:
            print(f"{graph.num_entities} entities -> {emb.shape} streamed "
                  f"to {args.output} ({dt:.2f}s)")
            return
        from .io_utils import save_embeddings as _save

        fmt = ("csv" if args.output.endswith(".csv")
               else "tsv" if args.output.endswith(".tsv") else "npz")
        _save(graph, emb, args.output, format=fmt)
        print(f"{graph.num_entities} entities -> {emb.shape} saved to "
              f"{args.output} ({dt:.2f}s)")
        return
    fact = getattr(args, "factorization", None)
    cooc = getattr(args, "cooccurrence", "host")
    wtab = getattr(args, "walk_tables", "auto")
    if wtab != "auto" and args.algorithm not in ("deepwalk", "node2vec"):
        raise SystemExit(
            "--walk-tables applies only to --algorithm deepwalk/node2vec"
        )
    if fact is not None or cooc != "host":
        if args.algorithm not in ("deepwalk", "node2vec"):
            raise SystemExit(
                "--factorization/--cooccurrence apply only to "
                "--algorithm deepwalk/node2vec"
            )
        if be != "device":
            raise SystemExit(
                "--factorization/--cooccurrence device require "
                "--backend device"
            )
        if fact == "host" and cooc == "device":
            raise SystemExit(
                "--cooccurrence device runs the factorization on device; "
                "drop --factorization host"
            )
    algo_map = {
        "cleora": lambda: embed(graph, args.dim, args.iterations,
                                args.propagation, args.normalization, args.seed,
                                dtype=args.dtype),
        "prone": lambda: embed_prone(graph, args.dim, seed=args.seed,
                                     backend=be, mesh=mesh),
        "randne": lambda: embed_randne(graph, args.dim, seed=args.seed,
                                       backend=be, mesh=mesh),
        "hope": lambda: embed_hope(graph, args.dim, backend=be, mesh=mesh),
        "netmf": lambda: embed_netmf(graph, args.dim, seed=args.seed,
                                     backend=be, mesh=mesh),
        "grarep": lambda: embed_grarep(graph, args.dim, seed=args.seed,
                                       backend=be, mesh=mesh),
        "deepwalk": lambda: embed_deepwalk(graph, args.dim, seed=args.seed,
                                           backend=be, factorization=fact,
                                           cooccurrence=cooc, mesh=mesh,
                                           walk_tables=wtab, **walk_kw),
        "node2vec": lambda: embed_node2vec(graph, args.dim, seed=args.seed,
                                           backend=be, factorization=fact,
                                           cooccurrence=cooc, mesh=mesh,
                                           walk_tables=wtab, **walk_kw),
    }
    walk_kw = {}
    if walk_lifecycle:
        walk_kw = {
            "checkpoint_dir": getattr(args, "checkpoint_dir", None),
            "checkpoint_every": (1 if args.checkpoint_every is None
                                 else args.checkpoint_every),
        }
        if args.output.endswith(".npy"):
            # stream the final embedding straight into the .npy (bounded
            # chunked fetches, no (n, d) host materialization)
            walk_kw["out"] = args.output
    emb = algo_map[args.algorithm]()
    if walk_kw.get("out"):
        print(f"{graph.num_entities} entities -> {emb.shape} streamed "
              f"to {args.output} ({time.time() - t0:.2f}s)")
        return

    if args.verbose:
        print(f"  Shape: {emb.shape} ({time.time() - t0:.2f}s)")
        print(f"Saving to {args.output}...")

    fmt = "npz"
    if args.output.endswith(".csv"):
        fmt = "csv"
    elif args.output.endswith(".tsv"):
        fmt = "tsv"
    save_embeddings(graph, emb, args.output, format=fmt)

    if args.verbose:
        print("Done!")
    else:
        print(f"{graph.num_entities} entities -> {emb.shape} saved to "
              f"{args.output}")


def _cmd_scaling(args):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from .scaling import TARGET_EFFICIENCY, run_report

    check = args.check
    if check is not None and check < 0:  # bare --check → baseline target
        check = TARGET_EFFICIENCY
    return run_report(smoke=args.smoke, check=check, json_path=args.json)


def _cmd_merge_shards(args):
    from .graph.stream import merge_disk_graph_shards

    t0 = time.time()
    merged = merge_disk_graph_shards(args.pieces, args.output)
    print(f"Merged {len(args.pieces)} piece(s) -> {args.output} "
          f"({merged.num_entities} entities, {merged.num_edges} edges, "
          f"{time.time() - t0:.2f}s)")


def _cmd_info(args):
    from .sparse import SparseMatrix

    graph = SparseMatrix.from_iterator(iter(_read_edges(args.input)),
                                       args.columns)
    print(f"Graph: {graph.num_entities} entities, {graph.num_edges} edges")
    print(f"Columns: {args.columns}")
    degrees = graph.entity_degrees
    print(f"Degree stats: min={degrees.min():.0f}, max={degrees.max():.0f}, "
          f"mean={degrees.mean():.1f}, median={np.median(degrees):.1f}")


def _cmd_plan(args):
    import os

    from .plan import format_plan, plan_report

    if os.path.isdir(args.input) and \
            os.path.exists(os.path.join(args.input, "meta.json")):
        from .graph.stream import DiskGraph

        graph = DiskGraph(args.input)
    else:
        from .sparse import SparseMatrix

        graph = SparseMatrix.from_iterator(iter(_read_edges(args.input)),
                                           args.columns)
    rep = plan_report(
        graph, feature_dim=args.dim, dtype=args.dtype,
        n_devices=args.devices, hbm_gib=args.hbm_gib, walks=args.walks,
        num_walks=args.num_walks, walk_length=args.walk_length,
        window_size=args.window, second_order=args.second_order,
    )
    if args.json is not None:
        import json

        if args.json == "-":
            print(json.dumps(rep))
            return
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=2)
    print(format_plan(rep))


def _cmd_benchmark(args):
    from . import embed
    from .algorithms import (embed_deepwalk, embed_node2vec, embed_prone,
                             embed_randne)
    from .benchmark import benchmark_algorithms, format_benchmark_table
    from .datasets import load_dataset
    from .sparse import SparseMatrix

    ds = load_dataset(args.dataset)
    graph = SparseMatrix.from_iterator(iter(ds["edges"]), ds["columns"])
    algorithms = {
        "cleora": lambda g: embed(g, args.dim, 40),
        "prone": lambda g: embed_prone(g, args.dim),
        "randne": lambda g: embed_randne(g, args.dim),
        "deepwalk": lambda g: embed_deepwalk(g, args.dim),
        "node2vec": lambda g: embed_node2vec(g, args.dim),
    }
    print(f"Benchmarking on {ds['name']} ({ds['num_nodes']} nodes)...")
    results = benchmark_algorithms(graph, ds["labels"], algorithms)
    print(format_benchmark_table(results))


def _cmd_similar(args):
    from . import embed, find_most_similar
    from .sparse import SparseMatrix

    graph = SparseMatrix.from_iterator(iter(_read_edges(args.input)),
                                       args.columns)
    emb = embed(graph, args.dim)
    for r in find_most_similar(graph, emb, args.entity, top_k=args.top_k):
        print(f"  {r['entity_id']:<30s} similarity={r['similarity']:.4f}")


if __name__ == "__main__":
    main()
