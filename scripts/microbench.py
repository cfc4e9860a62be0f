"""Host microbenchmarks — the counterpart of the reference's criterion suite
(/root/reference/benches/cleora_benchmark.rs: hash functions + cartesian
product generation), extended with the ingest-phase timings that matter here.

    PYTHONPATH=. python scripts/microbench.py
"""

import time

import numpy as np

from cleora_tpu.graph.hashing import hash_entities, init_embeddings
from cleora_tpu.graph.native import build_graph_native, native_available
from cleora_tpu.graph.builder import build_graph


def bench(label, fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t)
    print(f"{label:<44s} {best * 1e3:10.1f} ms")
    return best


def main():
    rng = np.random.default_rng(0)

    # XXH64 hashing throughput (vectorized numpy path)
    words = [f"entity_{i}" for i in range(200_000)]
    t = bench("xxh64 hash_entities (200k strings)", hash_entities, words)
    print(f"  -> {len(words) / t / 1e6:.2f} M hashes/s")

    # deterministic init
    hashes = hash_entities(words[:50_000])
    t = bench("init_embeddings (50k x 256)", init_embeddings, hashes, 256, 0)
    print(f"  -> {50_000 * 256 / t / 1e6:.1f} M values/s")

    # clique expansion / build (pairs + hyperedges)
    pair_lines = [
        f"n{rng.integers(0, 30_000)} n{rng.integers(0, 30_000)}"
        for _ in range(200_000)
    ]
    hyper_lines = [
        " ".join(f"e{rng.integers(0, 5_000)}" for _ in range(rng.integers(2, 9)))
        for _ in range(30_000)
    ]
    for label, lines in [("pairs 200k", pair_lines),
                         ("hyperedges 30k (2-8 nodes)", hyper_lines)]:
        if native_available():
            t = bench(f"native build {label}", build_graph_native, lines,
                      "complex::reflexive::node")
            print(f"  -> {len(lines) / t / 1e6:.2f} M lines/s")
        t = bench(f"numpy build {label}", build_graph, lines,
                  "complex::reflexive::node")
        print(f"  -> {len(lines) / t / 1e6:.2f} M lines/s")


if __name__ == "__main__":
    main()
