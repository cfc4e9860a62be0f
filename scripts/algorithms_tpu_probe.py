"""TPU throughput of the sibling-algorithm device backends (P2).

embed_prone / embed_randne with ``backend="device"`` now run their
propagation loops on the production sliced-ELL SpMM layout
(cleora_tpu/algorithms.py:_device_layout).  This probe measures them at a
roadNet-like shape against the host float64 scipy path (which mirrors the
reference /root/reference/pycleora/algorithms.py numerics) on this host.

Usage: python scripts/algorithms_tpu_probe.py [--cpu]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CPU = "--cpu" in sys.argv

import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from cleora_tpu import SparseMatrix
    import cleora_tpu.algorithms as alg

    if CPU:
        n_nodes, n_und, dim, rand_iters = 2000, 6000, 32, 5
    else:
        n_nodes, n_und, dim, rand_iters = 1_000_000, 5_000_000, 256, 10

    rng = np.random.default_rng(7)
    src = rng.integers(0, n_nodes, size=n_und)
    dst = rng.integers(0, n_nodes, size=n_und)
    t = time.perf_counter()
    g = SparseMatrix.from_edge_arrays(src, dst)
    nnz = g.num_edges
    print(f"graph: {g.num_entities} nodes, {nnz} nnz "
          f"(build {time.perf_counter() - t:.1f}s)", flush=True)

    # ProNE device: kmax=10 → 17 SpMMs (1 + 2×8) inside one jit, then host SVD
    for name, fn, spmms in [
        ("prone", lambda b: alg.embed_prone(g, feature_dim=dim, backend=b),
         17),
        ("randne", lambda b: alg.embed_randne(
            g, feature_dim=dim, num_iterations=rand_iters, backend=b),
         rand_iters),
    ]:
        t = time.perf_counter()
        out_d = fn("device")
        warm = time.perf_counter() - t
        t = time.perf_counter()
        out_d = fn("device")
        dt = time.perf_counter() - t
        print(f"{name} device: {dt:.2f}s (warmup {warm:.1f}s) "
              f"= {nnz * spmms / dt / 1e6:.1f} M edge-ops/s incl. host SVD",
              flush=True)
        t = time.perf_counter()
        out_h = fn("host")
        ht = time.perf_counter() - t
        print(f"{name} host-f64: {ht:.2f}s  → device speedup {ht / dt:.1f}x",
              flush=True)
        gd = out_d[:512] @ out_d[:512].T
        gh = out_h[:512] @ out_h[:512].T
        print(f"{name} gram max|Δ| (512-row block): "
              f"{float(np.abs(gd - gh).max()):.2e}", flush=True)


if __name__ == "__main__":
    main()
