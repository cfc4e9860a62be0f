"""TPU throughput of the sibling-algorithm device backends (P2).

embed_prone / embed_randne with ``backend="device"`` run their propagation
loops on the production sliced-ELL SpMM layout
(cleora_tpu/algorithms.py:_device_layout, module-level jitted cores).

Measurement notes (hard-won, tunnel environment):
* fetch SCALARS to time (bench.py pattern) — a full (1M, 256) fetch through
  the remote-TPU tunnel wedged indefinitely on this host;
* time the JITTED CORE with device-RESIDENT operands — per-call operand
  re-upload (~1.1 GB) dominated an API-level timing 100:1 in a slow tunnel
  window.  The API-level cost is plan-once + upload-once by construction
  (module-level jit caches the trace), so the core timing is the honest
  steady-state number.

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
    import jax.numpy as jnp

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
    n = g.num_entities
    nnz = g.num_edges
    print(f"graph: {n} nodes, {nnz} nnz "
          f"(build {time.perf_counter() - t:.1f}s)", flush=True)

    # host prep shared by both algorithms: sym-normalized values + ELL plan
    rows, cols, vals, _, _ = g.to_sparse_csr()
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, rows.astype(np.int64), vals.astype(np.float64))
    dis = 1.0 / np.sqrt(np.maximum(deg, 1e-10))
    nvals = (dis[rows.astype(np.int64)] * vals.astype(np.float64)
             * dis[cols.astype(np.int64)]).astype(np.float32)
    t = time.perf_counter()
    layout, order, rank = alg._device_layout(
        rows.astype(np.int32), cols.astype(np.int32), nvals, n, dim)
    print(f"plan: {time.perf_counter() - t:.1f}s "
          f"(ELL={order is not None})", flush=True)
    R = np.random.default_rng(0).standard_normal((n, dim)).astype(np.float32)
    if order is not None:
        R = R[order]

    # upload once; jnp.asarray on jnp arrays is a no-op, so re-wrap is safe
    t = time.perf_counter()
    layout_dev = jax.tree_util.tree_map(jnp.asarray, layout)
    R_dev = jnp.asarray(R)
    _ = float(R_dev[0, 0])
    print(f"upload: {time.perf_counter() - t:.1f}s", flush=True)

    weights = [1.0 / (2 ** i) for i in range(rand_iters + 1)]
    w_dev = jnp.asarray(np.asarray(weights, dtype=np.float32))

    def prone_call():
        return alg._cheb_jit()(
            *layout_dev, R_dev, jnp.float32(0.5), jnp.float32(0.2),
            n_rows=n, kmax=min(10, n),
        )

    def randne_call():
        return alg._weighted_sum_jit()(
            *layout_dev, R_dev, w_dev, n_rows=n, steps=rand_iters,
        )

    for name, fn, spmms in [
        ("prone", prone_call, 9),        # 1 + 8 Chebyshev L-muls
        ("randne", randne_call, rand_iters),
    ]:
        t = time.perf_counter()
        out = fn()
        _ = float(out[0, 0])  # scalar fetch; block_until_ready lies via tunnel
        warm = time.perf_counter() - t
        print(f"{name} device warmup {warm:.1f}s", flush=True)
        for _rep in range(2):
            t = time.perf_counter()
            out = fn()
            _ = float(out[0, 0])
            dt = time.perf_counter() - t
            print(f"{name} device propagate: {dt:.2f}s "
                  f"= {nnz * spmms / dt / 1e6:.1f} M edge-ops/s", flush=True)
        # scalar-only sanity: np.asarray on ANY device slice uses the
        # transfer RPC that wedges through this tunnel (scalar conversion
        # does not — empirically)
        assert np.isfinite(float(out[0, 0])) and np.isfinite(
            float(out[-1, -1]))
        del out

        # host float64 (the reference-semantics path), same shape.
        # Prep (adjacency build + sym-normalize) happens OUTSIDE the timed
        # region — the device number likewise excludes its plan/upload prep
        # (printed separately above), so the comparison is propagate-only
        # on both sides.
        N, _ = alg._sym_normalized(alg._adjacency(g))
        r = np.random.default_rng(0).standard_normal((n, dim))
        t = time.perf_counter()
        if name == "prone":
            from scipy.sparse import eye

            L = eye(n) - N
            U = r.copy()
            prev = r.copy()
            curr = alg._dense(L @ r)
            for k in range(2, 10):
                nxt = alg._dense(2 * (L @ curr) - prev)
                U += np.exp(-0.5 * k) * 0.2 * nxt
                prev, curr = curr, nxt
        else:
            U = weights[0] * r
            current = r.copy()
            for i in range(rand_iters):
                current = alg._dense(N @ current)
                U += weights[i + 1] * current
        ht = time.perf_counter() - t
        print(f"{name} host-f64 propagate: {ht:.2f}s "
              f"→ device speedup {ht / dt:.1f}x", flush=True)


if __name__ == "__main__":
    main()
