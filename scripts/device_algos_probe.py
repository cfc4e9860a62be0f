"""TPU wall-clock for the round-2 device algorithm backends (ROADMAP 6b).

Covers the four backends the first probe (algorithms_tpu_probe.py) does not:
HOPE (matrix-free Katz rSVD), the walk engine (DeepWalk/Node2Vec hops),
NetMF and GraRep (dense MXU transition powers + rSVD).

Same tunnel rules as the first probe: time the module-level jitted cores
with device-RESIDENT operands, fetch SCALARS only (block_until_ready lies
through the tunnel; GB-scale fetches can wedge).  Each core is compiled
once per shape; run the sections one at a time (remote compiles serialize).

Usage: python scripts/device_algos_probe.py [--cpu] [hope|walks|netmf|grarep]...
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CPU = "--cpu" in sys.argv
ONLY = [a for a in sys.argv[1:] if not a.startswith("-")]

import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _graph(n_nodes, n_und, seed=7):
    from cleora_tpu import SparseMatrix

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, size=n_und)
    dst = rng.integers(0, n_nodes, size=n_und)
    return SparseMatrix.from_edge_arrays(src, dst)


def _timed(name, fn, reps=2):
    import jax.numpy as jnp  # noqa: F401

    t = time.perf_counter()
    out = fn()
    _ = float(out.ravel()[0])
    print(f"{name} warmup (incl. compile) {time.perf_counter() - t:.1f}s",
          flush=True)
    best = None
    for _rep in range(reps):
        t = time.perf_counter()
        out = fn()
        _ = float(out.ravel()[0])
        dt = time.perf_counter() - t
        best = dt if best is None else min(best, dt)
        print(f"{name}: {dt:.2f}s", flush=True)
    assert np.isfinite(float(out.ravel()[0]))
    return best


def probe_hope():
    import jax.numpy as jnp

    import cleora_tpu.algorithms as alg

    n_nodes, n_und, feature_dim, beta = (
        (2000, 6000, 32, 0.005) if CPU else (1_000_000, 5_000_000, 128, 0.01)
    )
    g = _graph(n_nodes, n_und)
    rows, cols, vals, n, _ = g.to_sparse_csr()
    rows, cols = rows.astype(np.int32), cols.astype(np.int32)
    vals = vals.astype(np.float32)
    nnz = rows.shape[0]

    row_sums = np.zeros(n)
    np.add.at(row_sums, rows.astype(np.int64), np.abs(vals.astype(np.float64)))
    bn = beta * float(row_sums.max(initial=0.0))
    terms = max(2, min(int(np.ceil(np.log(1e-12) / np.log(bn))), 128))
    k = feature_dim // 2
    r = k + 8
    power_iters = 2

    layA, ordA, rnkA = alg._device_layout(rows, cols, vals, n, r)
    t_order = np.argsort(cols, kind="stable")
    layT, ordT, rnkT = alg._device_layout(
        cols[t_order], rows[t_order], vals[t_order], n, r
    )
    dev = jax.tree_util.tree_map(jnp.asarray, (layA, layT))
    layA_d, layT_d = dev
    ordA = jnp.asarray(ordA) if ordA is not None else None
    rnkA = jnp.asarray(rnkA) if rnkA is not None else None
    ordT = jnp.asarray(ordT) if ordT is not None else None
    rnkT = jnp.asarray(rnkT) if rnkT is not None else None
    omega = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, r)).astype(np.float32)
    )
    _ = float(omega[0, 0])

    spmms = terms * (2 + 2 * power_iters)  # Y, power iters (M∘MT), final MT
    print(f"hope: n={n} nnz={nnz} r={r} terms={terms} -> {spmms} SpMMs/call",
          flush=True)

    def call():
        return alg._hope_rsvd_jit()(
            layA_d, ordA, rnkA, layT_d, ordT, rnkT, omega, jnp.float32(beta),
            n_rows=n, terms=terms, k=k, power_iters=power_iters,
        )

    dt = _timed("hope rsvd core", call)
    print(f"hope: {nnz * spmms / dt / 1e6:.1f} M edge-ops/s "
          f"(width {r})", flush=True)


def probe_walks():
    import jax.numpy as jnp

    import cleora_tpu.algorithms as alg

    n_nodes, n_und, walk_length, batch = (
        (2000, 6000, 10, 1024) if CPU else (1_000_000, 5_000_000, 80, 262_144)
    )
    g = _graph(n_nodes, n_und)
    indptr, cols, deg, n = alg._walk_csr(g)
    d_indptr, d_cols, d_deg = (
        jnp.asarray(indptr), jnp.asarray(cols), jnp.asarray(deg),
    )
    starts = np.nonzero(deg > 0)[0].astype(np.int32)[:batch]
    if starts.shape[0] < batch:
        starts = np.resize(starts, batch)
    d_starts = jnp.asarray(starts)
    key = jax.random.PRNGKey(0)
    _ = float(d_starts[0])
    fn = alg._device_walk_jit()

    def call():
        return fn(d_indptr, d_cols, d_deg, d_starts, key,
                  walk_length=walk_length, n_rows=n)

    dt = _timed("walk batch", call)
    hops = batch * (walk_length - 1)
    print(f"walks: {batch / dt / 1e3:.0f} K walks/s, "
          f"{hops / dt / 1e6:.1f} M hops/s (len {walk_length})", flush=True)


def probe_walks2():
    import jax.numpy as jnp

    import cleora_tpu.algorithms as alg

    # NOTE: a 262144×80 second-order program crashed the v5e worker
    # (recovered on restart); 65536-wide shapes run fine — hence
    # _WALK2_BATCH and this probe shape.
    n_nodes, n_und, walk_length, batch = (
        (2000, 6000, 10, 1024)
        if CPU else (1_000_000, 5_000_000, 80, alg._WALK2_BATCH)
    )
    g = _graph(n_nodes, n_und)
    indptr, cols, deg, n, vals, wmax, wsum = alg._walk_csr(g, with_vals=True)
    bsteps = max(1, int(np.ceil(np.log2(int(deg.max(initial=0)) + 2))))
    dev = (jnp.asarray(indptr), jnp.asarray(cols), jnp.asarray(vals),
           jnp.asarray(deg), jnp.asarray(wmax), jnp.asarray(wsum))
    starts = np.nonzero(deg > 0)[0].astype(np.int32)[:batch]
    if starts.shape[0] < batch:
        starts = np.resize(starts, batch)
    d_starts = jnp.asarray(starts)
    key = jax.random.PRNGKey(0)
    _ = float(d_starts[0])
    fn = alg._device_walk2_jit()
    print(f"walks2: bsteps={bsteps} batch={batch} "
          f"chunk={alg._WALK2_CHUNK}", flush=True)

    def call():
        # p=0.5, q=2 → inv_p=2, inv_q=0.5 (the production kwargs order)
        return fn(*dev, d_starts, key, jnp.float32(2.0), jnp.float32(0.5),
                  walk_length=walk_length, n_rows=n,
                  tries=alg._WALK2_TRIES, bsteps=bsteps,
                  chunk=alg._WALK2_CHUNK)

    dt = _timed("walk2 batch (p=0.5, q=2)", call)
    hops = batch * (walk_length - 1)
    print(f"walks2: {batch / dt / 1e3:.0f} K walks/s, "
          f"{hops / dt / 1e6:.1f} M hops/s (len {walk_length})", flush=True)


def _dense_inputs(n_nodes, n_und):
    import jax.numpy as jnp

    g = _graph(n_nodes, n_und)
    rows, cols, vals, n, _ = g.to_sparse_csr()
    return (
        jnp.asarray(rows.astype(np.int32)),
        jnp.asarray(cols.astype(np.int32)),
        jnp.asarray(vals.astype(np.float32)),
        n, rows.shape[0],
    )


def probe_netmf():
    import jax.numpy as jnp

    import cleora_tpu.algorithms as alg

    n_nodes, n_und, k = (256, 1024, 16) if CPU else (16_384, 163_840, 128)
    rows, cols, vals, n, nnz = _dense_inputs(n_nodes, n_und)
    window, power_iters = 5, 2
    r = k + 10
    omega = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, r)).astype(np.float32)
    )
    _ = float(omega[0, 0])

    def call():
        return alg._netmf_dense_jit()(
            rows, cols, vals, omega, jnp.float32(1.0),
            n=n, window=window, k=k, power_iters=power_iters,
        )

    dt = _timed("netmf dense core", call)
    # window-1 transition powers + rsvd (1 + 2·power_iters + 1 wide matmuls)
    mm = (window - 1) * 2 * n**3 + (2 + 2 * power_iters) * 2 * n * n * r
    print(f"netmf: n={n} nnz={nnz} -> {mm / dt / 1e12:.1f} TFLOP/s dense",
          flush=True)


def probe_grarep():
    import jax.numpy as jnp

    import cleora_tpu.algorithms as alg

    n_nodes, n_und, k = (256, 1024, 8) if CPU else (16_384, 163_840, 64)
    rows, cols, vals, n, nnz = _dense_inputs(n_nodes, n_und)
    max_step, power_iters = 4, 2
    r = k + 10
    omega = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((max_step, n, r)).astype(np.float32)
    )
    _ = float(omega[0, 0, 0])

    def call():
        return alg._grarep_dense_jit()(
            rows, cols, vals, omega,
            n=n, max_step=max_step, k=k, power_iters=power_iters,
        )

    dt = _timed("grarep dense core", call)
    mm = (max_step - 1) * 2 * n**3 + max_step * (2 + 2 * power_iters) * 2 * n * n * r
    print(f"grarep: n={n} nnz={nnz} -> {mm / dt / 1e12:.1f} TFLOP/s dense",
          flush=True)


PROBES = {"hope": probe_hope, "walks": probe_walks, "walks2": probe_walks2,
          "netmf": probe_netmf, "grarep": probe_grarep}

if __name__ == "__main__":
    for name in (ONLY or list(PROBES)):
        print(f"=== {name} ===", flush=True)
        PROBES[name]()
