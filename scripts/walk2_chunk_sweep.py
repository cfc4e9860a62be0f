"""Sweep the second-order walker's proposals-per-round (_WALK2_CHUNK) on
the production probe shape (1M nodes / 11M nnz, 65,536 len-80 walks,
p=0.5/q=2).  Round-3's chunk=8 measured SLOWER than round-2's chunk=1
(21.1 s vs 9.68 s/batch) — this sweep finds the real optimum.

    PYTHONPATH=. python scripts/walk2_chunk_sweep.py [chunks...]
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

import cleora_tpu.algorithms as alg  # noqa: E402
from cleora_tpu import SparseMatrix  # noqa: E402


def _graph(n_nodes, n_und, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_und)
    dst = rng.integers(0, n_nodes, n_und)
    lines = (f"a{s} a{d}" for s, d in zip(src, dst))
    return SparseMatrix.from_iterator(lines, "complex::reflexive::a")


def main():
    chunks = [int(c) for c in sys.argv[1:]] or [1, 2, 4]
    n_nodes, n_und, walk_length, batch = 1_000_000, 5_000_000, 80, 65_536
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
    hops = batch * (walk_length - 1)
    print(f"bsteps={bsteps} batch={batch} tries={alg._WALK2_TRIES}",
          flush=True)

    for chunk in chunks:
        t0 = time.time()
        out = fn(*dev, d_starts, key, jnp.float32(2.0), jnp.float32(0.5),
                 walk_length=walk_length, n_rows=n,
                 tries=alg._WALK2_TRIES, bsteps=bsteps, chunk=chunk)
        _ = int(np.asarray(out[0, -1]))
        warm = time.time() - t0
        best = 1e9
        for _i in range(2):
            t0 = time.time()
            out = fn(*dev, d_starts, key, jnp.float32(2.0), jnp.float32(0.5),
                     walk_length=walk_length, n_rows=n,
                     tries=alg._WALK2_TRIES, bsteps=bsteps, chunk=chunk)
            _ = int(np.asarray(out[0, -1]))
            best = min(best, time.time() - t0)
        print(f"chunk={chunk:2d}: {best:6.2f}s/batch = "
              f"{hops / best / 1e6:5.2f} M hops/s  (warm incl compile "
              f"{warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
