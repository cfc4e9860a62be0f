"""TPU probe: the sharded production loop on a 1-device mesh, bench shape.

Quantifies the shard_map overhead of the multi-chip path on one real chip:
embed_sharded auto-selects the sharded sliced-ELL layout (parallel/ell.py),
so this should track the single-chip bench (88.5 M edge-ops/s) closely —
evidence that the pod path starts from single-chip-parity throughput.

    PYTHONPATH=. python scripts/sharded_one_chip_probe.py [--iters N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cleora_tpu.parallel.embed import build_sharded_embed
from cleora_tpu.parallel.ell import ell_shards
from cleora_tpu.parallel.mesh import make_mesh
from cleora_tpu.parallel.shard import shard_coo

N_NODES, N_UND = 1_965_206, 5_533_214  # bench.py shape
DIM = 256
ITERS = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 40


def synthetic_coo(seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N_NODES, size=N_UND, dtype=np.int64)
    dst = rng.integers(0, N_NODES, size=N_UND, dtype=np.int64)
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    deg = np.bincount(rows, minlength=N_NODES).astype(np.float64)
    vals = (1.0 / np.maximum(deg, 1.0))[rows].astype(np.float32)
    return rows.astype(np.int32), cols.astype(np.int32), vals


def main():
    rows, cols, vals = synthetic_coo()
    nnz = rows.shape[0]
    mesh = make_mesh(1)
    sharded = shard_coo(rows, cols, vals, N_NODES, 1)
    plan = ell_shards(sharded, d=DIM)
    assert plan is not None, "sharded ELL declined"
    print(f"sharded ELL: R={plan.R} slots/nnz={plan.slots / plan.nnz:.3f}",
          flush=True)

    fn, place = build_sharded_embed(
        mesh, sharded, DIM, ITERS, normalization="l2", do_whiten=True,
        ell=plan,
    )
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(
        (sharded.n_rows_padded, DIM)).astype(np.float32)
    args = place(x0)

    t = time.perf_counter()
    float(np.asarray(fn(*args))[0, 0])
    print(f"compile+first: {time.perf_counter() - t:.1f}s", flush=True)
    t = time.perf_counter()
    float(np.asarray(fn(*args))[0, 0])
    dt = time.perf_counter() - t
    print(f"sharded loop, 1-device mesh: {nnz * ITERS / dt / 1e6:.1f} M "
          f"edge-ops/s ({dt:.1f}s / {ITERS} iters)", flush=True)


if __name__ == "__main__":
    main()
