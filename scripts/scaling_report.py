"""Multi-device scaling-efficiency harness (BASELINE.json north star:
edges/s at 1 chip / 1 host / N hosts, ≥80% target).

Measures the fused sharded embed loop's edges/s at 1..N devices on whatever
mesh is available.  On a single-chip session use the virtual CPU mesh to
validate the harness and the collective structure:

    PYTHONPATH=. XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_report.py --cpu

On a pod slice, run as-is: edges/s and efficiency are then real.
"""

import sys
import time

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from cleora_tpu.ops.spmm import pad_coo  # noqa: E402
from cleora_tpu.parallel.embed import build_sharded_embed  # noqa: E402
from cleora_tpu.parallel.mesh import make_mesh  # noqa: E402
from cleora_tpu.parallel.shard import ShardedCoo, pad_rows, shard_coo  # noqa: E402


def synthetic(n_nodes, n_und, seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_und)
    dst = rng.integers(0, n_nodes, n_und)
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    deg = np.bincount(rows, minlength=n_nodes).astype(np.float64)
    vals = (1.0 / np.maximum(deg, 1.0))[rows].astype(np.float32)
    return rows, cols, vals


def main():
    n_dev_avail = len(jax.devices())
    small = jax.default_backend() == "cpu"
    n_nodes = 100_000 if small else 1_000_000
    n_und = 500_000 if small else 5_500_000
    iters = 4 if small else 40
    dim = 256

    rows, cols, vals = synthetic(n_nodes, n_und)
    nnz = len(rows)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((n_nodes, dim)).astype(np.float32)

    results = []
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev_avail]
    for nd in counts:
        mesh = make_mesh(nd)
        sharded = shard_coo(rows, cols, vals, n_nodes, nd)
        fn, place = build_sharded_embed(
            mesh, sharded, dim, num_iterations=iters, do_whiten=True,
        )
        xs, lr, cc, vv = place(pad_rows(x0, sharded.n_rows_padded))
        float(np.asarray(fn(xs, lr, cc, vv))[0, 0])  # compile+warm
        best = 1e9
        for _ in range(2):
            t = time.perf_counter()
            float(np.asarray(fn(xs, lr, cc, vv))[0, 0])
            best = min(best, time.perf_counter() - t)
        eps = nnz * iters / best
        results.append((nd, eps))
        base = results[0][1]
        eff = eps / (base * nd)
        print(f"devices={nd:3d}  {eps/1e6:9.1f} M edges/s  "
              f"scaling efficiency {eff:6.1%}")


if __name__ == "__main__":
    main()
