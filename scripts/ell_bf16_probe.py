"""TPU probe: sliced-ELL canonical loop with bf16 embedding storage.

The ELL f32 path runs at 93 M gather-slots/s — 88% of the measured XLA
row-gather ceiling (106 M rows/s at d=256/f32, which is issue/bandwidth
bound at ~108 GB/s).  bf16 storage halves the bytes per gathered row
(d=256/bf16 ≈ d=128/f32, where the gather ceiling measured ~140 M rows/s),
so the same loop with x stored bf16 (f32 accumulation — ops/loop.py:_step)
should land noticeably higher.  This measures it at the exact bench shape.

    PYTHONPATH=. python scripts/ell_bf16_probe.py [--iters N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from cleora_tpu.ops.loop import embed_loop
from cleora_tpu.ops.spmm_ell import plan_ell

N_NODES, N_UND = 1_965_206, 5_533_214  # roadNet-CA scale (bench.py shape)
DIM = 256
ITERS = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 40


def synthetic_coo(n_nodes, n_und_edges, seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, size=n_und_edges, dtype=np.int64)
    dst = rng.integers(0, n_nodes, size=n_und_edges, dtype=np.int64)
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    deg = np.bincount(rows, minlength=n_nodes).astype(np.float64)
    vals = (1.0 / np.maximum(deg, 1.0))[rows].astype(np.float32)
    return rows.astype(np.int32), cols.astype(np.int32), vals


def main():
    rows, cols, vals = synthetic_coo(N_NODES, N_UND)
    nnz = rows.shape[0]
    plan = plan_ell(rows, cols, vals, N_NODES, d=DIM)
    assert plan is not None
    print(f"nnz={nnz} slots={plan.slots} waste={plan.slots / nnz:.3f}",
          flush=True)
    dplan = plan.device()
    rng = np.random.default_rng(0)
    x_f32 = rng.standard_normal((N_NODES, DIM)).astype(np.float32)

    for dtype, label in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        x0 = jnp.asarray(x_f32).astype(dtype)

        def run():
            return embed_loop(dplan, (), (), x0, n_rows=N_NODES,
                              num_iterations=ITERS, normalization="l2",
                              do_whiten=True)

        t = time.perf_counter()
        out = run()
        print(f"{label} warm (incl compile): {time.perf_counter() - t:.1f}s "
              f"probe={float(out[0, 0].astype(jnp.float32)):.4g}", flush=True)
        best = 1e30
        for _ in range(2):
            t = time.perf_counter()
            float(run()[0, 0].astype(jnp.float32))
            best = min(best, time.perf_counter() - t)
        rate = nnz * ITERS / best / 1e6
        print(f"{label}: {rate:.1f} M edge-ops/s "
              f"({rate * plan.slots / nnz:.1f} M slots/s, {best:.2f}s/"
              f"{ITERS} iters)", flush=True)


if __name__ == "__main__":
    main()
