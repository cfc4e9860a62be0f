"""Single-chip scale probe: near-HBM-ceiling embed loop (~5x bench workload).

3M nodes / 30M undirected edges (60M nnz), dim 256, 10 whitened iterations.
f32 state footprint: 2 x-buffers + banded ys = ~9 GB, banded edge arrays
~0.7 GB — close to the practical ceiling of a 16 GB v5e chip at d=256.

Prints edges/s and wall time; records the number for RESULTS.md.
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

from bench import synthetic_coo
from cleora_tpu.ops.loop import embed_loop
from cleora_tpu.ops.spmm import pad_coo, plan_banded_coo
from cleora_tpu.ops.spmm_ell import plan_ell

n_nodes, n_und, iters, dim = 3_000_000, 30_000_000, 10, 256

rows, cols, vals = synthetic_coo(n_nodes, n_und)
nnz = rows.shape[0]
plan = plan_ell(rows, cols, vals, n_nodes, d=dim)
if plan is not None:
    layout = "ell"
    print(f"layout=ell nnz={nnz} slots={plan.slots} "
          f"pad={plan.slots / nnz - 1:.2%}", flush=True)
    drow, dcol, dval = plan.device(), (), ()
else:
    triple = plan_banded_coo(rows, cols, vals, n_nodes, d=dim)
    layout = "banded" if triple is not None else "flat"
    if triple is None:
        triple = pad_coo(rows, cols, vals, n_nodes)
    print(f"layout={layout} nnz={nnz} bands={triple[0].shape}", flush=True)
    drow, dcol, dval = (jnp.asarray(a) for a in triple)

x0 = jnp.asarray(
    np.random.default_rng(0).standard_normal((n_nodes, dim)).astype(np.float32)
)


def run():
    return embed_loop(
        drow, dcol, dval, x0, n_rows=n_nodes, num_iterations=iters,
        normalization="l2", do_whiten=True,
    )


float(run()[0, 0])  # compile + warm (scalar fetch: tunnel-safe timing)
t = time.perf_counter()
float(run()[0, 0])
dt = time.perf_counter() - t
print(f"{nnz * iters / dt / 1e6:.1f} M edge-ops/s, {dt:.2f} s for {iters} iters",
      flush=True)
