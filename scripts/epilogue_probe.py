"""Decompose the canonical loop's per-iteration time at the bench shape.

Three variants of the 40-iteration dim-256 loop on the exact roadNet-CA
shape (one compile each through the remote tunnel — run when the compile
slot is free):

  full     = SpMM + L2 normalize + whiten   (the bench program, cached)
  no-whit  = SpMM + L2 normalize
  raw      = SpMM only (normalization="none")

The deltas attribute the gap between the bench rate and the pure gather
ceiling to the normalize and whiten epilogue passes (each is O(N·D) HBM
traffic per iteration vs the SpMM's O(nnz·D) gather stream).

    PYTHONPATH=. python scripts/epilogue_probe.py
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
from cleora_tpu.ops.spmm_ell import plan_ell

n_nodes, n_und, iters, dim = 1_965_206, 5_533_214, 40, 256
rows, cols, vals = synthetic_coo(n_nodes, n_und)
nnz = rows.shape[0]
plan = plan_ell(rows, cols, vals, n_nodes, d=dim).device()
x0 = jnp.asarray(
    np.random.default_rng(0).standard_normal((n_nodes, dim)).astype(np.float32)
)

results = {}
for name, norm, whiten in (
    ("raw", "none", False),
    ("no-whiten", "l2", False),
    ("full", "l2", True),
):
    def run():
        return embed_loop(plan, (), (), x0, n_rows=n_nodes,
                          num_iterations=iters, normalization=norm,
                          do_whiten=whiten)

    t = time.perf_counter()
    float(run()[0, 0])  # compile + first run
    warm = time.perf_counter() - t
    t = time.perf_counter()
    float(run()[0, 0])
    dt = time.perf_counter() - t
    results[name] = dt
    print(f"{name:10s} {dt:6.2f}s ({nnz * iters / dt / 1e6:6.1f} M edge-ops/s)"
          f"  [first call incl. compile: {warm:.0f}s]", flush=True)

per_iter = {k: v / iters * 1e3 for k, v in results.items()}
print(f"\nper-iteration: spmm {per_iter['raw']:.1f} ms"
      f" + normalize {per_iter['no-whiten'] - per_iter['raw']:.1f} ms"
      f" + whiten {per_iter['full'] - per_iter['no-whiten']:.1f} ms"
      f" = {per_iter['full']:.1f} ms", flush=True)
