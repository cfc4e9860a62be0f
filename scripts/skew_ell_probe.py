"""TPU perf probe: sliced-ELL on the degree-skewed (zipf-hub) graph.

Same graph as scripts/skew_probe.py (roadNet-CA scale, zipf hubs at low
ids).  Round-2 question: does the production sliced-ELL layout
(ops/spmm_ell.py) beat the equal-edge-cut COO (37.5 M edge-ops/s,
RESULTS.md) on skew?  plan_ell accepts this shape at 5.5% padding (hub
rows split into width-64 virtual rows), so the skew story may collapse
into the one production layout.

    PYTHONPATH=. python scripts/skew_ell_probe.py [--iters N]
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


def skewed_coo(alpha=1.3, hub_frac=0.3, seed=7):
    """Symmetric COO with a zipf hub head at low row ids + uniform tail
    (identical to scripts/skew_probe.py)."""
    rng = np.random.default_rng(seed)
    n_hub = int(N_UND * hub_frac)
    src_h = np.minimum(rng.zipf(alpha, size=n_hub) - 1, N_NODES - 1)
    src_u = rng.integers(0, N_NODES, size=N_UND - n_hub)
    src = np.concatenate([src_h, src_u])
    dst = rng.integers(0, N_NODES, size=N_UND)
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    deg = np.bincount(rows, minlength=N_NODES).astype(np.float64)
    vals = (1.0 / np.maximum(deg, 1.0))[rows].astype(np.float32)
    return rows.astype(np.int32), cols.astype(np.int32), vals


def main():
    rows, cols, vals = skewed_coo()
    nnz = rows.shape[0]
    plan = plan_ell(rows, cols, vals, N_NODES, d=DIM)
    assert plan is not None, "plan_ell declined the zipf shape"
    print(f"ELL plan: waste={plan.slots / plan.nnz:.3f} n_hub={plan.n_hub}",
          flush=True)
    dplan = plan.device()

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((N_NODES, DIM)).astype(np.float32))

    def run():
        return embed_loop(
            dplan, (), (), x0,
            n_rows=N_NODES, num_iterations=ITERS,
            normalization="l2", do_whiten=True,
        )

    t = time.perf_counter()
    float(run()[0, 0])
    print(f"compile+first: {time.perf_counter() - t:.1f}s", flush=True)
    t = time.perf_counter()
    float(run()[0, 0])
    dt = time.perf_counter() - t
    print(f"sliced-ELL on zipf skew: {nnz * ITERS / dt / 1e6:.1f} M edge-ops/s"
          f" ({dt:.1f}s for {ITERS} iters, nnz={nnz})", flush=True)


if __name__ == "__main__":
    main()
