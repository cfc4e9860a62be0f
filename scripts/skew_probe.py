"""TPU perf probe: skewed-graph SpMM layouts (flat 1-D vs equal-edge-cut).

Measures layouts on the real chip on the SAME degree-skewed graph
(roadNet-CA scale, zipf hubs at low ids — first-seen order correlates with
popularity in real ingest).  A "hybrid" capped-bands + 1-D-residual layout
was measured here in round 1 (29.9 vs 33.1 M edge-ops/s flat) and REMOVED —
see RESULTS.md "Skewed-graph layout probe".

    PYTHONPATH=. python scripts/skew_probe.py [--iters N]

Results print incrementally so a partial run still records numbers.
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
from cleora_tpu.ops.spmm import (
    EdgeCutBands,
    pad_coo,
    plan_banded_coo,
    plan_edgecut_coo,
)

N_NODES, N_UND = 1_965_206, 5_533_214  # roadNet-CA scale (bench.py shape)
DIM = 256
ITERS = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 40


def skewed_coo(alpha=1.3, hub_frac=0.3, seed=7):
    """Symmetric COO with a zipf hub head at low row ids + uniform tail."""
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


def measure(label, triple, nnz, x0):
    drow, dcol, dval = (
        a.device() if isinstance(a, EdgeCutBands)
        else tuple(jnp.asarray(x) for x in a) if isinstance(a, tuple)
        else jnp.asarray(a)
        for a in triple
    )

    def run():
        return embed_loop(
            drow, dcol, dval, x0, n_rows=N_NODES, num_iterations=ITERS,
            normalization="l2", do_whiten=True,
        )

    t0 = time.perf_counter()
    float(run()[0, 0])  # compile + warm (scalar fetch: tunnel-safe)
    print(f"{label}: compiled+warm in {time.perf_counter() - t0:.1f} s",
          flush=True)
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        float(run()[0, 0])
        best = min(best, time.perf_counter() - t)
    rate = nnz * ITERS / best / 1e6
    print(f"{label}: {rate:.1f} M edge-ops/s ({best:.2f} s / {ITERS} iters)",
          flush=True)
    return rate


def main():
    layouts = (sys.argv[sys.argv.index("--layouts") + 1].split(",")
               if "--layouts" in sys.argv else ["flat", "edgecut"])
    rows, cols, vals = skewed_coo()
    nnz = rows.shape[0]
    x0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((N_NODES, DIM)).astype(np.float32))
    rates = {}
    for name in layouts:
        if name == "edgecut":
            t = plan_edgecut_coo(rows, cols, vals, N_NODES, d=DIM)
            print(f"edgecut bands={t[0].local_rows.shape} "
                  f"H={t[0].band_height} ({t[0].local_rows.shape[0]}"
                  f"×{t[0].band_height} slots vs {N_NODES} rows)", flush=True)
        else:
            t = pad_coo(rows, cols, vals, N_NODES)
        rates[name] = measure(name, t, nnz, x0)
    if "flat" in rates:
        for name, r in rates.items():
            if name != "flat":
                print(f"{name}/flat speedup: {r / rates['flat']:.2f}x",
                      flush=True)


if __name__ == "__main__":
    main()
