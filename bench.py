"""cleora_tpu headline benchmark: SpMM propagate throughput (edges/s/chip).

Canonical workload (BASELINE.md): 40 iterations × [left-Markov SpMM → L2
row-normalize → PCA whiten] at dim 256, on a synthetic graph shaped like the
reference's roadNet-CA scale test (2M nodes, 5.5M undirected edges — the
reference's only published speed number: 31 s end-to-end on one CPU,
/root/reference/README.md:274-276).

Baseline edges/s derived from that run: nnz ≈ 2×5.5M symmetric entries,
40 iterations in 31 s → 14.28e6 edge-ops/s (generous to the reference: its
31 s also covers graph build).

The propagate runs the sliced-ELL layout (ops/spmm_ell.py — dense-output
fixed-width rows, no HBM intermediate; 88.3 M edge-ops/s measured on v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Robustness: the result is emitted after the FIRST timed run, and a SIGALRM
watchdog (BENCH_BUDGET_S, default 1200 s) falls back to the warmup-run
timing (pessimistic: it includes dispatch/cache-load overhead) if a remote
compile stalls the timed run.
"""

import json
import os
import signal
import time

import numpy as np

BASELINE_EDGES_PER_S = 11_066_428 * 40 / 31.0  # reference roadNet-CA run

_state = {"printed": False, "warm_rate": None}


def _emit(edges_per_s: float):
    if _state["printed"]:
        return
    _state["printed"] = True
    print(json.dumps({
        "metric": "spmm_propagate_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
    }), flush=True)


def synthetic_coo(n_nodes: int, n_und_edges: int, seed: int = 7):
    """Left-Markov transition COO for a random pair graph (row-sorted)."""
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
    budget = int(os.environ.get("BENCH_BUDGET_S", "1200"))

    def on_alarm(signum, frame):
        if _state["warm_rate"] is not None:
            _emit(_state["warm_rate"])
            os._exit(0)
        os._exit(3)  # nothing measurable yet — no number is better than a lie

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(budget)

    import jax

    try:  # persistent compile cache: repeat runs skip the slow TPU compile
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from cleora_tpu.ops.loop import embed_loop
    from cleora_tpu.ops.spmm import pad_coo, plan_banded_coo
    from cleora_tpu.ops.spmm_ell import plan_ell

    backend = jax.default_backend()
    if backend == "cpu":  # smoke-test scale off-TPU
        n_nodes, n_und = 100_000, 276_000
        iters = 4
    else:
        # the exact published roadNet-CA shape (README.md:274-276)
        n_nodes, n_und = 1_965_206, 5_533_214
        iters = 40
    dim = 256

    rows, cols, vals = synthetic_coo(n_nodes, n_und)
    nnz = rows.shape[0]
    plan = plan_ell(rows, cols, vals, n_nodes, d=dim)
    if plan is not None:
        args = (plan.device(), (), ())
    else:  # ELL declined (pathological padding) — banded / flat fallback
        triple = plan_banded_coo(rows, cols, vals, n_nodes, d=dim)
        if triple is None:
            triple = pad_coo(rows, cols, vals, n_nodes)
        args = tuple(
            tuple(jnp.asarray(x) for x in a) if isinstance(a, tuple)
            else jnp.asarray(a)
            for a in triple
        )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n_nodes, dim)).astype(np.float32))

    def run():
        return embed_loop(
            *args, x0,
            n_rows=n_nodes, num_iterations=iters,
            normalization="l2", do_whiten=True,
        )

    # Warm up / compile.  Timed too: through the remote-TPU tunnel the first
    # call can stall for minutes on a cold compile, and the watchdog needs
    # SOME honest number — the warmup rate under-reports (it includes cache
    # load + dispatch), which is the safe direction.  Force a scalar
    # device→host fetch: block_until_ready can return early through the
    # tunnel.
    t = time.perf_counter()
    float(run()[0, 0])
    _state["warm_rate"] = nnz * iters / (time.perf_counter() - t)

    t = time.perf_counter()
    float(run()[0, 0])
    _emit(nnz * iters / (time.perf_counter() - t))
    signal.alarm(0)


if __name__ == "__main__":
    main()
