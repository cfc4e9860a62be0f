"""Multi-device scaling-efficiency harness (BASELINE.json north star:
edges/s at 1 chip / 1 host / N hosts, >=80% target).

Measures the fused sharded embed loop's edges/s at 1..N devices on
whatever mesh is available and gates the result against the BASELINE
scaling target as a hard pass/fail, so a pod run is zero-decision.
Surfaced two ways: ``cleora-tpu scaling`` (cli.py) and
``scripts/scaling_report.py`` (thin wrapper).

Efficiency definition (matches BASELINE.md): edges/s at N devices divided
by N x edges/s at 1 device, strong-scaled on a fixed graph (the same
global problem split N ways — the production regime for a graph that fits
the pod but not one chip).

The reference has no distributed mode to compare against; its scale story
is the single-CPU roadNet-CA run (/root/reference/README.md:272-276).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_EFFICIENCY = 0.80  # BASELINE.json multi-host scaling target


def synthetic(n_nodes, n_und, seed=7):
    """Row-sorted undirected COO with left-Markov values."""
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


def measure(smoke: bool = False):
    """Run the device-count ladder; returns a list of
    {devices, edges_per_s, efficiency}."""
    import jax

    from .parallel.embed import build_sharded_embed
    from .parallel.mesh import make_mesh
    from .parallel.shard import pad_rows, shard_coo

    n_dev_avail = len(jax.devices())
    small = jax.default_backend() == "cpu" or smoke
    n_nodes = (20_000 if smoke else 100_000) if small else 1_000_000
    n_und = (100_000 if smoke else 500_000) if small else 5_500_000
    iters = (2 if smoke else 4) if small else 40
    dim = 64 if smoke else 256

    rows, cols, vals = synthetic(n_nodes, n_und)
    nnz = len(rows)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((n_nodes, dim)).astype(np.float32)

    results = []
    counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n_dev_avail]
    for nd in counts:
        mesh = make_mesh(nd)
        sharded = shard_coo(rows, cols, vals, n_nodes, nd)
        fn, place = build_sharded_embed(
            mesh, sharded, dim, num_iterations=iters, do_whiten=True,
        )
        args = place(pad_rows(x0, sharded.n_rows_padded))
        out = fn(*args)
        assert np.isfinite(float(np.asarray(out)[0, 0]))  # compile+warm
        best = 1e9
        for _ in range(2):
            t = time.perf_counter()
            float(np.asarray(fn(*args))[0, 0])
            best = min(best, time.perf_counter() - t)
        eps = nnz * iters / best
        base = results[0]["edges_per_s"] if results else eps
        eff = eps / (base * nd)
        results.append({"devices": nd, "edges_per_s": eps, "efficiency": eff})
        print(f"devices={nd:3d}  {eps/1e6:9.1f} M edges/s  "
              f"scaling efficiency {eff:6.1%}")
    return results


def run_report(smoke: bool = False, check: float | None = None,
               json_path: str | None = None) -> int:
    """Measure, print, optionally gate (exit code 2 on FAIL) and dump JSON."""
    import jax

    results = measure(smoke=smoke)
    report = {
        "backend": jax.default_backend(),
        "devices_available": len(jax.devices()),
        "smoke": smoke,
        "target_efficiency": check if check is not None else TARGET_EFFICIENCY,
        "results": results,
    }
    rc = 0
    if check is not None:
        final = results[-1]
        passed = final["efficiency"] >= check
        report["pass"] = passed
        verdict = "PASS" if passed else "FAIL"
        print(f"{verdict}: efficiency {final['efficiency']:.1%} at "
              f"{final['devices']} devices (target >= {check:.0%})")
        if not passed:
            rc = 2
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=1)
    return rc
