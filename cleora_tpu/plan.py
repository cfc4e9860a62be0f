"""Pre-deployment capacity planner: one host-side report of how a
workload maps onto TPU chips BEFORE anything is dispatched.

No reference analog — the reference is host-RAM-bound and its only
capacity signal is the allocator abort when it doesn't fit
(/root/reference/src/entity.rs + pipeline.rs hold the full dense state
in RAM).  This module consolidates the fit logic that already gates the
TPU paths at dispatch time — the embed HBM estimate (ops/memory.py),
the sliced-ELL slot budget (ops/spmm_ell.py:_widths_for), the walk-table
placement chain (algorithms._walk_table_mode) and the co-occurrence
factorization placement (algorithms._factorize_ranges) — into a single
pure-host report, so a production rollout can be sized on a laptop:

    from cleora_tpu.plan import plan_report, format_plan
    print(format_plan(plan_report(graph, feature_dim=256, n_devices=8)))

or ``cleora-tpu plan -i edges.tsv --dim 256 --devices 8 --walks``.

Every number is the SAME estimate the dispatch-time checks apply, so a
"fits" verdict here is exactly "the pre-flight ValueError will not
fire there" — the planner cannot drift from the runtime because it
calls the runtime's own helpers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_GIB = 1 << 30


def _graph_degrees(graph) -> np.ndarray:
    """Out-degrees from anything with the GraphData CSR (SparseMatrix,
    DiskGraph, raw GraphData)."""
    data = getattr(graph, "data", graph)
    indptr = np.asarray(data.indptr)
    return np.diff(indptr).astype(np.int64)


def _ell_slots(degrees: np.ndarray) -> int:
    """Slot count of the DP-optimal sliced-ELL layout for this degree
    histogram — the same budget plan_ell computes before building."""
    from .ops.spmm_ell import _K_MAX, _widths_for

    deg_sorted = np.sort(degrees)
    n_rows = deg_sorted.shape[0]
    n_zero = int(np.searchsorted(deg_sorted, 1))
    n_hub = int(n_rows - np.searchsorted(deg_sorted, _K_MAX + 1))
    widths = _widths_for(
        deg_sorted[n_zero:n_rows - n_hub if n_hub else n_rows])
    slots, lo = 0, 0
    for w in widths:
        mask = (deg_sorted > lo) & (deg_sorted <= w)
        slots += int(mask.sum()) * w
        lo = w
    if n_hub:
        hub = deg_sorted[n_rows - n_hub:]
        slots += int(np.ceil(hub / _K_MAX).sum()) * _K_MAX
    return slots


def plan_report(
    graph,
    feature_dim: int = 256,
    dtype: str = "float32",
    n_devices: int = 1,
    hbm_gib: Optional[float] = None,
    walks: bool = False,
    num_walks: int = 10,
    walk_length: int = 80,
    window_size: int = 5,
    second_order: bool = False,
) -> dict:
    """Build the capacity report (a plain dict; ``format_plan`` renders
    it).  ``hbm_gib`` overrides the per-device HBM budget — pass the
    target chip's size to plan for hardware you are not currently on
    (default: the live device's limit when the backend is a TPU, else
    16 GiB ≙ v5e)."""
    from .ops.memory import (
        _DEFAULT_TPU_HBM,
        device_hbm_limit,
        estimate_embed_hbm_bytes,
    )
    from .ops.spmm import _chunk_edges_for

    degrees = _graph_degrees(graph)
    n = int(degrees.shape[0])
    nnz = int(degrees.sum())
    if hbm_gib is not None:
        limit, src = int(hbm_gib * _GIB), "explicit"
    else:
        live = device_hbm_limit()
        limit, src = (live, "device") if live else \
            (_DEFAULT_TPU_HBM, "default-v5e")

    report: dict = {
        "graph": {
            "n": n, "nnz": nnz,
            "deg_min": int(degrees.min()) if n else 0,
            "deg_max": int(degrees.max()) if n else 0,
            "deg_mean": float(degrees.mean()) if n else 0.0,
        },
        "hbm": {"per_device_gib": limit / _GIB, "source": src},
    }

    # --- SpMM layout (the _device_coo cascade's decision, from degrees)
    dim_bucket = 1 << max(feature_dim - 1, 0).bit_length()
    if nnz == 0:
        layout = {"choice": "empty", "ell_padding_pct": 0.0}
    elif nnz <= _chunk_edges_for(n, dim_bucket):
        layout = {"choice": "flat-1d (small graph, chunked gather)",
                  "ell_padding_pct": 0.0}
    else:
        slots = _ell_slots(degrees)
        pad_pct = 100.0 * (slots - nnz) / nnz
        if slots <= 2.0 * nnz:  # plan_ell's max_waste bound
            layout = {"choice": "sliced-ELL",
                      "ell_padding_pct": round(pad_pct, 2)}
        else:
            layout = {"choice": "banded/edge-cut COO fallback "
                                "(ELL padding over budget)",
                      "ell_padding_pct": round(pad_pct, 2)}
    report["layout"] = layout

    # --- canonical embed fit per mesh size
    fits_at = None
    embed_rows = []
    for P in sorted({1, max(1, int(n_devices))}):
        rows_p = -(-n // P)
        nnz_p = -(-nnz // P)
        need = estimate_embed_hbm_bytes(rows_p, feature_dim, nnz_p, dtype)
        need_bf16 = estimate_embed_hbm_bytes(rows_p, feature_dim, nnz_p,
                                             "bfloat16")
        embed_rows.append({
            "devices": P,
            "rows_per_device": rows_p,
            "nnz_per_device": nnz_p,
            "need_gib": round(need / _GIB, 2),
            "fits": need <= limit,
            "need_bf16_gib": round(need_bf16 / _GIB, 2),
            "fits_bf16": need_bf16 <= limit,
        })
        if need <= limit and fits_at is None:
            fits_at = P
    if fits_at is None:  # find the smallest power-of-two mesh that fits
        P = max(2, 2 * max(1, int(n_devices)))
        while P <= 65536:
            rows_p, nnz_p = -(-n // P), -(-nnz // P)
            if estimate_embed_hbm_bytes(rows_p, feature_dim, nnz_p,
                                        dtype) <= limit:
                fits_at = P
                break
            P *= 2
    report["embed"] = embed_rows
    report["embed_min_devices"] = fits_at

    # --- walk pipeline placement (DeepWalk/Node2Vec, backend="device")
    if walks:
        from .algorithms import _COOC_PASS_PAIRS, _walk_table_mode

        try:
            table_mode = _walk_table_mode(
                "auto", None, n, nnz, second_order,
                limit=limit, n_devices=max(1, int(n_devices)),
            )
        except ValueError:
            table_mode = "host (tables exceed the mesh — backend='host')"
        # worst-case (all-unique) windowed pair count; walkable starts
        # approximated by raw degree>0 (the engine's own table also drops
        # self-loops, so this is a slight overcount — safe direction)
        starts = int((degrees > 0).sum()) * num_walks
        w = min(window_size, walk_length - 1)
        per_walk = 2 * (w * walk_length - w * (w + 1) // 2)
        pairs = starts * per_walk
        passes = max(1, -(-pairs // _COOC_PASS_PAIRS))
        r = min(n, min(feature_dim, max(1, n - 1)) + 16)
        fact_need = estimate_embed_hbm_bytes(
            n, max(1, (3 * r) // 2), pairs)
        fact = "device (one chip)" if fact_need <= limit else (
            "sharded (auto-engages)" if n_devices > 1
            else "sharded — needs a mesh (pass mesh=/n_devices=)")
        report["walks"] = {
            "table_mode": table_mode,
            "counting_passes": passes,
            "worst_case_pairs": pairs,
            "factorization": fact,
            "factorization_need_gib": round(fact_need / _GIB, 2),
        }
    else:
        report["walks"] = None

    # --- sibling algorithms: which execution path engages at this shape
    # (the same gates the device backends apply at dispatch)
    from .algorithms import _auto_block_rows, _dense_fits

    r_sib = min(n, min(feature_dim, max(1, n - 1)) + 16)
    sparse_need = estimate_embed_hbm_bytes(
        n, max(feature_dim, (3 * r_sib) // 2), nnz)
    if sparse_need <= limit:
        sparse_path = "device (single chip)"
    elif n_devices > 1:
        sparse_path = "sharded over the mesh (mesh=/n_devices=)"
    else:
        sparse_path = "sharded — needs a mesh (pass mesh=/n_devices=)"
    if _dense_fits(n, limit=limit):
        log_path = "dense device (n x n transition powers on the MXU)"
    else:
        b = _auto_block_rows(n, r_sib, limit=limit)
        log_path = f"blocked device (O(n*b) HBM, block_rows~{b})"
        if n_devices > 1:
            log_path += " with mesh-sharded panels"
    report["algorithms"] = {
        "prone/randne/hope": sparse_path,
        "netmf/grarep": log_path,
        "deepwalk/node2vec": "see walk pipeline" if walks
        else "pass walks=True for the walk-pipeline plan",
    }

    # --- recommendations
    recs = []
    final = embed_rows[-1]
    if not final["fits"] and final["fits_bf16"]:
        recs.append('dtype="bfloat16" fits where float32 does not '
                    f'({final["need_bf16_gib"]} vs {final["need_gib"]} GiB '
                    f'per device at P={final["devices"]})')
    if not final["fits"] and fits_at and fits_at > final["devices"]:
        recs.append(f"shard over >= {fits_at} devices "
                    "(cleora_tpu.parallel.embed_sharded / mesh=)")
    if fits_at is None:
        recs.append("no mesh size <= 65536 fits this shape at "
                    f"dim {feature_dim}/{dtype} — reduce feature_dim")
    if walks and report["walks"]["factorization"].startswith("sharded"):
        recs.append("co-occurrence factorization exceeds one chip — "
                    "pass mesh= so factorization='sharded' auto-engages")
    report["recommendations"] = recs
    return report


def format_plan(report: dict) -> str:
    """Render ``plan_report``'s dict as the CLI's human-readable text."""
    g, h = report["graph"], report["hbm"]
    lines = [
        f"Graph: {g['n']:,} entities, {g['nnz']:,} edges "
        f"(degree min/mean/max {g['deg_min']}/{g['deg_mean']:.1f}/"
        f"{g['deg_max']})",
        f"HBM budget: {h['per_device_gib']:.2f} GiB/device "
        f"[{h['source']}]",
        f"SpMM layout: {report['layout']['choice']}"
        + (f", ELL padding {report['layout']['ell_padding_pct']}%"
           if report["layout"]["choice"].startswith("sliced") else ""),
        "",
        "Canonical embed (40 iters, whitening):",
    ]
    for row in report["embed"]:
        verdict = "fits" if row["fits"] else "DOES NOT FIT"
        lines.append(
            f"  P={row['devices']}: {row['rows_per_device']:,} rows x "
            f"{row['nnz_per_device']:,} edges/device -> "
            f"~{row['need_gib']} GiB f32 ({verdict}; bf16 "
            f"~{row['need_bf16_gib']} GiB, "
            f"{'fits' if row['fits_bf16'] else 'does not fit'})"
        )
    if report["embed_min_devices"]:
        lines.append(
            f"  smallest fitting mesh: P={report['embed_min_devices']}")
    wk = report["walks"]
    if wk:
        lines += [
            "",
            "Walk pipeline (device backend):",
            f"  walk tables: {wk['table_mode']}",
            f"  counting: {wk['counting_passes']} pass(es), worst-case "
            f"{wk['worst_case_pairs']:,} pairs",
            f"  PPMI factorization: {wk['factorization']} "
            f"(~{wk['factorization_need_gib']} GiB single-chip)",
        ]
    algos = report.get("algorithms")
    if algos:
        lines += ["", "Sibling algorithms (backend='device'):"]
        lines += [f"  {name}: {path}" for name, path in algos.items()
                  if not path.startswith("pass walks=True")]
    if report["recommendations"]:
        lines += [""] + [f"Recommendation: {r}"
                         for r in report["recommendations"]]
    return "\n".join(lines)
