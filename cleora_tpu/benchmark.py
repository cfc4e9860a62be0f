"""Benchmark harness (reference: /root/reference/pycleora/benchmark.py):
per-algorithm wall time + tracemalloc peak MB + centroid-classifier scores,
with error capture and table formatters.

Note: tracemalloc only sees host allocations; device (HBM) memory for the
TPU paths is reported separately by cleora_tpu.tracing.
"""

from __future__ import annotations

import time
import tracemalloc
from typing import Callable, Dict, List, Optional

import numpy as np


def build_graph_for_dataset(ds: Dict):
    """Build a SparseMatrix from a load_dataset() dict, taking the
    zero-string integer-array fast path for _LazyEdgeList edges (the big
    SNAP/OGB sets)."""
    from .sparse import SparseMatrix

    edges = ds["edges"]
    if hasattr(edges, "arrays"):
        try:
            src, dst = edges.arrays()
            return SparseMatrix.from_edge_arrays(src, dst, ds["columns"])
        except ValueError:
            pass  # non-reflexive column spec etc. — fall through
    return SparseMatrix.from_iterator(iter(edges), ds["columns"])


def benchmark_algorithms(
    graph,
    labels: Dict[str, int],
    algorithms: Dict[str, Callable],
    metrics_fn: Optional[Callable] = None,
    num_runs: int = 1,
    seed: int = 42,
) -> Dict:
    """Time/memory/accuracy per algorithm (reference benchmark.py:7-60)."""
    from .metrics import node_classification_scores

    if metrics_fn is None:
        metrics_fn = lambda g, emb, lbls: node_classification_scores(
            g, emb, lbls, seed=seed
        )

    results: Dict[str, Dict] = {}
    for name, algo_fn in algorithms.items():
        times, scores_list, memory_peaks = [], [], []
        for _ in range(num_runs):
            tracemalloc.start()
            t0 = time.time()
            try:
                emb = algo_fn(graph)
                elapsed = time.time() - t0
                _, peak = tracemalloc.get_traced_memory()
                tracemalloc.stop()
                scores_list.append(metrics_fn(graph, emb, labels))
                times.append(elapsed)
                memory_peaks.append(peak / 1024 / 1024)
            except Exception as e:
                tracemalloc.stop()
                results[name] = {"error": str(e)}
                break

        if name not in results:
            avg_scores = {}
            if scores_list:
                for key in scores_list[0]:
                    vals = [
                        s[key]
                        for s in scores_list
                        if isinstance(s.get(key), (int, float))
                    ]
                    if vals:
                        avg_scores[key] = float(np.mean(vals))
            results[name] = {
                "avg_time": float(np.mean(times)),
                "std_time": float(np.std(times)) if len(times) > 1 else 0.0,
                "avg_memory_mb": float(np.mean(memory_peaks)),
                "scores": avg_scores,
                "num_runs": num_runs,
            }
    return results


def benchmark_datasets(
    dataset_names: List[str],
    embed_fn: Callable,
    feature_dim: int = 256,
    seed: int = 42,
) -> Dict:
    """Build + embed + score per dataset (reference benchmark.py:63-93)."""
    from .datasets import load_dataset
    from .metrics import node_classification_scores
    from .sparse import SparseMatrix

    results: Dict[str, Dict] = {}
    for ds_name in dataset_names:
        try:
            ds = load_dataset(ds_name)
            t0 = time.time()
            graph = build_graph_for_dataset(ds)
            emb = embed_fn(graph)
            elapsed = time.time() - t0
            results[ds_name] = {
                "num_nodes": ds["num_nodes"],
                "num_edges": ds["num_edges"],
                "num_classes": ds["num_classes"],
                "time": elapsed,
                "scores": node_classification_scores(
                    graph, emb, ds["labels"], seed=seed
                ),
            }
        except Exception as e:
            results[ds_name] = {"error": str(e)}
    return results


def format_benchmark_table(results: Dict, metric: str = "accuracy") -> str:
    """Fixed-width comparison table (reference benchmark.py:96-112)."""
    header = (
        f"{'Algorithm':<15} {'Time (s)':<12} {'Memory (MB)':<14} "
        f"{metric.capitalize():<12}"
    )
    lines = [header, "-" * len(header)]
    for name, data in sorted(results.items()):
        if "error" in data:
            lines.append(f"{name:<15} ERROR: {data['error']}")
        else:
            lines.append(
                f"{name:<15} {data.get('avg_time', 0):<12.4f} "
                f"{data.get('avg_memory_mb', 0):<14.2f} "
                f"{data.get('scores', {}).get(metric, 0):<12.4f}"
            )
    return "\n".join(lines)


def format_dataset_table(results: Dict, metric: str = "accuracy") -> str:
    """Per-dataset table (reference benchmark.py:115-130)."""
    header = (
        f"{'Dataset':<20} {'Nodes':<8} {'Edges':<10} {'Time (s)':<12} "
        f"{metric.capitalize():<12}"
    )
    lines = [header, "-" * len(header)]
    for name, data in sorted(results.items()):
        if "error" in data:
            lines.append(f"{name:<20} ERROR: {data['error']}")
        else:
            lines.append(
                f"{name:<20} {data.get('num_nodes', 0):<8} "
                f"{data.get('num_edges', 0):<10} {data.get('time', 0):<12.4f} "
                f"{data.get('scores', {}).get(metric, 0):<12.4f}"
            )
    return "\n".join(lines)
