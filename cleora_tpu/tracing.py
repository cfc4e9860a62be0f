"""Tracing / profiling / observability (SURVEY.md §5).

The reference's observability is wall-clock + tracemalloc in its benchmark
harness (reference benchmark.py:26-38) and progress logs in the Rust ingest
pipeline (reference src/pipeline.rs:94-100).  TPU-native equivalents here:

* ``EmbedTracer`` — per-iteration edges/s + wall-clock counters, usable as the
  ``callback=`` of :func:`cleora_tpu.embed`;
* ``trace`` — context manager around ``jax.profiler`` producing an
  xprof-compatible trace directory;
* ``device_memory_stats`` — live HBM usage per device (the device-side
  complement of the host tracemalloc numbers);
* ``log_every`` — rate-limited progress logging for host ingest loops
  (parity with the reference's every-10k-lines log).
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

logger = logging.getLogger("cleora_tpu")


@dataclass
class EmbedTracer:
    """Collects per-iteration timing; pass ``tracer`` as embed()'s callback.

    >>> tracer = EmbedTracer(num_edges=graph.num_edges)
    >>> embed(graph, callback=tracer)
    >>> tracer.summary()["edges_per_s"]
    """

    num_edges: int = 0
    iter_times: List[float] = field(default_factory=list)
    _last: Optional[float] = None

    def __post_init__(self):
        # count the first iteration from construction (its interval thus
        # includes embed()'s setup/dispatch — the conservative direction)
        self._last = time.perf_counter()

    def __call__(self, iteration: int, embeddings) -> None:
        now = time.perf_counter()
        self.iter_times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self.iter_times:
            return {"iterations": 0, "total_s": 0.0, "mean_iter_s": 0.0,
                    "edges_per_s": 0.0}
        total = sum(self.iter_times)
        mean = total / len(self.iter_times)
        return {
            "iterations": len(self.iter_times),
            "total_s": total,
            "mean_iter_s": mean,
            "edges_per_s": self.num_edges / mean if mean > 0 else 0.0,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope — view with xprof/tensorboard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler span (shows up in xprof timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> List[Dict]:
    """Per-device live HBM stats (bytes), when the backend exposes them."""
    import jax

    out = []
    for d in jax.devices():
        stats = {}
        try:
            raw = d.memory_stats() or {}
            stats = {
                "bytes_in_use": raw.get("bytes_in_use"),
                "peak_bytes_in_use": raw.get("peak_bytes_in_use"),
                "bytes_limit": raw.get("bytes_limit"),
            }
        except Exception:
            pass
        out.append({"device": str(d), **stats})
    return out


class log_every:
    """Rate-limited progress logger for ingest loops.

    >>> progress = log_every(10_000, "read {count:,} lines")
    >>> for line in lines: progress()
    """

    def __init__(self, every: int, fmt: str = "processed {count:,} items"):
        self.every = every
        self.fmt = fmt
        self.count = 0
        self._next = every
        self._t0 = time.perf_counter()

    def __call__(self, n: int = 1):
        self.count += n
        # threshold, not modulo: chunked feeds (n > 1) must not skip a
        # milestone when a chunk jumps across it
        if self.count >= self._next:
            self._next += ((self.count - self._next) // self.every + 1) * self.every
            elapsed = time.perf_counter() - self._t0
            logger.info(
                self.fmt.format(count=self.count)
                + f" ({self.count / max(elapsed, 1e-9):,.0f}/s)"
            )
