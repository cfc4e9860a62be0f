"""Host-side HBM footprint estimation for the fused embed loops.

A 16 GB v5e chip caps the single-chip workload at roughly 3M rows at
d=256/f32; past that, the device fails with an opaque allocator error deep
inside XLA.  These helpers estimate the footprint up front and turn that
into an actionable ValueError (use bfloat16, shrink the dim, or go
multi-chip via cleora_tpu.parallel.embed_sharded).

Reference comparison: the reference is host-RAM-bound instead and its OOM
is likewise opaque (Rust allocator abort); a capacity pre-check is a
deliberate improvement, not a parity item.
"""

from __future__ import annotations

import os

_DEFAULT_TPU_HBM = 16 << 30  # v5e; overridden by live memory_stats when known


def estimate_embed_hbm_bytes(
    n_rows: int, d: int, nnz: int, dtype: str = "float32",
) -> int:
    """Upper-bound HBM bytes for one fused embed loop at this shape.

    Components: double-buffered state, the f32 SpMM output (banded ys or
    accumulator), one whitening temp, the COO/banded edge arrays (~10% pad),
    and the bounded (chunk, D) gather intermediate.
    """
    from .spmm import _chunk_edges_for

    state_itemsize = 2 if dtype == "bfloat16" else 4
    state = 2 * n_rows * d * state_itemsize  # x double-buffered
    out = n_rows * d * 4  # SpMM result, always f32
    whiten_tmp = n_rows * d * 4
    edges = int(nnz * 12 * 1.1)  # rows+cols int32 + vals f32, pad margin
    chunk = min(_chunk_edges_for(n_rows, d), max(nnz, 2048)) * d * 4
    return state + out + whiten_tmp + edges + chunk


def device_hbm_limit() -> int | None:
    """Bytes of device memory on the default backend, or None when the
    backend is not a TPU (CPU/GPU runs use host-sized memory)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    try:
        stats = jax.devices()[0].memory_stats()
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit
    except Exception:
        pass
    return _DEFAULT_TPU_HBM


def check_device_fit(
    n_rows: int, d: int, nnz: int, dtype: str = "float32",
) -> None:
    """Raise ValueError before dispatch when the loop cannot fit in HBM."""
    if os.environ.get("CLEORA_TPU_SKIP_FIT_CHECK") == "1":
        return
    limit = device_hbm_limit()
    if limit is None:
        return
    need = estimate_embed_hbm_bytes(n_rows, d, nnz, dtype)
    if need > limit:
        gib = 1 << 30
        hints = []
        if dtype != "bfloat16":
            bf16 = estimate_embed_hbm_bytes(n_rows, d, nnz, "bfloat16")
            if bf16 <= limit:
                hints.append('pass dtype="bfloat16" (halves the state)')
        hints.append("reduce feature_dim")
        hints.append(
            "shard across chips with cleora_tpu.parallel.embed_sharded"
        )
        raise ValueError(
            f"Embedding loop needs ~{need / gib:.1f} GiB HBM for "
            f"{n_rows} rows x dim {d} ({nnz} edges, {dtype}) but the device "
            f"has {limit / gib:.1f} GiB. Options: {'; '.join(hints)}. "
            f"Set CLEORA_TPU_SKIP_FIT_CHECK=1 to bypass this estimate."
        )
