"""Sparse matrix × dense embedding propagation (SpMM) for TPU.

The propagate step — ``out[i] = Σ_{edges (i→j)} value · x[j]`` — is the hot
kernel of the framework (reference semantics: ``spmm_kernel``,
/root/reference/src/embedding.rs:52-86).

TPU-native design: the transition matrix is a row-sorted COO triple
(rows, cols, vals).  The baseline path is gather + scale + segment-sum;
large graphs use the banded layouts below (`plan_banded_coo`,
`plan_edgecut_coo`) to avoid re-reading a full (n_rows, D) accumulator per
chunk.  The fixed-width sliced-ELL layout (ops/spmm_ell.py) removes the
(nnz, D) HBM intermediate entirely by making the output dense per row.

Padding contract: rows/cols/vals may be padded at the END with
(rows=n_rows-1, cols=anything, vals=0.0) so row-sortedness is preserved and
padding contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pad_coo(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, n_rows: int,
            multiple: int = 2048):
    """Pad COO arrays to a bucketed length to limit jit recompiles.

    Small sizes round up to `multiple`; above 2^20 edges buckets grow
    geometrically (~12% steps) so different large graphs share compiled
    programs instead of each getting its own shape.
    """
    nnz = rows.shape[0]
    target = max(multiple, int(multiple * ((nnz + multiple - 1) // multiple)))
    if nnz > 1 << 20:
        bucket = 1 << 20
        while bucket < nnz:
            bucket += max(bucket // 8, multiple)
        target = (bucket + multiple - 1) // multiple * multiple
    if target == nnz:
        return (
            np.ascontiguousarray(rows, dtype=np.int32),
            np.ascontiguousarray(cols, dtype=np.int32),
            np.ascontiguousarray(vals, dtype=np.float32),
        )
    pad = target - nnz
    prow = np.full(pad, max(n_rows - 1, 0), dtype=np.int32)
    pcol = np.zeros(pad, dtype=np.int32)
    pval = np.zeros(pad, dtype=np.float32)
    return (
        np.concatenate([rows.astype(np.int32), prow]),
        np.concatenate([cols.astype(np.int32), pcol]),
        np.concatenate([vals.astype(np.float32), pval]),
    )


# Edge-chunking of the (nnz, D) gather intermediate.  The chunk byte budget
# adapts to the embedding-state footprint: on a 16 GB chip, oversizing the
# intermediate near the HBM limit makes XLA fall into a pathologically
# serialized schedule (measured: 4 GiB chunks at 2M rows × 256 dims ran 28x
# slower than 1 GiB chunks).  Larger chunks amortize the accumulator
# read/write, so use the largest budget that stays comfortably clear.
_CHUNK_EDGES = 1 << 22  # upper bound (4 GiB at D=256); kept for tests


def _chunk_edges_for(n_rows: int, d: int, table_rows: int = None,
                     edge_bytes: int = 0) -> int:
    # table_rows: rows of the GATHER TABLE when it differs from the output
    # row count — the sharded flat path all-gathers an (N_padded, D) table
    # while producing only rows_per_shard outputs, and budgeting on the
    # small side re-creates the oversized-intermediate pathology above.
    # edge_bytes: resident COO operand bytes — negligible for typical
    # graphs but dominant for walk-corpus PPMI matrices (450M+ nnz ≈ 6 GB),
    # where ignoring it oversized the intermediate past HBM.  The (chunk,
    # d) intermediate is budgeted at the TPU's lane-padded width (tiles of
    # 128 lanes), which an unpadded estimate understates by up to ~1.8×.
    if table_rows is None:
        table_rows = n_rows
    d_pad = -(-d // 128) * 128
    state_bytes = (int(table_rows) + 4 * int(n_rows)) * d * 4 + int(edge_bytes)
    budget = min(4 << 30, max(1 << 30, (10 << 30) - state_bytes))
    return max(1 << 20, min(_CHUNK_EDGES, budget // (d_pad * 4)))


def _band_rows(n_rows: int, n_bands: int) -> int:
    """Rows per band.  Shared by the host planner and the device kernel so the
    local-row encoding (global_row = band·B + local_row) is consistent."""
    return -(-n_rows // n_bands)


# Bands are capped at this multiple of the mean band load; edges beyond the
# cap spill to the 1-D residual stream.  The cap bounds banded-slot padding
# (wasted gather work) at ~25% while keeping the residual small for
# realistic power-law skew.
_BAND_CAP_FACTOR = 1.25


def plan_banded_coo(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                    n_rows: int, d: int = 256):
    """Host-side row-banded COO layout for accumulator-free large-graph SpMM.

    The chunked `lax.scan` path re-reads/rewrites the full (n_rows, D)
    accumulator once per chunk — at roadNet-CA scale that is ~6 GB × 11
    chunks × 2 directions per iteration, the dominant HBM traffic.  Because
    `rows` is sorted, the edge stream can instead be cut at STATIC row-range
    boundaries: band i owns output rows [i·B, (i+1)·B), every one of its
    edges lands in that range, and the scan can emit each (B, D) partial sum
    exactly once via ys-stacking — no carry, no re-read.

    Returns (rows2d, cols2d, vals2d) with shape (n_bands, max_band_edges)
    where rows2d holds band-local row indices.  Returns None when the banded
    layout doesn't pay and the caller should fall back to another layout:
    small graph (single-shot path is already accumulator-free), or a
    degree-skewed graph whose hub rows overflow the band cap (those go to
    ``plan_edgecut_coo``).  A "hybrid" capped-bands + 1-D-residual variant
    was built and REJECTED on measurement in round 1 (29.9 vs 33.1 M
    edge-ops/s on zipf at the roadNet shape — the residual stream
    re-introduced a full (N, D) accumulator pass); sliced-ELL
    (ops/spmm_ell.py) has since superseded all of these as the preferred
    fused-loop layout.
    """
    nnz = rows.shape[0]
    chunk = _chunk_edges_for(n_rows, d)
    if nnz <= chunk:
        return None  # single-shot path is already accumulator-free
    n_bands = -(-nnz // chunk)
    B = _band_rows(n_rows, n_bands)
    bounds = np.searchsorted(rows, np.arange(0, (n_bands + 1) * B, B))
    counts = np.diff(bounds)
    max_e = int(counts.max())
    cap = int(_BAND_CAP_FACTOR * max(1, nnz // n_bands))
    cap = -(-cap // 128) * 128

    if max_e > cap:
        return None  # skew: hub rows overflow the band cap
    max_e = -(-max_e // 2048) * 2048
    r2 = np.full((n_bands, max_e), B - 1, dtype=np.int32)
    c2 = np.zeros((n_bands, max_e), dtype=np.int32)
    v2 = np.zeros((n_bands, max_e), dtype=np.float32)
    for i in range(n_bands):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        r2[i, : hi - lo] = rows[lo:hi].astype(np.int64) - i * B
        c2[i, : hi - lo] = cols[lo:hi]
        v2[i, : hi - lo] = vals[lo:hi]
    return r2, c2, v2


@jax.tree_util.register_pytree_node_class
class EdgeCutBands:
    """Equal-edge-count bands with per-band row offsets — the skew-proof
    variant of the row-banded layout.

    Where ``plan_banded_coo`` cuts the sorted edge stream at fixed ROW
    boundaries (hub rows overflow a band), this cuts at fixed EDGE counts:
    every band holds exactly ``chunk`` edges, covers whatever row range
    [offsets[b], offsets[b] + band_height) those edges span, and a row cut
    by a band boundary simply yields partial sums in both bands.  The scan
    emits (band_height, D) partials per band; one final segment-sum over
    the ``offsets[b] + arange(H)`` slot ids combines them into (n_rows, D).
    Those ids are only locally sorted (band ranges overlap at hubs), but
    they are HOST-STATIC — the planner pre-sorts them, so the combine is a
    gather (``perm``) + sorted segment-sum instead of a scatter-add: one
    extra O(N·D) pass, versus the flat layout's accumulator re-read per
    CHUNK.  Measured on v5e at the zipf/roadNet shape: 37.2 M edge-ops/s
    (scatter combine) vs flat-1d 33.1 M (scripts/skew_probe.py).
    """

    def __init__(self, local_rows, offsets, band_height: int,
                 perm=None, sorted_ids=None):
        self.local_rows = local_rows  # (n_bands, chunk) band-local row ids
        self.offsets = offsets  # (n_bands,) first global row of each band
        self.band_height = band_height  # static: max rows any band spans
        self.perm = perm  # (n_bands·H,) sorts the combine slot ids
        self.sorted_ids = sorted_ids  # (n_bands·H,) global row per slot

    def tree_flatten(self):
        return (
            (self.local_rows, self.offsets, self.perm, self.sorted_ids),
            self.band_height,
        )

    @classmethod
    def tree_unflatten(cls, band_height, children):
        return cls(children[0], children[1], band_height, *children[2:])

    def device(self):
        return EdgeCutBands(
            jnp.asarray(self.local_rows), jnp.asarray(self.offsets),
            self.band_height, jnp.asarray(self.perm),
            jnp.asarray(self.sorted_ids),
        )


def plan_edgecut_coo(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                     n_rows: int, d: int = 256):
    """Host-side equal-edge-cut banded layout (see EdgeCutBands).

    Returns (EdgeCutBands, cols2d, vals2d) or None when the single-shot
    path suffices (nnz within one chunk).  Unlike ``plan_banded_coo`` this
    never declines on skew — band padding is structurally zero (every band
    is exactly full) and hub rows just span multiple bands.
    """
    nnz = rows.shape[0]
    chunk = _chunk_edges_for(n_rows, d)
    if nnz <= chunk:
        return None
    n_bands = -(-nnz // chunk)
    pad = n_bands * chunk - nnz
    if pad:
        # padding repeats the last row with zero values — sortedness and
        # band-local ranges are preserved
        rows = np.concatenate([rows, np.full(pad, rows[-1], rows.dtype)])
        cols = np.concatenate([cols, np.zeros(pad, cols.dtype)])
        vals = np.concatenate([vals, np.zeros(pad, np.float32)])
    r2 = rows.reshape(n_bands, chunk).astype(np.int64)
    offsets = r2[:, 0].astype(np.int32)
    local = (r2 - offsets[:, None]).astype(np.int32)
    band_height = int(local.max()) + 1
    # band_height is a band's row SPAN — gap rows (a hub band followed by a
    # long sparse tail) inflate it.  The ys/slot combine buffers are
    # (n_bands·band_height, D); unbounded they can exceed HBM by orders of
    # magnitude on hub+sparse-tail graphs even when the embedding itself
    # fits.  Decline (→ flat 1-D chunked fallback) unless the slot count
    # stays within a small multiple of n_rows.
    if n_bands * band_height > 4 * max(n_rows, 1):
        return None
    slot_rows = (
        offsets.astype(np.int64)[:, None] + np.arange(band_height)
    ).reshape(-1)
    perm = np.argsort(slot_rows, kind="stable").astype(np.int32)
    sorted_ids = np.minimum(slot_rows[perm], n_rows - 1).astype(np.int32)
    return (
        EdgeCutBands(local, offsets, band_height, perm, sorted_ids),
        np.ascontiguousarray(cols.reshape(n_bands, chunk), dtype=np.int32),
        np.ascontiguousarray(vals.reshape(n_bands, chunk), dtype=np.float32),
    )


@functools.partial(jax.jit, static_argnames=("n_rows",))
def spmm(rows: jax.Array, cols: jax.Array, vals: jax.Array, x: jax.Array,
         n_rows: int) -> jax.Array:
    """out = A @ x where A is COO (rows, cols, vals), rows sorted ascending."""
    return spmm_inner(rows, cols, vals, x, n_rows)


def spmm_inner(rows, cols, vals, x, n_rows, chunk_edges=None):
    """Un-jitted body, for embedding inside larger jitted loops.

    For small nnz this is a single gather → scale → sorted segment-sum that
    XLA fuses.  For large nnz the edge stream is processed in fixed-size
    chunks under ``lax.scan`` so the (chunk, D) intermediate stays bounded
    (the padding contract keeps trailing chunks valid: padded edges have
    vals == 0 and rows == n_rows-1).  ``chunk_edges`` overrides the budget
    heuristic — callers that pre-align their COO to a chunk multiple (so
    the in-trace pad, a full operand copy, never fires) pass the same
    value here.
    """
    from .spmm_ell import EllPlan, spmm_ell

    if isinstance(rows, EllPlan):
        # sliced-ELL layout: x and the result are in RELABELED row space
        # (the loop wrappers permute once at entry/exit)
        return spmm_ell(rows, x)

    if isinstance(rows, EdgeCutBands):
        # equal-edge-cut bands: per-band partial sums, scatter-add combine
        local, offsets, H = rows.local_rows, rows.offsets, rows.band_height
        n_bands = local.shape[0]
        acc = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype

        def cut_body(_, band):
            r, c, v = band
            gathered = jnp.take(x, c, axis=0).astype(acc)
            scaled = gathered * v[:, None].astype(acc)
            return 0, jax.ops.segment_sum(
                scaled, r, num_segments=H, indices_are_sorted=True
            )

        _, ys = jax.lax.scan(cut_body, 0, (local, cols, vals))
        # host-pre-sorted combine: gather slots into row order, then one
        # sorted segment-sum (ids pre-clamped; out-of-range tail slots hold
        # zero sums by construction)
        ys_sorted = jnp.take(
            ys.reshape(n_bands * H, x.shape[1]), rows.perm, axis=0
        )
        return jax.ops.segment_sum(
            ys_sorted, rows.sorted_ids, num_segments=n_rows,
            indices_are_sorted=True,
        )

    # storage may be bf16 (halves the gather table + read bytes); products
    # and the segment accumulation always run in float32
    acc_dtype = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype

    if rows.ndim == 2:  # banded layout from plan_banded_coo
        n_bands = rows.shape[0]
        B = _band_rows(n_rows, n_bands)

        def band_body(_, band):
            r, c, v = band
            gathered = jnp.take(x, c, axis=0).astype(acc_dtype)
            scaled = gathered * v[:, None].astype(acc_dtype)
            y = jax.ops.segment_sum(
                scaled, r, num_segments=B, indices_are_sorted=True
            )
            return 0, y

        _, ys = jax.lax.scan(band_body, 0, (rows, cols, vals))
        return ys.reshape(n_bands * B, x.shape[1])[:n_rows]

    nnz = rows.shape[0]
    if chunk_edges is None:
        chunk_edges = _chunk_edges_for(n_rows, x.shape[1],
                                       table_rows=x.shape[0],
                                       edge_bytes=nnz * 12)
    if nnz <= chunk_edges:
        gathered = jnp.take(x, cols, axis=0).astype(acc_dtype)
        scaled = gathered * vals[:, None].astype(acc_dtype)
        return jax.ops.segment_sum(
            scaled, rows, num_segments=n_rows, indices_are_sorted=True
        )

    if nnz % chunk_edges != 0:
        pad = chunk_edges - nnz % chunk_edges
        rows = jnp.pad(rows, (0, pad), constant_values=n_rows - 1)
        cols = jnp.pad(cols, (0, pad))
        vals = jnp.pad(vals, (0, pad))
        nnz += pad
    n_chunks = nnz // chunk_edges

    def body(acc, chunk):
        r, c, v = chunk
        gathered = jnp.take(x, c, axis=0).astype(acc_dtype)
        scaled = gathered * v[:, None].astype(acc_dtype)
        return acc + jax.ops.segment_sum(
            scaled, r, num_segments=n_rows, indices_are_sorted=True
        ), None

    chunks = (
        rows.reshape(n_chunks, chunk_edges),
        cols.reshape(n_chunks, chunk_edges),
        vals.reshape(n_chunks, chunk_edges),
    )
    # init derives a zero from `vals` so the carry carries the same varying
    # manual axes as the body output when running inside shard_map
    acc0 = jnp.zeros((n_rows, x.shape[1]), acc_dtype) + (vals[0] * 0).astype(
        acc_dtype
    )
    out, _ = jax.lax.scan(body, acc0, chunks)
    return out
