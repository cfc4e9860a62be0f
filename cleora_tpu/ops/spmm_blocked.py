"""Blocked SpMM: row-block-chunked gather + in-chunk reduce.

Motivation (measured on TPU v5e, see RESULTS.md): the flat
gather→scale→segment_sum path materializes an (nnz, D) f32 intermediate in
HBM, which caps it at ~47 M edges/s while the gather primitive alone sustains
~106 M rows/s.  This formulation processes edges in fixed-size chunks that
each cover one R-row output block: per chunk a (E, D) gather is reduced to
(R, D) immediately (small enough for XLA to keep on-chip), and a final sorted
segment-scatter of the (C·R, D) stacked contributions lands in the output —
the big intermediate never exists.

Preprocessing (host, cached per graph): rows are partitioned into fixed
blocks of R; each block's CSR edge range is split into ceil(cnt/E) chunks of
exactly E edge slots (zero-padded).  Works for any degree distribution —
hub rows simply occupy multiple chunks of the same block.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass
class BlockedCoo:
    """Chunked COO: (C, E) arrays + per-chunk output block offsets."""

    cols: np.ndarray  # int32 (C, E)
    vals: np.ndarray  # float32 (C, E); zero = padding
    local_rows: np.ndarray  # int32 (C, E) in [0, R)
    r0: np.ndarray  # int32 (C,) block start row (multiple of R)
    n_rows: int
    n_rows_padded: int
    R: int
    E: int

    @property
    def n_chunks(self) -> int:
        return self.cols.shape[0]


def block_coo(rows, cols, vals, n_rows: int, R: int = 256,
              E: int = 2048) -> BlockedCoo:
    """Partition a row-sorted COO into (R-row block, ≤E edge) chunks."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    nnz = rows.shape[0]

    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    np.cumsum(indptr, out=indptr)

    nblocks = (n_rows + R - 1) // R
    lo = indptr[np.minimum(np.arange(nblocks) * R, n_rows)]
    hi = indptr[np.minimum((np.arange(nblocks) + 1) * R, n_rows)]
    k = np.ceil((hi - lo) / E).astype(np.int64)
    nonempty = k > 0
    blocks = np.arange(nblocks)[nonempty]
    kk = k[nonempty]

    chunk_block = np.repeat(blocks, kk)
    within = np.arange(len(chunk_block)) - np.repeat(
        np.concatenate(([0], np.cumsum(kk)[:-1])), kk
    )
    start = lo[chunk_block] + within * E
    length = np.minimum(start + E, hi[chunk_block]) - start

    idx = start[:, None] + np.arange(E)[None, :]
    mask = np.arange(E)[None, :] < length[:, None]
    safe = np.clip(idx, 0, max(nnz - 1, 0))
    return BlockedCoo(
        cols=np.where(mask, cols[safe], 0).astype(np.int32),
        vals=np.where(mask, vals[safe], 0.0).astype(np.float32),
        local_rows=np.where(
            mask, rows[safe] - chunk_block[:, None] * R, R - 1
        ).astype(np.int32),
        r0=(chunk_block * R).astype(np.int32),
        n_rows=n_rows,
        n_rows_padded=nblocks * R,
        R=R,
        E=E,
    )


def spmm_blocked_inner(blocked_args, x, *, n_rows, n_rows_padded, R):
    """out = A @ x over a BlockedCoo's device arrays (un-jitted body).

    ``blocked_args`` = (cols (C,E), vals (C,E), local_rows (C,E), r0 (C,)).
    Returns (n_rows, D).
    """
    cols_m, vals_m, lrow_m, r0s = blocked_args
    C = cols_m.shape[0]
    d = x.shape[1]

    def body(_, chunk):
        c, v, lr = chunk
        g = jnp.take(x, c, axis=0) * v[:, None].astype(x.dtype)
        contrib = jax.ops.segment_sum(
            g, lr, num_segments=R, indices_are_sorted=True
        )
        return None, contrib

    _, contribs = lax.scan(body, None, (cols_m, vals_m, lrow_m))
    out_rows = (r0s[:, None] + jnp.arange(R, dtype=jnp.int32)[None, :]).reshape(-1)
    out = jax.ops.segment_sum(
        contribs.reshape(C * R, d), out_rows, num_segments=n_rows_padded
    )
    return out[:n_rows]


@functools.partial(jax.jit, static_argnames=("n_rows", "n_rows_padded", "R"))
def spmm_blocked(cols_m, vals_m, lrow_m, r0s, x, *, n_rows, n_rows_padded, R):
    return spmm_blocked_inner(
        (cols_m, vals_m, lrow_m, r0s), x,
        n_rows=n_rows, n_rows_padded=n_rows_padded, R=R,
    )


def device_blocked(blocked: BlockedCoo):
    """Move a BlockedCoo's arrays to device (jnp)."""
    return (
        jnp.asarray(blocked.cols),
        jnp.asarray(blocked.vals),
        jnp.asarray(blocked.local_rows),
        jnp.asarray(blocked.r0),
    )
