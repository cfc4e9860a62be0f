"""Sharded sliced-ELL layout: the production SpMM layout, per device.

Single-chip, the fixed-width sliced-ELL layout (ops/spmm_ell.py) is the
production SpMM — dense gather+reduce with no HBM edge intermediate,
88.3 M edge-ops/s on v5e vs 49.2 M for the row-banded COO (RESULTS.md).
This module applies the same layout to each device's LOCAL SpMM inside the
multi-chip ``shard_map`` loop (parallel/embed.py), mirroring how the
reference's row-parallel rayon kernel (/root/reference/src/embedding.rs:59-63)
is the same code on every worker.

``shard_map`` needs every shard to see identically-shaped operands, so the
layout is made uniform across shards:

* bucket widths are chosen ONCE from the global degree histogram;
* each bucket's row count is padded to the max across shards (padding rows
  carry all-zero edges and produce all-zero output rows);
* each shard's local rows are relabeled (ascending local degree) into a
  per-shard ELL space of uniform size R ≥ rows_per_shard; ``rank[k, i]``
  is the ELL position of shard k's local row i, and positions not covered
  by any real row are garbage rows that stay exactly zero through the loop
  (zero edges → zero output → masked out of the whitening statistics).

The embedding state lives in per-shard ELL space for the whole iteration
loop; ``permute_state``/``unpermute_state`` convert at entry/exit (all
per-iteration ops are row-permutation-invariant, same argument as the
single-chip layout).  The layout composes with both exchange strategies:

* all-gather: edge columns are remapped into the concatenated ELL table
  (owner shard's base offset ``owner · R`` plus the owner's ``rank``);
* halo all_to_all (pass ``halo=plan_halo(...)``): edge columns keep the
  plan's receive-slot encoding (slots are relabel-independent), and the
  plan's ``send_idx`` local-row entries are mapped through the sender's
  ``rank`` so boundary rows are fetched from ELL-space state;
* split halo (``split=True``, requires ``halo``): the overlapped form —
  edges whose column owner is the shard itself are bucketed against the
  device's OWN state (no exchange dependency), so XLA runs the bulk local
  ELL compute while the async all_to_all of boundary rows is in flight
  (SURVEY.md §2c "overlap with local SpMM"); the remote remainder joins
  via one sorted segment-sum over the received slab.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.spmm_ell import _K_MAX, _widths_for


@dataclass
class EllShards:
    """Uniform per-shard sliced-ELL layout (see module docstring).

    buckets: per width w, (cols, vals) of shape (P, n_b, w); cols index the
        gather table (concat ELL space, or halo receive slots).
    hub: (cols, vals, seg) with cols/vals (P, n_virt, _K_MAX) and seg
        (P, n_virt) — width-capped virtual rows for degree>_K_MAX rows,
        combined per shard by a sorted segment-sum into n_hub rows.
    rank: (P, rows_per_shard) int32 — ELL position of each local row.
    valid: (P, R) float32 — 1.0 where the ELL position holds a real row
        whose global id is < n_rows (the whitening/statistics mask).
    send_idx: ELL-space remap of a HaloPlan's send_idx, when built with one.
    remote: None, or (cols, vals, pos) each (P, E_rem) — the split-mode
        remainder: slab-encoded gather columns, values, and sorted ELL
        output positions, combined by one segment-sum (padding rows carry
        pos=R-1, val=0).
    """

    buckets: tuple
    hub: tuple | None
    rank: np.ndarray
    valid: np.ndarray
    n_zero: int
    n_hub: int
    R: int
    nnz: int
    send_idx: np.ndarray | None = None
    remote: tuple | None = None

    @property
    def n_shards(self) -> int:
        return self.rank.shape[0]

    @property
    def slots(self) -> int:
        s = sum(int(np.prod(c.shape)) for c, _ in self.buckets)
        if self.hub is not None:
            s += int(np.prod(self.hub[0].shape))
        return s

    def arrays(self) -> dict:
        """The shard_map operand pytree (all leaves have a leading P dim)."""
        return {
            "buckets": tuple((c, v) for c, v in self.buckets),
            "hub": self.hub,
            "valid": self.valid,
            "remote": self.remote,
        }

    def permute_state(self, x_padded: np.ndarray) -> np.ndarray:
        """(P·rows_per_shard, D) row-block state → (P·R, D) ELL-space."""
        P, rps = self.rank.shape
        d = x_padded.shape[1]
        xr = np.ascontiguousarray(x_padded).reshape(P, rps, d)
        out = np.zeros((P, self.R, d), dtype=x_padded.dtype)
        out[np.arange(P)[:, None], self.rank] = xr
        return out.reshape(P * self.R, d)

    def unpermute_state(self, x_ell: np.ndarray) -> np.ndarray:
        """(P·R, D) ELL-space state → (P·rows_per_shard, D) row blocks."""
        P, rps = self.rank.shape
        d = x_ell.shape[1]
        xr = np.ascontiguousarray(x_ell).reshape(P, self.R, d)
        return xr[np.arange(P)[:, None], self.rank].reshape(P * rps, d)


def ell_shards(
    sharded,
    d: int = 256,
    halo=None,
    max_waste: float = 2.0,
    row_waste: float = 1.5,
    force: bool = False,
    split: bool = False,
    global_deg=None,
) -> EllShards | None:
    """Build the uniform sharded ELL layout from a ShardedCoo.

    Returns None (caller falls back to the banded/flat COO layouts) when the
    cross-shard padding would cost more than ``max_waste``× the real edge
    count or inflate the per-shard state past ``row_waste``× rows_per_shard
    — unless ``force`` (tests, tuning).  ``halo`` composes the layout with
    a boundary-row exchange plan; ``split=True`` (requires ``halo``)
    buckets only the edges whose column owner is the shard itself against
    the device's own state and routes the remainder through a segment-sum
    over the received slab, letting the exchange overlap the bulk compute
    (see module docstring).

    ``global_deg`` ((P, rps) int64) supplies the TRUE per-shard degree
    histogram when ``sharded`` is one host's piece of a sharded build
    (edge data for other hosts' shards is all-padding here, but the
    layout's shapes must be identical on every process —
    shard.allgather_degrees).  The packing loops still only fill the
    shards whose edges this host holds; the rest stay zero slabs and are
    never placed.
    """
    if split and halo is None:
        raise ValueError("split=True requires a halo plan")
    lrows_all = sharded.local_rows
    vals_all = sharded.vals
    P, E = lrows_all.shape
    rps = sharded.rows_per_shard
    real = vals_all != 0.0
    nnz = int(real.sum())
    if nnz == 0 and global_deg is None:
        return None

    owner_all = None
    if split:
        owner_all = (sharded.cols // rps).astype(np.int64)
        is_local = owner_all == np.arange(P)[:, None]
        bucketed = real & is_local  # edges packed into the ELL slabs
    else:
        bucketed = real

    if global_deg is not None:
        deg = np.asarray(global_deg, dtype=np.int64)
        if deg.shape != (P, rps):
            raise ValueError(
                f"global_deg shape {deg.shape} != {(P, rps)}"
            )
        if split:
            # bucketed widths come from LOCAL-owner degrees; recompute the
            # local-owner split of the global histogram is impossible from
            # degrees alone, so split mode still needs global edge data
            raise ValueError(
                "split=True is unsupported with global_deg (piece mode)"
            )
        # budget decisions must use the global edge count, not this
        # host's piece
        nnz = int(deg.sum())
        if nnz == 0:
            return None
    else:
        deg = np.zeros((P, rps), dtype=np.int64)
        for k in range(P):
            deg[k] = np.bincount(lrows_all[k][bucketed[k]], minlength=rps)

    widths = _widths_for(deg.reshape(-1))
    band_lo = [0] + widths[:-1]

    # per-shard relabel + uniform block sizes
    orders, n_zero_k, n_hub_k, counts_k = [], [], [], []
    for k in range(P):
        order = np.argsort(deg[k], kind="stable")
        ds = deg[k][order]
        orders.append((order, ds))
        n_zero_k.append(int(np.searchsorted(ds, 1)))
        n_hub_k.append(rps - int(np.searchsorted(ds, _K_MAX + 1)))
        counts_k.append([
            int(((ds > lo) & (ds <= w)).sum())
            for lo, w in zip(band_lo, widths)
        ])
    n_zero = max(n_zero_k)
    n_hub = max(n_hub_k)
    n_b = [max(c[b] for c in counts_k) for b in range(len(widths))]

    nv_k = []
    for k in range(P):
        order, ds = orders[k]
        hub_deg = ds[rps - n_hub_k[k]:]
        nv_k.append(int(np.ceil(hub_deg / _K_MAX).sum()) if n_hub_k[k] else 0)
    n_virt = max(nv_k) if n_hub else 0

    R = n_zero + sum(n_b) + n_hub
    slots = P * (sum(nb * w for nb, w in zip(n_b, widths)) + n_virt * _K_MAX)
    e_rem = 0
    if split:  # remote remainder costs 1 slot/edge + cross-shard padding
        rem_counts = [int((real[k] & ~bucketed[k]).sum()) for k in range(P)]
        # width 8 even with no remote edges: the jitted remainder
        # segment-sum keeps a static shape (matches the build below)
        e_rem = max(8, -(-max(rem_counts) // 8) * 8)
        slots += P * e_rem
    if not force and (slots > max_waste * nnz or R > row_waste * rps):
        return None

    # bucket_base[b] = ELL start position of bucket b's slab
    bucket_base = np.cumsum([n_zero] + n_b).tolist()[:-1] if n_b else []
    hub_base = n_zero + sum(n_b)

    # rank: ELL position of each local row, per shard
    rank = np.empty((P, rps), dtype=np.int32)
    for k in range(P):
        order, ds = orders[k]
        pos = np.empty(rps, dtype=np.int32)
        cur = 0
        pos[:n_zero_k[k]] = np.arange(n_zero_k[k], dtype=np.int32)
        cur = n_zero_k[k]
        for b in range(len(widths)):
            c = counts_k[k][b]
            pos[cur:cur + c] = bucket_base[b] + np.arange(c, dtype=np.int32)
            cur += c
        pos[cur:] = hub_base + np.arange(n_hub_k[k], dtype=np.int32)
        rank[k][order] = pos

    # valid mask: real local rows with a real global id
    valid = np.zeros((P, R), dtype=np.float32)
    for k in range(P):
        n_real = min(rps, max(0, sharded.n_rows - k * rps))
        if n_real:
            valid[k][rank[k, :n_real]] = 1.0

    # effective gather columns (for the bucketed edges)
    if split:
        # local-owner edges gather from the shard's OWN ELL-space state
        local = (sharded.cols - np.arange(P)[:, None] * rps) % rps
        cols_eff = rank[np.arange(P)[:, None], local].astype(np.int32)
    elif halo is not None:
        cols_eff = halo.remapped_cols
    else:
        owner = (sharded.cols // rps).astype(np.int64)
        local = (sharded.cols - owner * rps).astype(np.int64)
        cols_eff = (owner * R + rank[owner, local]).astype(np.int32)

    # pack edges per shard into the uniform slabs
    buckets = [
        (np.zeros((P, nb, w), dtype=np.int32),
         np.zeros((P, nb, w), dtype=np.float32))
        for nb, w in zip(n_b, widths)
    ]
    hub = None
    if n_hub:
        hub = (
            np.zeros((P, n_virt, _K_MAX), dtype=np.int32),
            np.zeros((P, n_virt, _K_MAX), dtype=np.float32),
            np.full((P, n_virt), max(n_hub - 1, 0), dtype=np.int32),
        )

    from ..ops.spmm_ell import ragged_slot_indices as _ragged

    for k in range(P):
        m = bucketed[k]
        pos_e = rank[k][lrows_all[k][m]]
        eorder = np.argsort(pos_e, kind="stable")
        pe = pos_e[eorder]
        ce = cols_eff[k][m][eorder]
        ve = vals_all[k][m][eorder]
        indptr = np.zeros(R + 1, dtype=np.int64)
        np.cumsum(np.bincount(pe, minlength=R), out=indptr[1:])

        for b, (w, nb) in enumerate(zip(widths, n_b)):
            base = bucket_base[b]
            starts = indptr[base:base + nb]
            counts = indptr[base + 1:base + nb + 1] - starts
            if counts.sum() == 0:
                continue
            i_idx, j_idx = _ragged(counts)
            src = np.repeat(starts, counts) + j_idx
            buckets[b][0][k][i_idx, j_idx] = ce[src]
            buckets[b][1][k][i_idx, j_idx] = ve[src]

        if n_hub and n_hub_k[k]:
            starts = indptr[hub_base:hub_base + n_hub_k[k]]
            counts = (indptr[hub_base + 1:hub_base + n_hub_k[k] + 1] - starts)
            h_idx, j_idx = _ragged(counts)
            src = np.repeat(starts, counts) + j_idx
            vcounts = np.ceil(counts / _K_MAX).astype(np.int64)
            vstart = np.cumsum(vcounts) - vcounts
            vrow = vstart[h_idx] + j_idx // _K_MAX
            slot = j_idx % _K_MAX
            hub[0][k][vrow, slot] = ce[src]
            hub[1][k][vrow, slot] = ve[src]
            hub[2][k][:int(vcounts.sum())] = np.repeat(
                np.arange(n_hub_k[k], dtype=np.int32), vcounts
            )

    remote = None
    if split:
        # rem_counts / e_rem computed once above (the budget pass)
        rcols = np.zeros((P, e_rem), dtype=np.int32)
        rvals = np.zeros((P, e_rem), dtype=np.float32)
        rpos = np.full((P, e_rem), R - 1, dtype=np.int32)  # padding: zero add
        for k in range(P):
            m = real[k] & ~bucketed[k]
            if not m.any():
                continue
            pos_e = rank[k][lrows_all[k][m]]
            eorder = np.argsort(pos_e, kind="stable")
            c = int(m.sum())
            rpos[k, :c] = pos_e[eorder]
            rcols[k, :c] = halo.remapped_cols[k][m][eorder]
            rvals[k, :c] = vals_all[k][m][eorder]
        remote = (rcols, rvals, rpos)

    send_idx = None
    if halo is not None:
        send_idx = rank[
            np.arange(P)[:, None, None], halo.send_idx
        ].astype(np.int32)

    return EllShards(
        buckets=tuple(buckets), hub=hub, rank=rank, valid=valid,
        n_zero=n_zero, n_hub=n_hub, R=R, nnz=nnz, send_idx=send_idx,
        remote=remote,
    )
