"""Edge/row-partitioned graph shards for multi-chip propagation.

Partitioning scheme (the TPU analog of the reference's row-parallel rayon SpMM,
/root/reference/src/embedding.rs:59-63, scaled across chips):

* embedding rows are block-partitioned: device k owns rows
  [k·rows_per_shard, (k+1)·rows_per_shard) of the (padded) N×D matrix;
* every COO edge lives on the device that owns its OUTPUT row, so the
  segment-sum accumulation is entirely local;
* the gather side needs remote rows → an all-gather of the row shards
  (optimized variants overlap this with local accumulation);
* per-shard edge counts are padded to the max shard size with zero-valued
  edges pointing at the shard's last local row (keeps row-sortedness).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mesh import round_up


@dataclass
class ShardedCoo:
    """COO partitioned by output-row blocks; all arrays have a leading
    n_shards dimension with equal per-shard sizes (pad included)."""

    local_rows: np.ndarray  # int32 (P, E) — row index LOCAL to the shard
    cols: np.ndarray  # int32 (P, E) — GLOBAL column index into padded N
    vals: np.ndarray  # float32 (P, E) — zero for padding
    n_rows: int  # true (unpadded) number of rows
    n_rows_padded: int
    rows_per_shard: int

    @property
    def n_shards(self) -> int:
        return self.local_rows.shape[0]


def shard_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    n_shards: int,
    row_multiple: int = 8,
    edge_multiple: int = 512,
) -> ShardedCoo:
    """Partition a row-sorted COO matrix into per-device blocks."""
    from ..graph.stream import shard_row_params

    n_padded, rows_per_shard = shard_row_params(n_rows, n_shards, row_multiple)

    order = np.argsort(rows, kind="stable")
    rows = np.asarray(rows)[order].astype(np.int64)
    cols = np.asarray(cols)[order].astype(np.int32)
    vals = np.asarray(vals)[order].astype(np.float32)

    # split points at shard row boundaries
    boundaries = np.searchsorted(rows, np.arange(1, n_shards) * rows_per_shard)
    row_parts = np.split(rows, boundaries)
    col_parts = np.split(cols, boundaries)
    val_parts = np.split(vals, boundaries)

    max_e = max(p.shape[0] for p in row_parts)
    max_e = round_up(max(max_e, edge_multiple), edge_multiple)

    lr = np.empty((n_shards, max_e), dtype=np.int32)
    cc = np.zeros((n_shards, max_e), dtype=np.int32)
    vv = np.zeros((n_shards, max_e), dtype=np.float32)
    for k in range(n_shards):
        e = row_parts[k].shape[0]
        lr[k, :e] = row_parts[k] - k * rows_per_shard
        lr[k, e:] = rows_per_shard - 1  # padding: last local row, zero value
        cc[k, :e] = col_parts[k]
        vv[k, :e] = val_parts[k]
    return ShardedCoo(
        local_rows=lr,
        cols=cc,
        vals=vv,
        n_rows=n_rows,
        n_rows_padded=n_padded,
        rows_per_shard=rows_per_shard,
    )


def shard_disk_graph(
    dg,
    markov_type: str,
    n_shards: int,
    row_multiple: int = 8,
    edge_multiple: int = 512,
    edge_capacity: int = None,
) -> ShardedCoo:
    """Build a ShardedCoo straight off a streamed build's ``DiskGraph``
    (graph.stream) one row block at a time — the out-of-core path for
    graphs whose edge list was never materialized in RAM.  Peak extra host
    memory is one shard's COO slice plus the packed (P, E) output; the
    on-disk CSR is already row-sorted so no sort pass is needed.

    ``edge_capacity`` overrides the per-shard edge slot count — required
    when ``dg`` is one host's PIECE of a sharded build (its indptr is zero
    outside its row range, so the local max underestimates the global one;
    the caller allgathers the true max across hosts).  Shards outside the
    piece pack as all-padding; only the jit-addressable shards' data is
    read at placement time."""
    from ..graph.stream import shard_row_bounds, shard_row_params

    n = dg.num_entities
    n_padded, rows_per_shard = shard_row_params(n, n_shards, row_multiple)
    bounds = shard_row_bounds(n, n_shards, row_multiple)
    # per-shard edge counts from indptr alone (memmap, O(P) element reads)
    counts = [int(dg.indptr[bounds[k + 1]] - dg.indptr[bounds[k]])
              for k in range(n_shards)]
    max_e = (int(edge_capacity) if edge_capacity is not None
             else max(max(counts), edge_multiple))
    max_e = round_up(max(max_e, edge_multiple), edge_multiple)

    lr = np.empty((n_shards, max_e), dtype=np.int32)
    cc = np.zeros((n_shards, max_e), dtype=np.int32)
    vv = np.zeros((n_shards, max_e), dtype=np.float32)
    for k in range(n_shards):
        lo, hi = bounds[k], bounds[k + 1]
        e = counts[k]
        if e:
            rows, cols, vals = dg.row_range(lo, hi, markov_type)
            lr[k, :e] = rows - k * rows_per_shard
            cc[k, :e] = cols
            vv[k, :e] = vals
        lr[k, e:] = rows_per_shard - 1  # padding: last local row, zero value
    return ShardedCoo(
        local_rows=lr,
        cols=cc,
        vals=vv,
        n_rows=n,
        n_rows_padded=n_padded,
        rows_per_shard=rows_per_shard,
    )


def shard_graph(graph, markov_type: str, n_shards: int, **kw) -> ShardedCoo:
    """Shard a SparseMatrix's (or DiskGraph's) transition matrix for an
    n_shards-device mesh."""
    if not hasattr(graph, "data"):  # streamed build: graph.stream.DiskGraph
        return shard_disk_graph(graph, markov_type, n_shards, **kw)
    data = graph.data
    n = data.num_entities
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(data.indptr))
    vals = data.sym_vals if markov_type == "symmetric" else data.left_vals
    return shard_coo(rows, data.indices, vals, n, n_shards, **kw)


@dataclass
class BandedShards:
    """Row-banded per-shard COO: the multi-chip form of the accumulator-free
    layout (`ops/spmm.py:plan_banded_coo`).

    Within each shard, the (row-sorted) edge stream is cut at static
    band boundaries of ``band_rows`` local rows; every band's partial sum is
    emitted exactly once via ``lax.scan`` ys-stacking instead of re-reading a
    (rows_per_shard, D) accumulator per edge chunk — the same ~2×
    HBM-traffic win measured single-chip (RESULTS.md), applied to each
    device's local SpMM.  All arrays are (P, n_bands, max_e) so the layout
    shards uniformly under ``shard_map``; ``local_rows`` holds BAND-local
    indices (global_local_row = band·band_rows + entry).
    """

    local_rows: np.ndarray  # int32 (P, n_bands, max_e)
    cols: np.ndarray  # int32 (P, n_bands, max_e) — gather-table indices
    vals: np.ndarray  # float32 (P, n_bands, max_e), zero for padding
    n_bands: int
    band_rows: int


def band_shards(
    sharded: ShardedCoo,
    d: int = 256,
    cols: np.ndarray | None = None,
    n_bands: int | None = None,
    max_overhead: float = 1.5,
) -> BandedShards | None:
    """Band each shard's edges at static local-row boundaries.

    ``cols`` overrides the gather indices (pass ``HaloPlan.remapped_cols``
    to compose banding with the halo exchange — banding only permutes/pads
    the edge stream, so any per-edge column encoding carries through).
    ``n_bands=None`` sizes bands from the chunked path's memory budget and
    returns None when banding doesn't pay: per-shard edges already fit one
    chunk, or intra-shard skew would pad the bands more than
    ``max_overhead``× the flat layout (the caller falls back to 1-D).  An
    explicit ``n_bands`` forces the layout (tests, tuning).
    """
    from ..ops.spmm import _band_rows, _chunk_edges_for

    P, E = sharded.local_rows.shape
    rps = sharded.rows_per_shard
    if cols is None:
        cols = sharded.cols
    auto = n_bands is None
    if auto:
        chunk = _chunk_edges_for(rps, d)
        if E <= chunk:
            return None  # single-shot local SpMM is already accumulator-free
        n_bands = -(-E // chunk)
    if n_bands <= 1:
        return None
    B = _band_rows(rps, n_bands)
    bounds = np.stack([
        np.searchsorted(sharded.local_rows[k], np.arange(n_bands + 1) * B)
        for k in range(P)
    ])
    max_e = int(np.diff(bounds, axis=1).max())
    max_e = max(-(-max_e // 128) * 128, 128)
    if auto and n_bands * max_e > max_overhead * E:
        return None  # intra-shard skew: banded padding would dominate
    lr = np.full((P, n_bands, max_e), B - 1, dtype=np.int32)
    cc = np.zeros((P, n_bands, max_e), dtype=np.int32)
    vv = np.zeros((P, n_bands, max_e), dtype=np.float32)
    for k in range(P):
        for i in range(n_bands):
            lo, hi = int(bounds[k, i]), int(bounds[k, i + 1])
            lr[k, i, : hi - lo] = (
                sharded.local_rows[k, lo:hi].astype(np.int64) - i * B
            )
            cc[k, i, : hi - lo] = cols[k, lo:hi]
            vv[k, i, : hi - lo] = sharded.vals[k, lo:hi]
    return BandedShards(
        local_rows=lr, cols=cc, vals=vv, n_bands=n_bands, band_rows=B
    )


@dataclass
class HaloPlan:
    """Boundary-row exchange plan: who sends which rows to whom.

    The all-gather baseline ships every shard the full (N, D) table each
    iteration; this plan ships only the rows each shard's edges actually
    reference (SURVEY.md §2c — the "TP of this workload").  Send/receive
    slots are padded to the max per-pair count M so the exchange is one
    static-shape ``all_to_all``.
    """

    send_idx: np.ndarray  # int32 (P, P, M): [k, j] = LOCAL rows k sends to j
    remapped_cols: np.ndarray  # int32 (P, E): edge cols → recv-buffer slots
    M: int  # padded rows per (sender, receiver) pair

    @property
    def table_rows(self) -> int:
        return self.send_idx.shape[0] * self.M


def plan_halo(sharded: ShardedCoo) -> HaloPlan:
    """Build the halo exchange plan from a row-block-sharded COO."""
    P, E = sharded.cols.shape
    rps = sharded.rows_per_shard

    # need[j][k]: sorted unique global rows owned by k that shard j reads
    uniqs = []
    group_starts = []
    M = 1
    for j in range(P):
        uniq = np.unique(sharded.cols[j])
        owner = uniq // rps
        gs = np.searchsorted(owner, np.arange(P + 1))
        uniqs.append(uniq)
        group_starts.append(gs)
        M = max(M, int(np.max(np.diff(gs))))

    send_idx = np.zeros((P, P, M), dtype=np.int32)
    remapped = np.empty_like(sharded.cols)
    for j in range(P):
        uniq, gs = uniqs[j], group_starts[j]
        for k in range(P):
            rows_needed = uniq[gs[k]:gs[k + 1]] - k * rps
            send_idx[k, j, : len(rows_needed)] = rows_needed
        # edge col c → slot owner(c)·M + rank of c within its owner group
        rank = np.searchsorted(uniq, sharded.cols[j])
        owner = sharded.cols[j] // rps
        remapped[j] = (owner * M + (rank - gs[owner])).astype(np.int32)

    return HaloPlan(send_idx=send_idx, remapped_cols=remapped, M=M)


def plan_halo_distributed(sharded: ShardedCoo, mesh) -> HaloPlan:
    """Halo planning when each PROCESS holds edge data only for its own
    shards (a sharded-build piece, graph/stream.py) — the remaining shards
    of the ShardedCoo are all-padding on this host.

    The exchange plan needs two kinds of global knowledge:

    * ``M`` — the max rows any shard needs from any owner: an allgathered
      scalar max;
    * ``send_idx[k, j]`` — what shard j needs FROM k: known only to j's
      process, so each process allgathers the need-lists of its own shards
      ((P_local, P, M) int32) and every process assembles the full
      (P, P, M) table.  Cost: P²·M ints once per embed — e.g. 16 shards ×
      M=1M boundary rows = 16 GB?  No: M counts DISTINCT boundary rows per
      (owner, reader) pair, bounded by rows_per_shard; for power-law
      graphs it is typically ≪ rows_per_shard, and the alternative is
      shipping the full (N, D) gather table every iteration.

    ``remapped_cols`` is local per shard (each process computes its own
    shards' slots; unowned shards keep zeros — their edges are never
    placed).  Output is a normal :class:`HaloPlan`, byte-identical to
    ``plan_halo`` of the merged graph (asserted in tests)."""
    import jax
    from jax.experimental import multihost_utils

    P, E = sharded.cols.shape
    rps = sharded.rows_per_shard
    me = jax.process_index()
    owned = [k for k in range(P)
             if mesh.devices.flat[k].process_index == me]
    n_owned = len(owned)
    counts = multihost_utils.process_allgather(
        np.asarray([n_owned], dtype=np.int64))
    if int(counts.min()) != int(counts.max()):
        raise ValueError(
            "plan_halo_distributed needs an equal shard count per process"
        )

    uniqs, group_starts = {}, {}
    local_m = 1
    for j in owned:
        uniq = np.unique(sharded.cols[j])
        owner = uniq // rps
        gs = np.searchsorted(owner, np.arange(P + 1))
        uniqs[j] = uniq
        group_starts[j] = gs
        local_m = max(local_m, int(np.max(np.diff(gs))))
    M = int(np.max(multihost_utils.process_allgather(
        np.asarray([local_m], dtype=np.int64))))

    # need[j, k]: LOCAL rows of owner k that shard j reads (0-padded)
    need_local = np.zeros((n_owned, P, M), dtype=np.int32)
    for i, j in enumerate(owned):
        uniq, gs = uniqs[j], group_starts[j]
        for k in range(P):
            rows_needed = uniq[gs[k]:gs[k + 1]] - k * rps
            need_local[i, k, : len(rows_needed)] = rows_needed
    need = multihost_utils.process_allgather(need_local)  # (nproc, no, P, M)
    need = np.asarray(need).reshape(P, P, M)

    # send_idx[k, j] = what j needs from k
    send_idx = np.ascontiguousarray(np.swapaxes(need, 0, 1))

    remapped = np.zeros_like(sharded.cols)
    for j in owned:
        uniq, gs = uniqs[j], group_starts[j]
        rank = np.searchsorted(uniq, sharded.cols[j])
        owner = sharded.cols[j] // rps
        remapped[j] = (owner * M + (rank - gs[owner])).astype(np.int32)

    return HaloPlan(send_idx=send_idx, remapped_cols=remapped, M=M)


@dataclass
class HierHaloPlan:
    """Explicit two-phase hierarchical boundary-row exchange for a
    ("host", "chip") mesh (VERDICT r3 #6): instead of one flat all_to_all
    whose DCN decomposition is left to XLA, the exchange runs as

    1. **chip-axis all_to_all** of the per-(owner, dest-chip) intra-host
       boundary slabs (pure ICI);
    2. **host-axis all_to_all** of the per-(owner, dest-HOST) slabs —
       each cross-host row is the UNION over the destination host's chips,
       so a row needed by many chips of one host crosses DCN exactly once;
    3. **chip-axis all_gather** of the received cross-host slabs, fanning
       them out to every chip of the destination host over ICI.

    Receive-table layout per chip: [intra C·Mc rows | cross C·H·Mh rows]
    with cross slot (c_owner·H + h_owner)·Mh + rank.  ``remapped_cols``
    point edge gathers into that table.  Opt-in via
    ``embed_sharded(halo="hier")`` — the A/B against the flat all_to_all
    on real DCN is the pod runbook's first experiment.
    """

    send_intra: np.ndarray  # int32 (P, C, Mc): rows k sends to same-host chip c
    send_cross: np.ndarray  # int32 (P, H, Mh): union rows k sends to host h
    remapped_cols: np.ndarray  # int32 (P, E): edge cols → recv-table slots
    Mc: int
    Mh: int
    n_hosts: int
    chips_per_host: int

    @property
    def table_rows(self) -> int:
        C, H = self.chips_per_host, self.n_hosts
        return C * self.Mc + C * H * self.Mh


def plan_halo_hier(sharded: ShardedCoo, n_hosts: int,
                   chips_per_host: int) -> HierHaloPlan:
    """Build the two-phase hierarchical exchange plan (host-major shard
    order: shard k = host·C + chip, matching mesh.make_hier_mesh)."""
    P, E = sharded.cols.shape
    H, C = n_hosts, chips_per_host
    if H * C != P:
        raise ValueError(f"mesh {H}x{C} != {P} shards")
    rps = sharded.rows_per_shard

    uniq_j = [np.unique(sharded.cols[j]) for j in range(P)]

    # cross need: union over the destination host's chips, per owner shard
    cross_need = {}
    for h in range(H):
        allcols = np.unique(np.concatenate(
            [uniq_j[j] for j in range(h * C, (h + 1) * C)]
        ))
        owner = allcols // rps
        gs = np.searchsorted(owner, np.arange(P + 1))
        for k in range(P):
            if k // C == h:
                continue
            cross_need[(k, h)] = allcols[gs[k]:gs[k + 1]] - k * rps
    Mh = max(1, max((len(v) for v in cross_need.values()), default=1))

    # intra need: per (same-host owner, dest chip)
    intra_need = {}
    for j in range(P):
        hj = j // C
        u = uniq_j[j]
        ow = u // rps
        gs = np.searchsorted(ow, np.arange(P + 1))
        for c in range(C):
            k = hj * C + c
            intra_need[(k, j)] = u[gs[k]:gs[k + 1]] - k * rps
    Mc = max(1, max(len(v) for v in intra_need.values()))

    send_intra = np.zeros((P, C, Mc), dtype=np.int32)
    for (k, j), rv in intra_need.items():
        send_intra[k, j % C, : len(rv)] = rv
    send_cross = np.zeros((P, H, Mh), dtype=np.int32)
    for (k, h), rv in cross_need.items():
        send_cross[k, h, : len(rv)] = rv

    remapped = np.empty_like(sharded.cols)
    base_cross = C * Mc
    for j in range(P):
        hj = j // C
        cols_j = sharded.cols[j].astype(np.int64)
        owner = cols_j // rps
        local = cols_j - owner * rps
        out = np.empty(E, dtype=np.int64)
        for k in range(P):
            m = owner == k
            if not m.any():
                continue
            if k // C == hj:
                lst = intra_need[(k, j)]
                out[m] = (k % C) * Mc + np.searchsorted(lst, local[m])
            else:
                lst = cross_need[(k, hj)]
                out[m] = (base_cross
                          + ((k % C) * H + (k // C)) * Mh
                          + np.searchsorted(lst, local[m]))
        remapped[j] = out.astype(np.int32)

    return HierHaloPlan(
        send_intra=send_intra, send_cross=send_cross,
        remapped_cols=remapped, Mc=Mc, Mh=Mh, n_hosts=H,
        chips_per_host=C,
    )


def local_shard_degrees(sharded: ShardedCoo) -> np.ndarray:
    """(P, rps) per-shard local-row degree counts from real edges (zero
    rows for shards whose data this host does not hold)."""
    P, _ = sharded.local_rows.shape
    rps = sharded.rows_per_shard
    deg = np.zeros((P, rps), dtype=np.int64)
    real = sharded.vals != 0.0
    for k in range(P):
        deg[k] = np.bincount(sharded.local_rows[k][real[k]], minlength=rps)
    return deg


def allgather_degrees(sharded: ShardedCoo, mesh) -> np.ndarray:
    """Global (P, rps) degree matrix for a piece-mode ShardedCoo: each
    process contributes its own shards' rows (the ELL layout's bucket
    widths and row counts must be identical on every process)."""
    import jax
    from jax.experimental import multihost_utils

    deg = local_shard_degrees(sharded)
    me = jax.process_index()
    owned = [k for k in range(sharded.local_rows.shape[0])
             if mesh.devices.flat[k].process_index == me]
    local = np.ascontiguousarray(deg[owned])
    out = multihost_utils.process_allgather(local)
    return np.asarray(out).reshape(deg.shape)


def put_global(mesh, a, spec, n_shards_total=None):
    """Place a globally-shaped host array with the given PartitionSpec,
    multi-process-safe.

    Single-process: plain ``device_put``.  Multi-process: slice this
    process's contiguous run of the leading (sharded) dimension and use
    ``make_array_from_process_local_data`` — ``device_put`` would verify
    the full array is identical across processes, which it is NOT when
    each host holds only its own sharded-build piece (unowned shards are
    all-padding there).  Replicated specs pass the whole array through.
    Shared by build_sharded_embed and the sharded sibling algorithms."""
    import jax
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(a, sh)
    if n_shards_total is None:
        n_shards_total = int(mesh.devices.size)
    sharded_dims = [i for i, s in enumerate(spec) if s is not None]
    if len(sharded_dims) > 1:
        raise ValueError(
            f"put_global supports at most one sharded dim, got {spec}"
        )
    if sharded_dims:
        # the sharded dim's axis names must cover the whole mesh (the
        # only pattern the callers use: axis = shard_axes(mesh))
        dim = sharded_dims[0]
        me = jax.process_index()
        ks = [k for k in range(n_shards_total)
              if mesh.devices.flat[k].process_index == me]
        if ks != list(range(ks[0], ks[-1] + 1)):
            raise ValueError(
                "this process's devices are not a contiguous run of "
                "the mesh's flattened order — build the mesh with "
                "make_mesh/make_hier_mesh (jax.devices() order)"
            )
        per = a.shape[dim] // n_shards_total
        idx = [slice(None)] * np.asarray(a).ndim
        idx[dim] = slice(ks[0] * per, (ks[-1] + 1) * per)
        a = np.ascontiguousarray(np.asarray(a)[tuple(idx)])
    return jax.make_array_from_process_local_data(sh, np.asarray(a))


def pad_rows(x: np.ndarray, n_rows_padded: int) -> np.ndarray:
    """Zero-pad embedding rows up to the sharded row count."""
    n, d = x.shape
    if n == n_rows_padded:
        return np.asarray(x, dtype=np.float32)
    out = np.zeros((n_rows_padded, d), dtype=np.float32)
    out[:n] = x
    return out


@dataclass
class OverlapPlan:
    """Per-round edge groups for the overlapped (ppermute-pipelined) halo
    exchange (SURVEY.md §2c: "all-to-all of halo rows … overlap with local
    SpMM"; transfer/compute pipelining pattern cf. SNIPPETS.md §[1]).

    The all_to_all of boundary rows is decomposed into P-1 single-hop
    ``ppermute`` rounds: in round r every device sends the slab destined
    for peer (d+r) mod P and receives from (d-r) mod P.  Each device's
    edges are pre-grouped by COLUMN OWNER so that round r's received slab
    immediately feeds the accumulation of the edges sourced at that owner,
    while the next round's transfer is already in flight (XLA's async
    collective-permute overlaps it with the gather/segment-sum compute).

    groups[r] = (local_rows, cols, vals), each (P, E_r): device d's edges
    whose column owner is (d - r) mod P.  Round 0 cols index the device's
    OWN x_local rows; rounds ≥ 1 cols are slab-local [0, M).
    """

    send_idx: np.ndarray  # int32 (P, P, M): [k, j] = LOCAL rows k sends to j
    M: int
    groups: tuple  # per round r: (lrows (P,E_r), cols (P,E_r), vals (P,E_r))


def plan_overlap(sharded: ShardedCoo, halo: "HaloPlan | None" = None
                 ) -> OverlapPlan:
    """Group each shard's edges by column owner for the pipelined exchange."""
    if halo is None:
        halo = plan_halo(sharded)
    P, E = sharded.cols.shape
    rps = sharded.rows_per_shard
    M = halo.M
    owner = (sharded.cols // rps).astype(np.int64)  # (P, E)
    slot = (halo.remapped_cols % M).astype(np.int32)
    real = sharded.vals != 0.0

    per_round = []
    for r in range(P):
        picks = []
        for j in range(P):
            k = (j - r) % P
            m = real[j] & (owner[j] == k)
            lr = sharded.local_rows[j][m]
            sc = (sharded.cols[j][m] - j * rps).astype(np.int32) if r == 0 \
                else slot[j][m]
            sv = sharded.vals[j][m]
            picks.append((lr, sc, sv))
        e_r = max(1, max(p[0].shape[0] for p in picks))
        e_r = round_up(e_r, 8)
        lrows = np.full((P, e_r), rps - 1, dtype=np.int32)
        cols = np.zeros((P, e_r), dtype=np.int32)
        vals = np.zeros((P, e_r), dtype=np.float32)
        for j, (lr, sc, sv) in enumerate(picks):
            lrows[j, : lr.shape[0]] = lr
            cols[j, : lr.shape[0]] = sc
            vals[j, : lr.shape[0]] = sv
        per_round.append((lrows, cols, vals))
    return OverlapPlan(send_idx=halo.send_idx, M=M, groups=tuple(per_round))
