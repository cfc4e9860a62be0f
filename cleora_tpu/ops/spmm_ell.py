"""Sliced-ELL SpMM: fixed-width rows, dense output, no HBM intermediate.

Reference semantics: ``spmm_kernel`` (/root/reference/src/embedding.rs:52-86)
— ``out[i] = Σ_{edges (i→j)} value · x[j]``.  The reference accumulates per
row in registers; the XLA COO paths (ops/spmm.py) cannot, because a
segment-sum (scatter) does not fuse with its gather producer, so they
materialize a (chunk, D) scaled intermediate in HBM — roughly doubling
traffic (measured: 47 M edge-ops/s vs 106 M rows/s for the gather alone).

TPU-native fix: make the output DENSE per row.  Rows are relabeled by
degree (a host-side, once-per-graph permutation), grouped into buckets of
fixed edge width k, and each row's edges padded to k with (col=0, val=0).
Per bucket the propagate is

    out_b[i] = Σ_j  x[cols_b[i, j]] · vals_b[i, j]

— gather → multiply → sum over a static axis, which XLA fuses into ONE
kernel: x rows stream from HBM straight into a register accumulator and
``out_b`` is written exactly once.  No scatter, no intermediate.  Rows with
degree > the max width are split into "virtual" rows combined by one small
sorted segment-sum (hubs only).

The embedding state lives in RELABELED space for the whole iteration loop
(L2/L1/spectral normalization, whitening, residual and RMSE convergence are
all permutation-invariant), so the relabel costs two O(N·D) passes total,
not per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Max edges per (virtual) row; rows beyond split into virtual rows.
_K_MAX = 64

# Max bucket count for the width DP: more buckets = less padding but more
# (smaller) fused kernels per iteration.  16 reaches ~0% padding on
# Poisson-like degree histograms (vs 5.4% for the round-2 fixed heuristic)
# at negligible launch cost.
_MAX_BUCKETS = 16

# Canonical bucket-width ladder for compile-cache-portable plans
# (plan_ell(canonical=True)): every graph uses these 12 widths, so two
# graphs of similar scale lower to the SAME XLA program.  Padding is
# nearly free on this hardware — the gather issue limit tracks edges, not
# padded slots (RESULTS.md) — so the ladder trades a few % of slots for
# program reuse (cold remote compiles cost 12-32 min in this environment).
_LADDER = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)


def _grid_up(n: int, lo: int = 8) -> int:
    """Round ``n`` up to the canonical row-count grid: multiples of
    2^(ceil(log2 n) - 3) (eighth steps of the NEXT power of two — worst
    case <25% overshoot just above a power of two, typically ~6%),
    minimum ``lo``.  Similar-scale graphs land on the same grid value,
    making every slab shape — and hence the lowered program — identical;
    the deliberately coarse grid favors program reuse over padding
    (padded slots are nearly free: the gather issue limit tracks edges)."""
    n = int(n)
    if n <= lo:
        return lo
    q = 1 << max((n - 1).bit_length() - 3, 3)
    return -(-n // q) * q


@jax.tree_util.register_pytree_node_class
class EllPlan:
    """Degree-bucketed fixed-width edge layout (see module docstring).

    Attributes
    ----------
    buckets : tuple of (cols, vals) — cols/vals are (n_b, k_b) arrays in
        RELABELED column space; bucket rows are contiguous in relabeled row
        order (ascending degree), starting after ``n_zero`` all-zero rows.
    hub : None, or (cols, vals, seg_ids) — width-_K_MAX virtual rows for
        degree>_K_MAX rows (placed last), combined by a sorted segment-sum
        over seg_ids into ``n_hub`` rows (static aux data).
    order : (n_rows,) int32 — old row index for each new position
        (x_relabeled = x[order]).
    rank : (n_rows,) int32 — new position of each old row
        (out_old = out_new[rank]).

    Canonical plans (``plan_ell(canonical=True)``) carry two extra leaves:
    ``valid`` ((R, 1) f32, 1.0 at positions holding a real row) and
    ``count`` (0-d f32, the true row count) — both traced operands, so the
    whitening statistics and RMSE denominators stay exact without baking
    graph-specific integers into the program.  For canonical plans
    ``n_rows`` is the PADDED state row count R (``order``/``rank`` have
    length R; positions not covered by a real row read a zeroed pad row
    and stay exactly zero through the loop) and ``nnz`` is stored as 0 in
    the static aux (the true value lives in ``nnz_real``) so the jit cache
    key carries no graph-exact scalars.
    """

    def __init__(self, buckets, hub, order, rank, n_zero: int, n_rows: int,
                 nnz: int, n_hub: int = 0, valid=None, count=None):
        self.buckets = tuple(buckets)
        self.hub = hub  # (cols, vals, seg_ids) or None
        self.n_hub = int(n_hub)
        self.order = order
        self.rank = rank
        self.n_zero = int(n_zero)
        self.n_rows = int(n_rows)
        self.nnz = int(nnz)
        self.nnz_real = int(nnz)
        self.valid = valid
        self.count = count

    def tree_flatten(self):
        return (
            (self.buckets, self.hub, self.order, self.rank, self.valid,
             self.count),
            (self.n_zero, self.n_rows, self.nnz, self.n_hub),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        buckets, hub, order, rank, valid, count = children
        return cls(buckets, hub, order, rank, *aux, valid=valid, count=count)

    @property
    def state_rows(self) -> int:
        """Rows of the loop state (== n_rows except for canonical plans,
        where the state is padded to the canonical grid)."""
        return int(self.order.shape[0])

    def device(self):
        return jax.tree_util.tree_map(jnp.asarray, self)

    @property
    def slots(self) -> int:
        """Total gather slots (padding overhead = slots / nnz)."""
        s = sum(int(np.prod(np.shape(c))) for c, _ in self.buckets)
        if self.hub is not None:
            s += int(np.prod(np.shape(self.hub[0])))
        return s


def _widths_for(degrees: np.ndarray, max_buckets: int = _MAX_BUCKETS) -> list:
    """Slot-minimal bucket widths for the degree histogram.

    Exact DP over the ≤_K_MAX distinct degrees present: partition them into
    at most ``max_buckets`` contiguous groups, each group's slot cost being
    (rows in group) × (group's max degree); minimize total slots.  O(64²·B)
    host work.  Replaces the round-2 fixed step heuristic (5.4% padding at
    the bench shape vs 0.01% here with B=16)."""
    cnt = np.bincount(np.asarray(degrees, dtype=np.int64),
                      minlength=_K_MAX + 1)
    present = np.nonzero(cnt[1:])[0] + 1  # distinct degrees in [1, _K_MAX]
    present = present[present <= _K_MAX]  # callers pass the non-hub slice
    n = int(present.shape[0])
    if n == 0:
        return []
    if n <= max_buckets:
        return present.tolist()
    pc = cnt[present].astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(pc)])
    INF = 1 << 62
    B = int(max_buckets)
    f = np.full((n + 1, B + 1), INF, dtype=np.int64)
    arg = np.zeros((n + 1, B + 1), dtype=np.int64)
    f[0, 0] = 0
    for j in range(1, n + 1):
        w = int(present[j - 1])
        for b in range(1, B + 1):
            # group covers present[i..j-1]; cost = rows(i..j-1) * w
            costs = f[:j, b - 1] + (csum[j] - csum[:j]) * w
            i = int(np.argmin(costs))
            f[j, b] = costs[i]
            arg[j, b] = i
    b = int(np.argmin(f[n, 1:])) + 1
    widths = []
    j = n
    while j > 0:
        widths.append(int(present[j - 1]))
        j = int(arg[j, b])
        b -= 1
    return widths[::-1]


def ragged_slot_indices(counts: np.ndarray):
    """(i_idx, j_idx) covering slot (i, j) for j < counts[i] — the
    vectorized ragged-scatter index pattern shared by the single-chip
    bucket packer (``_fill``) and the sharded packer (parallel/ell.py)."""
    total = int(counts.sum())
    i_idx = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
    j_idx = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return i_idx, j_idx


def _fill_slab(indptr, ec, ev, first_row, n_b, k):
    """Pack positions [first_row, first_row+n_b) into an (n_b, k) slab from
    the position-sorted edge arrays (ec, ev) indexed by ``indptr``."""
    c = np.zeros((n_b, k), dtype=np.int32)
    v = np.zeros((n_b, k), dtype=np.float32)
    starts = indptr[first_row:first_row + n_b]
    counts = (indptr[first_row + 1:first_row + n_b + 1] - starts)
    i_idx, j_idx = ragged_slot_indices(counts)
    src = np.repeat(starts, counts) + j_idx
    c[i_idx, j_idx] = ec[src]
    v[i_idx, j_idx] = ev[src]
    return c, v


def plan_ell(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
             n_rows: int, d: int = 256, max_waste: float = 2.0,
             canonical: bool = False):
    """Build the sliced-ELL layout.  Returns EllPlan, or None when padding
    would exceed ``max_waste`` × nnz (caller falls back to a COO layout).

    rows must be sorted ascending (the standard COO contract in this repo).
    ``d`` (the feature width) is currently unused: measured on v5e the
    gather issue rate tracks the EDGE count, not padded slots or row
    bytes (RESULTS.md), so the waste thresholds are dim-independent.  It
    stays in the signature for future dim-aware budgets (e.g. VMEM-sized
    bucket splitting).

    ``canonical=True`` quantizes every shape to a graph-independent grid
    (the ``_LADDER`` widths, ``_grid_up`` row counts) so graphs of similar
    scale lower to the SAME XLA program and hit the persistent compile
    cache warm — see :func:`_plan_ell_canonical`.
    """
    if canonical:
        return _plan_ell_canonical(rows, cols, vals, n_rows, max_waste)
    nnz = int(rows.shape[0])
    if nnz == 0 or n_rows == 0:
        return None
    rows = np.asarray(rows, dtype=np.int64)
    degrees = np.bincount(rows, minlength=n_rows).astype(np.int64)

    # relabel: ascending degree, stable (preserves id locality per degree)
    order = np.argsort(degrees, kind="stable").astype(np.int32)
    rank = np.empty(n_rows, dtype=np.int32)
    rank[order] = np.arange(n_rows, dtype=np.int32)

    deg_sorted = degrees[order]
    n_zero = int(np.searchsorted(deg_sorted, 1))
    n_hub_rows = int(n_rows - np.searchsorted(deg_sorted, _K_MAX + 1))

    widths = _widths_for(deg_sorted[n_zero:n_rows - n_hub_rows if n_hub_rows
                                    else n_rows])
    # slot budget check before building anything heavy
    slots = 0
    lo_deg = 0
    for w in widths:
        mask = (deg_sorted > lo_deg) & (deg_sorted <= w)
        slots += int(mask.sum()) * w
        lo_deg = w
    if n_hub_rows:
        hub_deg = deg_sorted[n_rows - n_hub_rows:]
        slots += int(np.ceil(hub_deg / _K_MAX).sum()) * _K_MAX
    if slots > max_waste * nnz:
        return None

    # per-edge new row id, then sort edges by (new_row) to group per bucket;
    # rows is sorted by old row so within a new row edges stay contiguous
    new_rows = rank[rows]
    eorder = np.argsort(new_rows, kind="stable")
    er = new_rows[eorder]
    ec = rank[np.asarray(cols, dtype=np.int64)].astype(np.int32)[eorder]
    ev = np.asarray(vals, dtype=np.float32)[eorder]
    # CSR pointers over new rows
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(er, minlength=n_rows), out=indptr[1:])

    buckets = []
    row_cursor = n_zero
    for w in widths:
        hi = int(np.searchsorted(deg_sorted, w + 1))
        hi = min(hi, n_rows - n_hub_rows)
        n_b = hi - row_cursor
        if n_b > 0:
            buckets.append(_fill_slab(indptr, ec, ev, row_cursor, n_b, w))
            row_cursor = hi

    hub = None
    if n_hub_rows:
        first = n_rows - n_hub_rows
        hub_deg = deg_sorted[first:]
        vcounts = np.ceil(hub_deg / _K_MAX).astype(np.int64)
        n_virt = int(vcounts.sum())
        hc = np.zeros((n_virt, _K_MAX), dtype=np.int32)
        hv = np.zeros((n_virt, _K_MAX), dtype=np.float32)
        seg = np.repeat(np.arange(n_hub_rows, dtype=np.int32), vcounts)
        vrow = 0
        for i in range(n_hub_rows):
            s, e = int(indptr[first + i]), int(indptr[first + i + 1])
            for off in range(s, e, _K_MAX):
                take = min(_K_MAX, e - off)
                hc[vrow, :take] = ec[off:off + take]
                hv[vrow, :take] = ev[off:off + take]
                vrow += 1
        hub = (hc, hv, seg)

    return EllPlan(buckets, hub, order, rank, n_zero, n_rows, nnz,
                   n_hub=n_hub_rows)


def _plan_ell_canonical(rows, cols, vals, n_rows: int, max_waste: float):
    """Compile-cache-portable sliced-ELL plan (VERDICT r2 #4).

    Every shape in the emitted pytree is quantized to a graph-independent
    grid: all 12 ``_LADDER`` width buckets are always present, each slab's
    row count (and the zero block, hub block, and virtual-row slab) is
    rounded up with ``_grid_up``, and the state row count R is their sum.
    Positions not covered by a real row are "garbage" rows: their slots
    hold (col=0, val=0) edges, nothing ever gathers them, and the loop
    keeps them exactly zero (the whitening statistics and the RMSE
    denominator use the traced ``valid``/``count`` leaves instead of
    shape-derived constants).  Two graphs whose quantized block sizes
    coincide — typical for graphs within a few % of each other in scale —
    lower to the SAME XLA program, so the second one compiles for free
    (12-32 min saved per shape through this environment's remote-compile
    tunnel; see tests/test_canonical_ell.py for the cache-hit assertion).

    Returns None when even the quantized padding exceeds
    ``max(max_waste · nnz, 4096)`` slots — tiny graphs below the fixed
    floor always build (their minimum-size slabs cost microseconds).
    """
    nnz = int(rows.shape[0])
    if nnz == 0 or n_rows == 0:
        return None
    rows = np.asarray(rows, dtype=np.int64)
    degrees = np.bincount(rows, minlength=n_rows).astype(np.int64)
    order = np.argsort(degrees, kind="stable").astype(np.int32)
    deg_sorted = degrees[order]
    n_zero_real = int(np.searchsorted(deg_sorted, 1))
    n_hub_rows = int(n_rows - np.searchsorted(deg_sorted, _K_MAX + 1))
    n_nonhub = n_rows - n_hub_rows

    widths = list(_LADDER)
    # +8 guarantees garbage zero rows exist (R > n): they are the read
    # target of padded order entries and the park position of padded rank
    # entries
    z_pad = _grid_up(n_zero_real + 8)
    cuts = [n_zero_real]
    for w in widths:
        cuts.append(min(int(np.searchsorted(deg_sorted, w + 1)), n_nonhub))
    nb_real = [cuts[b + 1] - cuts[b] for b in range(len(widths))]
    nb_pad = [_grid_up(c) for c in nb_real]
    n_hub_pad = _grid_up(n_hub_rows)
    hub_deg = deg_sorted[n_nonhub:]
    vcounts = np.ceil(hub_deg / _K_MAX).astype(np.int64)
    n_virt_real = int(vcounts.sum())
    n_virt_pad = _grid_up(n_virt_real)

    slots = sum(nb * w for nb, w in zip(nb_pad, widths)) + n_virt_pad * _K_MAX
    if slots > max(max_waste * nnz, 4096):
        return None

    bucket_base = []
    base = z_pad
    for c in nb_pad:
        bucket_base.append(base)
        base += c
    hub_base = base
    R = hub_base + n_hub_pad

    pos_sorted = np.empty(n_rows, dtype=np.int64)
    pos_sorted[:n_zero_real] = np.arange(n_zero_real)
    for b in range(len(widths)):
        lo_i, hi_i = cuts[b], cuts[b + 1]
        pos_sorted[lo_i:hi_i] = bucket_base[b] + np.arange(hi_i - lo_i)
    pos_sorted[n_nonhub:] = hub_base + np.arange(n_hub_rows)

    order_p = np.full(R, n_rows, dtype=np.int32)  # garbage → zeroed pad row
    order_p[pos_sorted] = order
    rank_p = np.full(R, z_pad - 1, dtype=np.int32)  # pad → a garbage zero row
    rank_p[order.astype(np.int64)] = pos_sorted
    valid = np.zeros((R, 1), dtype=np.float32)
    valid[pos_sorted, 0] = 1.0
    count = np.asarray(n_rows, dtype=np.float32)

    new_rows = rank_p[rows]
    eorder = np.argsort(new_rows, kind="stable")
    er = new_rows[eorder]
    ec = rank_p[np.asarray(cols, dtype=np.int64)].astype(np.int32)[eorder]
    ev = np.asarray(vals, dtype=np.float32)[eorder]
    indptr = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(np.bincount(er, minlength=R), out=indptr[1:])

    buckets = [
        _fill_slab(indptr, ec, ev, bucket_base[b], nb_pad[b], widths[b])
        for b in range(len(widths))
    ]

    hc = np.zeros((n_virt_pad, _K_MAX), dtype=np.int32)
    hv = np.zeros((n_virt_pad, _K_MAX), dtype=np.float32)
    seg = np.full(n_virt_pad, max(n_hub_pad - 1, 0), dtype=np.int32)
    if n_hub_rows:
        starts = indptr[hub_base:hub_base + n_hub_rows]
        counts = indptr[hub_base + 1:hub_base + n_hub_rows + 1] - starts
        h_idx, j_idx = ragged_slot_indices(counts)
        src = np.repeat(starts, counts) + j_idx
        vstart = np.cumsum(vcounts) - vcounts
        hc[vstart[h_idx] + j_idx // _K_MAX, j_idx % _K_MAX] = ec[src]
        hv[vstart[h_idx] + j_idx // _K_MAX, j_idx % _K_MAX] = ev[src]
        seg[:n_virt_real] = np.repeat(
            np.arange(n_hub_rows, dtype=np.int32), vcounts
        )

    plan = EllPlan(buckets, (hc, hv, seg), order_p, rank_p, z_pad, R,
                   0, n_hub=n_hub_pad, valid=valid, count=count)
    plan.nnz_real = nnz
    return plan


# Bucket propagate formulation.  "unroll" = k separate column gathers summed
# as an elementwise chain — XLA fuses every gather straight into the running
# sum, so nothing bigger than the (n_b, D) output is ever materialized.
# "reduce" = single gather + reshape + sum-over-k.  Measured on TPU v5e at
# the bench shape (40-iter whitened loop): unroll 88.3 M edge-ops/s vs
# reduce 67.2 M (the reduce form materializes the (n_b, k, D) gather).
FORMULATION = "unroll"


def _bucket_out(x, cols_b, vals_b, acc_dtype):
    n_b, k = cols_b.shape
    if k == 0:
        return jnp.zeros((n_b, x.shape[1]), acc_dtype)
    if FORMULATION == "unroll":
        out = (jnp.take(x, cols_b[:, 0], axis=0).astype(acc_dtype)
               * vals_b[:, 0:1].astype(acc_dtype))
        for j in range(1, k):
            out = out + (jnp.take(x, cols_b[:, j], axis=0).astype(acc_dtype)
                         * vals_b[:, j:j + 1].astype(acc_dtype))
        return out
    g = jnp.take(x, cols_b.reshape(-1), axis=0).astype(acc_dtype)
    g = g.reshape(n_b, k, x.shape[1])
    return jnp.sum(g * vals_b[:, :, None].astype(acc_dtype), axis=1)


def spmm_ell(plan: EllPlan, x: jax.Array) -> jax.Array:
    """out = A @ x with A in sliced-ELL layout; x and out in RELABELED space."""
    acc = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    parts = []
    if plan.n_zero:
        parts.append(jnp.zeros((plan.n_zero, x.shape[1]), acc))
    for cols_b, vals_b in plan.buckets:
        parts.append(_bucket_out(x, cols_b, vals_b, acc))
    if plan.hub is not None:
        hc, hv, seg = plan.hub
        raw = _bucket_out(x, hc, hv, acc)
        parts.append(jax.ops.segment_sum(
            raw, seg, num_segments=plan.n_hub, indices_are_sorted=True
        ))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
