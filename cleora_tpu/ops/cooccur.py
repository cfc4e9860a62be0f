"""Device-side windowed co-occurrence counting for the walk pipeline.

Mirrors the reference's windowed co-occurrence accumulation
(/root/reference/pycleora/algorithms.py:248-369 — there a dense (n, n)
host matrix) as a TPU-resident sparse sort-reduce.  The host sort-reduce
twin (`algorithms._walk_pair_counts`, native radix) is the right tool on
direct-attached hosts with many cores; behind a slow tunnel with few host
cores, the measured e2e is host-dominated (RESULTS.md), and the walks are
already on the device — so this module keeps them there:

1. per walk batch: enumerate every window offset's (center, context)
   pairs in BOTH directions, mask dead-end/pad lanes to an int32 sentinel,
   lexicographically sort the two int32 key lanes (``lax.sort`` with
   ``num_keys=2`` — no 64-bit emulation needed), and run-length-reduce to
   (unique center, unique context, count) with the uniques compacted to a
   prefix by a sorted scatter;
2. tree-merge the per-batch uniques pairwise on device (concat → 3-lane
   sort → run-length reduce, input buffers donated so XLA reuses them);
   only the scalar unique-count crosses the host link, to pick the next
   power-of-two compaction bucket (few static shapes → few compiles);
3. turn counts into positive-PMI values in place (`ppmi_coo`): degree
   sums by scatter-add, the log on device, invalid/padding slots mapped
   to (row n-1, val 0) so the result is exactly the sorted padded COO
   that ``ops.spmm.spmm_inner``'s flat path consumes — the randomized-SVD
   factorization then runs without any pair data ever visiting the host.

Counts are integer-exact: parity with the host path is asserted key-for-key
in tests/test_cooccur_device.py.
"""

from __future__ import annotations

import numpy as np

_SENT = np.int32(np.iinfo(np.int32).max)
_JITS: dict = {}


def _sort_reduce(cen, ctx, cnt):
    """Shared core: lexicographic (cen, ctx) sort, then run-length reduce.

    Returns full-length (ucen, uctx, ucnt, m): the m real unique pairs
    occupy a prefix; every later slot holds (sentinel, sentinel, 0-or-
    sentinel-count) and is ignored downstream.
    """
    import jax

    import jax.numpy as jnp

    cen, ctx, cnt = jax.lax.sort((cen, ctx, cnt), num_keys=2)
    first = jnp.concatenate([
        jnp.ones(1, dtype=bool),
        (cen[1:] != cen[:-1]) | (ctx[1:] != ctx[:-1]),
    ])
    ids = jnp.cumsum(first.astype(jnp.int32)) - 1
    length = cen.shape[0]
    ucen = jnp.full(length, _SENT, jnp.int32).at[ids].set(
        cen, indices_are_sorted=True, mode="drop")
    uctx = jnp.full(length, _SENT, jnp.int32).at[ids].set(
        ctx, indices_are_sorted=True, mode="drop")
    ucnt = jax.ops.segment_sum(cnt, ids, num_segments=length,
                               indices_are_sorted=True)
    m = jnp.sum(first & (cen != _SENT)).astype(jnp.int32)
    return ucen, uctx, ucnt, m


def _reduce_walks_impl(walks, n_valid, n, *, window):
    """Per-batch: windowed symmetric pairs → sorted unique counts."""
    import jax.numpy as jnp

    b, length = walks.shape
    live = (jnp.arange(b, dtype=jnp.int32) < n_valid)[:, None]
    cen_parts, ctx_parts = [], []
    for off in range(1, min(window, length - 1) + 1):
        a = walks[:, :-off]
        c = walks[:, off:]
        ok = (a < n) & (c < n) & live
        a_m = jnp.where(ok, a, _SENT).reshape(-1)
        c_m = jnp.where(ok, c, _SENT).reshape(-1)
        cen_parts += [a_m, c_m]   # both directions, like the host path
        ctx_parts += [c_m, a_m]
    cen = jnp.concatenate(cen_parts)
    ctx = jnp.concatenate(ctx_parts)
    cnt = jnp.ones(cen.shape[0], jnp.int32)
    return _sort_reduce(cen, ctx, cnt)


def _merge_impl(cen_a, ctx_a, cnt_a, cen_b, ctx_b, cnt_b):
    import jax.numpy as jnp

    return _sort_reduce(
        jnp.concatenate([cen_a, cen_b]),
        jnp.concatenate([ctx_a, ctx_b]),
        jnp.concatenate([cnt_a, cnt_b]),
    )


def _reduce_jit():
    if "reduce" not in _JITS:
        import jax

        _JITS["reduce"] = jax.jit(_reduce_walks_impl,
                                  static_argnames=("window",))
    return _JITS["reduce"]


def _merge_jit():
    if "merge" not in _JITS:
        import jax

        # donated inputs: the accumulator buffers are dead after the merge
        # and the concat+sort workspace is the HBM high-water mark
        _JITS["merge"] = jax.jit(_merge_impl, donate_argnums=(0, 1, 2, 3, 4, 5))
    return _JITS["merge"]


def _compact_jit():
    if "compact" not in _JITS:
        import jax

        def impl(cen, ctx, cnt, *, mb):
            return cen[:mb], ctx[:mb], cnt[:mb]

        _JITS["compact"] = jax.jit(impl, static_argnames=("mb",))
    return _JITS["compact"]


def _bucket(m: int, floor: int = 2048) -> int:
    """Compaction size: powers of two below 1M, then ~12% geometric steps
    (pad_coo's schedule).  Coarse enough to bound compile variety, tight
    enough that the final tree merge — whose concat of two compacted
    inputs is the HBM high-water mark of the whole pipeline — doesn't pay
    up-to-2× power-of-two padding at the hundreds-of-millions scale."""
    m = max(m, 1)
    if m <= floor:
        return floor
    if m <= 1 << 20:
        return 1 << m.bit_length() if m & (m - 1) else m
    bucket = 1 << 20
    while bucket < m:
        bucket += bucket // 8
    return bucket


def device_pair_counts(batches, n: int, window: int):
    """Reduce an iterable of device walk batches to device-resident unique
    (center, context, count) arrays.

    ``batches`` yields ``(walks, pad)`` with ``walks`` a device (B, L)
    int32 array (sentinel == n for dead ends) and ``pad`` the number of
    trailing padding lanes to ignore.  Returns ``(cen, ctx, cnt, m)``:
    compacted device arrays whose first ``m`` slots are the real unique
    pairs sorted by (center, context); the tail is sentinel/zero slots the
    downstream kernels mask.  Only scalar counts are fetched to the host.
    """
    import jax.numpy as jnp

    reduce_fn, merge_fn, compact = _reduce_jit(), _merge_jit(), _compact_jit()
    acc = []  # [(cen, ctx, cnt, m_actual)]
    for walks, pad in batches:
        b = walks.shape[0]
        u = reduce_fn(walks, jnp.int32(b - pad), jnp.int32(n), window=window)
        m = int(u[3])
        acc.append((*compact(*u[:3], mb=_bucket(m)), m))
    if not acc:
        empty = jnp.empty(0, jnp.int32)
        return empty, empty, empty, 0
    while len(acc) > 1:  # pairwise tree merge bounds the concat size
        nxt = []
        for i in range(0, len(acc) - 1, 2):
            a, b_ = acc[i], acc[i + 1]
            u = merge_fn(*a[:3], *b_[:3])
            m = int(u[3])
            nxt.append((*compact(*u[:3], mb=_bucket(m)), m))
        if len(acc) % 2:
            nxt.append(acc[-1])
        acc = nxt
    cen, ctx, cnt, m = acc[0]
    return cen, ctx, cnt, m


def _ppmi_impl(cen, ctx, cnt, *, n):
    """Counts → positive-PMI values, shaped for spmm_inner's flat path.

    Invalid/padding slots become (row n-1, col 0, val 0): harmless to the
    segment-sum and keeping rows nondecreasing (valid prefix is sorted,
    n-1 ≥ any valid row id), as the sorted-COO contract requires.
    """
    import jax.numpy as jnp

    valid = cen < n
    w = jnp.where(valid, cnt, 0).astype(jnp.float32)
    idx_r = jnp.where(valid, cen, 0)
    idx_c = jnp.where(valid, ctx, 0)
    row_sums = jnp.zeros(n, jnp.float32).at[idx_r].add(
        w, indices_are_sorted=True)
    col_sums = jnp.zeros(n, jnp.float32).at[idx_c].add(w)
    total = jnp.sum(w)
    denom = jnp.maximum(row_sums[idx_r], 1e-10) * \
        jnp.maximum(col_sums[idx_c], 1e-10)
    pmi = jnp.log(jnp.maximum(w * total / denom, 1e-15))
    val = jnp.where(valid, jnp.maximum(pmi, 0.0), 0.0).astype(jnp.float32)
    rows = jnp.where(valid, cen, n - 1)
    cols = jnp.where(valid, ctx, 0)
    return rows, cols, val


def ppmi_coo(cen, ctx, cnt, n: int):
    """Device (rows, cols, vals) positive-PMI COO from unique pair counts."""
    if "ppmi" not in _JITS:
        import jax

        _JITS["ppmi"] = jax.jit(_ppmi_impl, static_argnames=("n",))
    return _JITS["ppmi"](cen, ctx, cnt, n=n)
