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

import os
import threading

import numpy as np

_SENT = np.int32(np.iinfo(np.int32).max)
_JITS: dict = {}
# walk-batch cache budget for multi-pass counting (see device_pair_counts);
# 2 GiB ≈ 6.7M len-80 walks — far past any single-chip workload's walks,
# while the sort working set is what actually gates a pass
_WALK_CACHE_BYTES = 2 << 30


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


def _reduce_walks_impl(walks, n_valid, n, hash_s, hash_mod, *, window):
    """Per-batch: windowed symmetric pairs → sorted unique counts.

    ``hash_s``/``hash_mod`` select one hash partition of the CENTER ids
    (``cen % hash_mod == hash_s``); the driver runs one counting pass per
    partition so no single merge ever holds the full unique set — the
    partitions are row-disjoint, which is exactly what the downstream
    multi-range SpMM needs.  ``hash_mod == 1`` keeps every pair."""
    import jax.numpy as jnp

    b, length = walks.shape
    live = (jnp.arange(b, dtype=jnp.int32) < n_valid)[:, None]
    cen_parts, ctx_parts = [], []
    for off in range(1, min(window, length - 1) + 1):
        a = walks[:, :-off]
        c = walks[:, off:]
        ok = (a < n) & (c < n) & live
        ok_ac = ok & (a % hash_mod == hash_s)   # direction a -> c
        ok_ca = ok & (c % hash_mod == hash_s)   # direction c -> a
        cen_parts += [jnp.where(ok_ac, a, _SENT).reshape(-1),
                      jnp.where(ok_ca, c, _SENT).reshape(-1)]
        ctx_parts += [jnp.where(ok_ac, c, _SENT).reshape(-1),
                      jnp.where(ok_ca, a, _SENT).reshape(-1)]
    cen = jnp.concatenate(cen_parts)
    ctx = jnp.concatenate(ctx_parts)
    cnt = jnp.ones(cen.shape[0], jnp.int32)
    return _sort_reduce(cen, ctx, cnt)


def _reduce_walks_compact_impl(walks, n_valid, n, hash_s, hash_mod, *,
                               window, bucket):
    """Partition-compacted reduce — the multi-pass fast path.

    Enumerates exactly the pairs of :func:`_reduce_walks_impl`, but
    scatters this pass's LIVE lanes (an expected ~1/hash_mod of the
    batch) into a ``(bucket,)`` prefix via masked-cumsum indices before
    the lexicographic sort, so the per-pass sort cost tracks the
    PARTITION size instead of the full corpus — with H hash partitions
    the current path pays H full-batch sorts per corpus where one would
    do.  Returns ``(ucen, uctx, ucnt, m, live)``: ``live`` is the true
    live-lane count, letting the host detect bucket overflow (possible
    only under extreme visit-frequency skew, e.g. a hub star — dense
    first-seen ids are uniform mod H by construction) and rerun the
    exact full-sort path.  With ``live <= bucket`` the compaction is an
    order-preserving filter, so the sort-reduce sees the same multiset
    and the counts are bit-identical (tests/test_cooccur_device.py).

    Gated by ``CLEORA_COOC_COMPACT=1`` pending an on-chip A/B — the
    scatter is the same sorted-indices pattern ``_sort_reduce`` already
    issues, but this repo does not default unmeasured perf paths
    (ROADMAP runbook).
    """
    import jax.numpy as jnp

    b, length = walks.shape
    live_rows = (jnp.arange(b, dtype=jnp.int32) < n_valid)[:, None]
    cen_parts, ctx_parts = [], []
    for off in range(1, min(window, length - 1) + 1):
        a = walks[:, :-off]
        c = walks[:, off:]
        ok = (a < n) & (c < n) & live_rows
        ok_ac = ok & (a % hash_mod == hash_s)   # direction a -> c
        ok_ca = ok & (c % hash_mod == hash_s)   # direction c -> a
        cen_parts += [jnp.where(ok_ac, a, _SENT).reshape(-1),
                      jnp.where(ok_ca, c, _SENT).reshape(-1)]
        ctx_parts += [jnp.where(ok_ac, c, _SENT).reshape(-1),
                      jnp.where(ok_ca, a, _SENT).reshape(-1)]
    cen = jnp.concatenate(cen_parts)
    ctx = jnp.concatenate(ctx_parts)
    mask = cen != _SENT
    live = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.where(mask, idx, bucket)  # dead lanes fall off the end
    ccen = jnp.full(bucket, _SENT, jnp.int32).at[idx].set(cen, mode="drop")
    cctx = jnp.full(bucket, _SENT, jnp.int32).at[idx].set(ctx, mode="drop")
    ccnt = (ccen != _SENT).astype(jnp.int32)
    return (*_sort_reduce(ccen, cctx, ccnt), live)


def _reduce_compact_jit():
    if "reduce_compact" not in _JITS:
        import jax

        _JITS["reduce_compact"] = jax.jit(
            _reduce_walks_compact_impl,
            static_argnames=("window", "bucket"))
    return _JITS["reduce_compact"]


def _compact_bucket_for(batch_shape, window: int, passes: int):
    """Static compaction bucket for one batch shape, or None when the
    compacted path cannot win (single pass, tiny batches, or the
    CLEORA_COOC_COMPACT gate off).  2× headroom over the uniform
    1/passes expectation absorbs visit-frequency skew; overflow beyond
    that falls back to the exact full-sort reduce per batch."""
    if passes <= 1 or os.environ.get("CLEORA_COOC_COMPACT") != "1":
        return None
    b, length = batch_shape
    w = min(window, length - 1)
    lanes = 2 * b * (w * length - w * (w + 1) // 2)
    target = _bucket(-(-2 * lanes // passes))
    return target if target < lanes else None


def _reduce_batch(walks, pad, s, passes, n, window):
    """Dispatch one batch's reduce: compacted fast path when engaged
    (overflow reruns the full path — exact either way), else the
    full-batch sort.  Returns the full-length (ucen, uctx, ucnt, m)
    contract of :func:`_reduce_jit`."""
    import jax.numpy as jnp

    b = walks.shape[0]
    args = (walks, jnp.int32(b - pad), jnp.int32(n),
            jnp.int32(s), jnp.int32(passes))
    bucket = _compact_bucket_for(walks.shape, window, passes)
    if bucket is not None:
        u = _reduce_compact_jit()(*args, window=window, bucket=bucket)
        if int(u[4]) <= bucket:
            return u[:4]
    return _reduce_jit()(*args, window=window)


def _reduce_walks_sweep_impl(walks, n_valid, n, *, window, passes):
    """Single-sweep ALL-partitions reduce — one sort serves every pass.

    The multi-pass design exists so no single MERGE working set holds
    the full unique pair set; but its per-pass reduce re-enumerates and
    re-sorts the ENTIRE corpus once per hash partition, and the on-chip
    A/B of the partition-compacted variant (scripts/compact_ab_probe.py,
    RESULTS.md) showed the full-batch work — not the sort length — is
    the per-pass bound.  This kernel removes the H× sweep instead: the
    hash partition is packed into the center sort key
    (``key = (cen % passes) * n + cen``, int32-exact while
    ``passes * n < 2**31`` — the caller gates), so ONE lexicographic
    ``(key, ctx)`` sort — the same 3-lane width the per-pass reduce
    already pays — yields every partition's uniques as contiguous,
    (cen, ctx)-sorted segments of the compacted prefix.  Returns
    ``(ucen, uctx, ucnt, m_per)`` with ``m_per[s]`` the unique count of
    partition ``s``; :func:`_extract_impl` slices each segment into the
    standard compacted range form.  Merges stay per-partition and
    bounded exactly as before.
    """
    import jax

    import jax.numpy as jnp

    b, length = walks.shape
    live_rows = (jnp.arange(b, dtype=jnp.int32) < n_valid)[:, None]
    cen_parts, ctx_parts = [], []
    for off in range(1, min(window, length - 1) + 1):
        a = walks[:, :-off]
        c = walks[:, off:]
        ok = (a < n) & (c < n) & live_rows
        cen_parts += [jnp.where(ok, a, _SENT).reshape(-1),
                      jnp.where(ok, c, _SENT).reshape(-1)]
        ctx_parts += [jnp.where(ok, c, _SENT).reshape(-1),
                      jnp.where(ok, a, _SENT).reshape(-1)]
    cen = jnp.concatenate(cen_parts)
    ctx = jnp.concatenate(ctx_parts)
    dead = jnp.int32(passes * n)  # > every live key; caller gates int32 fit
    key = jnp.where(cen != _SENT, (cen % passes) * n + cen, dead)
    cnt = jnp.ones(key.shape[0], jnp.int32)
    key, ctx, cnt = jax.lax.sort((key, ctx, cnt), num_keys=2)
    first = jnp.concatenate([
        jnp.ones(1, dtype=bool),
        (key[1:] != key[:-1]) | (ctx[1:] != ctx[:-1]),
    ])
    ids = jnp.cumsum(first.astype(jnp.int32)) - 1
    lanes = key.shape[0]
    live = key < dead
    ucen = jnp.full(lanes, _SENT, jnp.int32).at[ids].set(
        jnp.where(live, key % n, _SENT),
        indices_are_sorted=True, mode="drop")
    uctx = jnp.full(lanes, _SENT, jnp.int32).at[ids].set(
        ctx, indices_are_sorted=True, mode="drop")
    ucnt = jax.ops.segment_sum(cnt, ids, num_segments=lanes,
                               indices_are_sorted=True)
    part = jnp.where(live, key // n, jnp.int32(passes))
    m_per = jnp.zeros(passes + 1, jnp.int32).at[part].add(
        first.astype(jnp.int32))[:passes]
    return ucen, uctx, ucnt, m_per


def _extract_impl(ucen, uctx, ucnt, start, m, *, mb):
    """Slice one partition's ``[start, start+m)`` segment of a sweep
    reduce into the standard compacted ``mb``-bucket range (tails
    canonicalized to sentinel/zero — downstream masks by ``m``)."""
    import jax

    import jax.numpy as jnp

    pad_i = jnp.full(mb, _SENT, jnp.int32)
    cen = jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([ucen, pad_i]), start, mb)
    ctx = jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([uctx, pad_i]), start, mb)
    cnt = jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([ucnt, jnp.zeros(mb, jnp.int32)]), start, mb)
    keep = jnp.arange(mb, dtype=jnp.int32) < m
    return (jnp.where(keep, cen, _SENT), jnp.where(keep, ctx, _SENT),
            jnp.where(keep, cnt, 0))


def _sweep_jit():
    if "sweep" not in _JITS:
        import jax

        _JITS["sweep"] = jax.jit(_reduce_walks_sweep_impl,
                                 static_argnames=("window", "passes"))
    return _JITS["sweep"]


def _extract_jit():
    if "extract" not in _JITS:
        import jax

        _JITS["extract"] = jax.jit(_extract_impl, static_argnames=("mb",))
    return _JITS["extract"]


def _sweep_ok(n: int, passes: int) -> bool:
    """Single-sweep counting engages for multi-pass corpora whose packed
    partition key fits int32 (``CLEORA_COOC_SWEEP=0`` restores the
    per-pass reduce — e.g. to reproduce old timings)."""
    if passes <= 1 or os.environ.get("CLEORA_COOC_SWEEP") == "0":
        return False
    return passes * n < 2**31


def _run_sweep(batches_fn, passes, n, window):
    """Count EVERY hash partition in one corpus sweep (:func:`
    _reduce_walks_sweep_impl`): per batch, one sort emits all partitions'
    segments, which chain-merge into per-partition accumulators — the
    merge working set stays one partition + one batch segment, so the
    multi-pass memory bound is preserved while the corpus is enumerated
    and sorted exactly once.  Returns the per-partition compacted ranges
    (pass order, same content the per-pass path produces) or ``None``
    for an empty corpus."""
    import jax.numpy as jnp

    merge_fn, compact = _merge_jit(), _compact_jit()
    sweep, extract = _sweep_jit(), _extract_jit()
    acc = [None] * passes
    seen = False
    for walks, pad in batches_fn():
        seen = True
        u = sweep(walks, jnp.int32(walks.shape[0] - pad), jnp.int32(n),
                  window=window, passes=passes)
        m_per = np.asarray(u[3])  # one small scalar-vector fetch per batch
        starts = np.concatenate(([0], np.cumsum(m_per[:-1], dtype=np.int64)))
        for s in range(passes):
            m_s = int(m_per[s])
            r_s = (*extract(u[0], u[1], u[2], jnp.int32(starts[s]),
                            jnp.int32(m_s), mb=_bucket(m_s)), m_s)
            if acc[s] is None:
                acc[s] = r_s
            else:
                v = merge_fn(*acc[s][:3], *r_s[:3])
                m = int(v[3])
                acc[s] = (*compact(*v[:3], mb=_bucket(m)), m)
                del v
        del u
    return acc if seen else None


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

        # NO donation: XLA can only alias a donated input onto a
        # SAME-SIZE output, and every merge output is larger than either
        # input — donation never engages (it only warned) and XLA frees
        # the inputs after their last read regardless
        _JITS["merge"] = jax.jit(_merge_impl)
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


class CountCheckpoint:
    """Per-pass durable checkpoint of the counting stage.

    Counting dominates the device walk pipeline's wall-clock (RESULTS.md)
    and the walks are deterministically regenerable per seed, so the
    durable unit is one hash partition's FINISHED count range: when pass
    ``s`` completes, its compacted (cen, ctx, cnt, m) is fetched
    host-side in bounded chunks (the tunnel-safe pattern,
    parallel/state.py) and written as one self-validating ``.npz`` via
    atomic rename — each pass file is complete-or-absent, no meta
    ordering to corrupt.  Files embed the caller's ``fingerprint`` (walk
    configuration + graph content, computed in
    ``algorithms._walk_fingerprint``) so a resume rejects ranges from a
    different corpus and recounts instead of silently reusing them.

    ``every=k`` persists only passes with ``s % k == 0`` (the rest are
    recomputed on resume) — the knob for corpora where a pass's ranges
    are large relative to the fetch link.

    The factorization stage is deliberately NOT checkpointed: its inputs
    are exactly these ranges, it is deterministic given them (fixed
    sketch seed), and it is minutes where counting is the long pole —
    a resume replays it from the last counted pass.  The finished
    embedding itself is the final durable artifact (``out=``), marked
    done via :meth:`mark_done`.
    """

    _DONE = "embedding.json"

    def __init__(self, directory: str, fingerprint: str, every: int = 1):
        self.dir = directory
        self.fp = str(fingerprint)
        self.every = max(1, int(every))
        self._lock = threading.Lock()
        os.makedirs(directory, exist_ok=True)

    def _pass_path(self, s: int) -> str:
        return os.path.join(self.dir, f"counts_pass_{s:05d}.npz")

    def has_pass(self, s: int) -> bool:
        try:
            with np.load(self._pass_path(s)) as z:
                return str(z["fingerprint"]) == self.fp
        except Exception:  # missing, truncated (BadZipFile), foreign file —
            return False   # any unreadable pass simply recounts

    def load_pass(self, s: int, device=None):
        """(cen, ctx, cnt, m) on ``device`` (default placement when None),
        or None when the pass is absent or from a different corpus."""
        import jax

        try:
            with np.load(self._pass_path(s)) as z:
                if str(z["fingerprint"]) != self.fp:
                    return None
                cen, ctx, cnt = z["cen"], z["ctx"], z["cnt"]
                m = int(z["m"])
        except Exception:  # see has_pass — unreadable means recount
            return None
        put = (lambda a: jax.device_put(a, device)) if device is not None \
            else jax.device_put
        return put(cen), put(ctx), put(cnt), m

    def save_pass(self, s: int, r) -> None:
        """Persist one completed pass (thread-safe — the pass-parallel
        driver calls this from per-device threads)."""
        if r is None or s % self.every:
            return
        from ..parallel.state import _fetch_shard

        cen, ctx, cnt, m = r
        payload = {
            "fingerprint": np.asarray(self.fp),
            "m": np.int64(m),
            "cen": _fetch_shard(cen),
            "ctx": _fetch_shard(ctx),
            "cnt": _fetch_shard(cnt),
        }
        path = self._pass_path(s)
        tmp = path + f".tmp{s}.npz"
        with self._lock:  # one writer at a time keeps fetch+IO bounded
            np.savez(tmp, **payload)
            os.replace(tmp, path)

    # ---- finished-embedding marker (the walk pipeline's "done" state)
    def done_result(self, feature_dim: int, fact_params=None):
        """The finished embedding of a completed earlier run (read-only
        memmap), or None.  Validated against the fingerprint, the
        recorded output path, the expected shape, AND the factorization
        parameters (``fact_params``) — the counting fingerprint covers
        only what determines the COUNTS, so a rerun with e.g. a
        different oversample must refactorize (reusing the counted
        passes), not return the stale embedding."""
        import json

        try:
            with open(os.path.join(self.dir, self._DONE)) as f:
                meta = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None
        if meta.get("fingerprint") != self.fp:
            return None
        if json.dumps(fact_params, sort_keys=True, default=str) != \
                json.dumps(meta.get("fact_params"), sort_keys=True,
                           default=str):
            return None
        try:
            mm = np.load(meta["path"], mmap_mode="r")
        except (FileNotFoundError, OSError, ValueError, KeyError):
            return None
        if mm.ndim != 2 or mm.shape[1] != feature_dim or \
                list(mm.shape) != meta.get("shape"):
            return None
        return mm

    def mark_done(self, path: str, shape, fact_params=None) -> None:
        import json

        meta = {
            "fingerprint": self.fp,
            "path": os.path.abspath(path),
            "shape": [int(x) for x in shape],
            "fact_params": fact_params,
        }
        tmp = os.path.join(self.dir, self._DONE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, os.path.join(self.dir, self._DONE))


def _run_pass(batch_iter, s, passes, n, window):
    """One counting pass: reduce every batch, tree-merge, compact.

    ``batch_iter`` yields ``(walks, pad)`` device arrays; when the walks
    are COMMITTED to a device, every sort/merge of the pass runs there —
    the pass-parallel driver relies on that to spread disjoint hash
    partitions across chips.  Returns a compacted ``(cen, ctx, cnt, m)``
    or ``None`` for an empty corpus."""
    merge_fn, compact = _merge_jit(), _compact_jit()
    acc = []  # [(cen, ctx, cnt, m_actual)]
    for walks, pad in batch_iter:
        u = _reduce_batch(walks, pad, s, passes, n, window)
        m = int(u[3])
        acc.append((*compact(*u[:3], mb=_bucket(m)), m))
        del u
    if not acc:
        return None
    while len(acc) > 1:  # pairwise tree merge bounds the concat size
        nxt = []
        for i in range(0, len(acc) - 1, 2):
            a, b_ = acc[i], acc[i + 1]
            u = merge_fn(*a[:3], *b_[:3])
            m = int(u[3])
            nxt.append((*compact(*u[:3], mb=_bucket(m)), m))
            del u
        if len(acc) % 2:
            nxt.append(acc[-1])
        acc = nxt
    return acc[0]


def _pair_counts_batch_parallel(batches_fn, n, window, passes, devices,
                                checkpoint=None, gather_home=True):
    """Multi-device counting as BATCH-parallel single sweeps.

    Pass-parallel counting (design (a), below) pays ``passes/P`` full
    corpus enumerates per device; with the single-sweep reduce one
    enumerate serves every partition, so the right multi-device split is
    by BATCH: the corpus is dealt round-robin across ``devices``, each
    device sweeps its share once (chain-merging its own segments into
    per-partition local accumulators — the sequential sweep's memory
    profile, scaled 1/P), then partition ``s`` finishes on home device
    ``devices[s % P]`` with one P-piece cross-device merge.  Merges are
    order-independent sort-reduces, so the final ranges are bit-identical
    to the sequential (and per-pass) paths.  Returns ``None`` when the
    corpus exceeds the walk-cache budget or has fewer than two batches
    (the sequential sweep is the right tool there).
    """
    import concurrent.futures

    import jax

    import jax.numpy as jnp

    corpus, bytes_ = [], 0
    for item in batches_fn():
        walks = item[0]
        bytes_ += walks.size * walks.dtype.itemsize
        if bytes_ > _WALK_CACHE_BYTES:
            return None
        corpus.append(item)
    if not corpus:
        return []
    ndev = min(len(devices), len(corpus))
    if ndev < 2:
        return None
    devs = list(devices)[:ndev]
    per_dev = [[] for _ in range(ndev)]
    for i, (w, pad) in enumerate(corpus):
        per_dev[i % ndev].append((jax.device_put(w, devs[i % ndev]), pad))
    del corpus
    merge_fn, compact = _merge_jit(), _compact_jit()
    sweep, extract = _sweep_jit(), _extract_jit()
    # warm the dominant program per device BEFORE the threads race into
    # it (single serializing remote-compile slot — same rationale as the
    # pass-parallel warm loop)
    for di in range(ndev):
        w0, pad0 = per_dev[di][0]
        u = sweep(w0, jnp.int32(w0.shape[0] - pad0), jnp.int32(n),
                  window=window, passes=passes)
        np.asarray(u[3])
        del u
    local = [[None] * passes for _ in range(ndev)]

    def sweep_share(di):
        for walks, pad in per_dev[di]:
            u = sweep(walks, jnp.int32(walks.shape[0] - pad), jnp.int32(n),
                      window=window, passes=passes)
            m_per = np.asarray(u[3])
            starts = np.concatenate(
                ([0], np.cumsum(m_per[:-1], dtype=np.int64)))
            for s in range(passes):
                m_s = int(m_per[s])
                r_s = (*extract(u[0], u[1], u[2], jnp.int32(starts[s]),
                                jnp.int32(m_s), mb=_bucket(m_s)), m_s)
                a = local[di][s]
                if a is None:
                    local[di][s] = r_s
                else:
                    v = merge_fn(*a[:3], *r_s[:3])
                    m = int(v[3])
                    local[di][s] = (*compact(*v[:3], mb=_bucket(m)), m)
                    del v
            del u

    with concurrent.futures.ThreadPoolExecutor(max_workers=ndev) as pool:
        for f in [pool.submit(sweep_share, di) for di in range(ndev)]:
            f.result()

    results = [None] * passes

    def finish(di):
        home = devs[di]
        for s in range(di, passes, ndev):
            if checkpoint is not None:
                r = checkpoint.load_pass(s, home)
                if r is not None:
                    results[s] = r
                    continue
            acc = None
            for dj in range(ndev):  # deterministic device order
                piece = local[dj][s]
                if piece is None:
                    continue
                piece = (*(jax.device_put(a, home) for a in piece[:3]),
                         piece[3])
                if acc is None:
                    acc = piece
                else:
                    v = merge_fn(*acc[:3], *piece[:3])
                    m = int(v[3])
                    acc = (*compact(*v[:3], mb=_bucket(m)), m)
                    del v
            results[s] = acc
            if checkpoint is not None and acc is not None:
                checkpoint.save_pass(s, acc)

    with concurrent.futures.ThreadPoolExecutor(max_workers=ndev) as pool:
        for f in [pool.submit(finish, di) for di in range(ndev)]:
            f.result()
    if not gather_home:
        return [r for r in results if r is not None]
    home = devs[0]
    return [
        (*(jax.device_put(a, home) for a in r[:3]), r[3])
        for r in results if r is not None
    ]


def _pair_counts_pass_parallel(batches_fn, n, window, passes, devices,
                               checkpoint=None, gather_home=True):
    """Counting passes fanned out over ``devices`` (ROADMAP design (a)).

    The hash partitions are disjoint and the per-pass walks identical, so
    pass ``s`` runs WHOLE on ``devices[s % P]`` with no collectives: the
    corpus is materialized once (it must fit the walk-cache budget — the
    sorts, not the walks, gate a pass), broadcast to each counting device,
    and one host thread per device drives its passes so each thread's
    blocking unique-count fetches overlap every other device's sorts.
    With ``gather_home`` finished ranges land back on ``devices[0]`` for
    the single-device factorization; ``gather_home=False`` leaves each
    on its counting device for the mesh-sharded factorization
    (parallel/cooccur.py).  Returns ``None`` when the corpus exceeds the
    cache budget (caller falls back to the sequential regenerating path).
    """
    import concurrent.futures

    import jax

    import jax.numpy as jnp

    corpus, bytes_ = [], 0
    for item in batches_fn():
        walks = item[0]
        bytes_ += walks.size * walks.dtype.itemsize
        if bytes_ > _WALK_CACHE_BYTES:
            return None
        corpus.append(item)
    if not corpus:
        return []
    _reduce_jit(), _merge_jit(), _compact_jit()  # populate before threads
    ndev = min(len(devices), passes)
    devs = list(devices)[:ndev]
    per_dev = [[(jax.device_put(w, d), pad) for w, pad in corpus]
               for d in devs]
    del corpus
    # Warm the reduce executable per device BEFORE the threads race into
    # it: jit caches key on the input device assignment, so P concurrent
    # cold calls would push P simultaneous compiles through the (single,
    # serializing) remote-compile slot.  One blocking reduce of the first
    # batch per device compiles the dominant program sequentially; the
    # partition argument is dynamic, so every pass on that device reuses
    # it.  (Merge/compact shapes evolve with the bucket schedule and stay
    # lazily compiled — the persistent compile cache covers them across
    # runs.)
    for di in range(ndev):
        w0, pad0 = per_dev[di][0]
        # _reduce_batch compiles whichever reduce variant _run_pass will
        # actually dispatch (full-sort, or the compacted fast path when
        # CLEORA_COOC_COMPACT engages) and its int() fetch blocks
        jnp.asarray(_reduce_batch(w0, pad0, 0, passes, n, window)[0]
                    ).block_until_ready()
    results = [None] * passes

    def drive(di):
        for s in range(di, passes, ndev):
            r = checkpoint.load_pass(s, devs[di]) if checkpoint else None
            if r is None:
                r = _run_pass(per_dev[di], s, passes, n, window)
                if checkpoint is not None:
                    checkpoint.save_pass(s, r)
            results[s] = r

    with concurrent.futures.ThreadPoolExecutor(max_workers=ndev) as pool:
        for f in [pool.submit(drive, di) for di in range(ndev)]:
            f.result()  # re-raise worker exceptions
    if not gather_home:
        # leave each partition on its counting device — the mesh-sharded
        # factorization (parallel/cooccur.py) consumes them in place
        return [r for r in results if r is not None]
    home = devs[0]
    return [
        (*(jax.device_put(a, home) for a in r[:3]), r[3])
        for r in results if r is not None
    ]


def device_pair_counts(batches_fn, n: int, window: int, passes: int = 1,
                       devices=None, checkpoint=None,
                       gather_home: bool = True):
    """Reduce device walk batches to device-resident unique
    (center, context, count) ranges.

    ``batches_fn()`` returns a FRESH iterable yielding ``(walks, pad)``
    with ``walks`` a device (B, L) int32 array (sentinel == n for dead
    ends) and ``pad`` the number of trailing padding lanes to ignore; the
    walk engines are deterministic per seed, so re-iterating regenerates
    identical walks.  ``passes`` hash-partitions the counting by center id
    (``cen % passes``), one full sweep per partition: the unique set of a
    400M+-pair corpus does not fit a single sort-merge working set in one
    chip's HBM, but each partition's does, and regenerating walks is cheap
    next to the sorts (hash, not range, so power-law hubs spread evenly).

    ``devices`` (multiple jax devices) runs the passes in PARALLEL, one
    whole partition per device at a time (no cross-device collectives —
    see :func:`_pair_counts_pass_parallel`); counts are bit-identical to
    the sequential path.  Corpora past the walk-cache budget fall back to
    sequential single-device counting over regenerated walks.

    ``checkpoint`` (a :class:`CountCheckpoint`) persists each completed
    pass and resumes from the completed set: with every pass already on
    disk, the walk corpus is never generated at all; otherwise only the
    missing partitions are counted (the cross-pass walk cache fills on
    the first pass actually computed).  Loaded ranges are identical to
    computed ones — integer count arrays round-trip exactly.

    Returns ``(ranges, m_total)`` where ``ranges`` is a list of
    ``(cen, ctx, cnt, m)`` — compacted device arrays whose first ``m``
    slots are real unique pairs sorted by (center, context); tails are
    sentinel/zero slots the downstream kernels mask.  Ranges are
    row-disjoint by construction (each center id lives in exactly one),
    which is what the multi-range SpMM layout consumes.  Only scalar
    counts cross to the host.
    """
    from .._util import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # sorts/merges cost minutes to compile
    passes = max(1, int(passes))
    if checkpoint is not None and \
            all(checkpoint.has_pass(s) for s in range(passes)):
        # every partition is durable — skip walk generation entirely.
        # gather_home=False restores the pass-parallel device placement
        # (pass s on device s % P) so the sharded factorization resumes
        # with the same distribution a live counting run would leave.
        devs = None
        if not gather_home and devices is not None and len(devices) > 1:
            devs = list(devices)[:min(len(devices), passes)]
        ranges = [
            checkpoint.load_pass(s, devs[s % len(devs)] if devs else None)
            for s in range(passes)
        ]
        if all(r is not None for r in ranges):
            _check_count_overflow(ranges, n)
            return ranges, sum(r[3] for r in ranges)
    if devices is not None and len(devices) > 1 and passes > 1:
        if _sweep_ok(n, passes):
            # batch-parallel sweeps replace pass-parallel whenever the
            # sweep reduce is available: 1/P enumerates per device vs
            # passes/P.  None (cache overflow / single-batch corpus)
            # falls through to the sequential sweep below.
            ranges = _pair_counts_batch_parallel(
                batches_fn, n, window, passes, devices,
                checkpoint=checkpoint, gather_home=gather_home)
        else:
            ranges = _pair_counts_pass_parallel(
                batches_fn, n, window, passes, devices,
                checkpoint=checkpoint, gather_home=gather_home)
        if ranges is not None:
            _check_count_overflow(ranges, n)
            return ranges, sum(r[3] for r in ranges)

    # The PAIRS don't fit one pass's working set, but the WALKS usually
    # fit HBM outright (1M len-80 walks = 320 MB) — cache the device walk
    # batches during pass 0 and replay them, instead of regenerating per
    # pass.  Regeneration is ~free for the first-order engine but costs
    # minutes per pass for the rejection-sampled second-order walker
    # (measured: 768 s of a 903 s Node2Vec e2e was walk regeneration).
    # Corpora past the cache budget fall back to regeneration.
    cache: list = []
    todo = sum(
        1 for s in range(passes)
        if checkpoint is None or not checkpoint.has_pass(s)
    )
    if todo == passes and _sweep_ok(n, passes):
        # every partition is outstanding: one single-sweep pass computes
        # them all (one enumerate+sort per batch instead of per pass —
        # measured on-chip, scripts/compact_ab_probe.py) and the walk
        # cache is moot (the corpus is iterated exactly once)
        res = _run_sweep(batches_fn, passes, n, window)
        ranges = [] if res is None else res
        if checkpoint is not None:
            for s, r in enumerate(ranges):
                checkpoint.save_pass(s, r)
        _check_count_overflow(ranges, n)
        return ranges, sum(r[3] for r in ranges)
    cache_state = {"ok": todo > 1, "bytes": 0, "filled": False}

    def pass_batches():
        if cache_state["filled"]:
            yield from cache
            return
        fill = cache_state["ok"]  # first COMPUTED pass populates the cache
        for item in batches_fn():
            if fill:
                walks = item[0]
                cache_state["bytes"] += walks.size * walks.dtype.itemsize
                if cache_state["bytes"] > _WALK_CACHE_BYTES:
                    cache.clear()
                    cache_state["ok"] = False
                    fill = False
                else:
                    cache.append(item)
            yield item
        if fill:
            cache_state["filled"] = True

    # saves overlap the NEXT pass's device sorts: the ~GB-scale fetch of
    # a finished pass is host/tunnel work the device doesn't wait on —
    # one background writer keeps saves ordered (and the checkpoint's own
    # lock makes it safe either way); failures re-raise at the join
    import concurrent.futures

    saver = (concurrent.futures.ThreadPoolExecutor(max_workers=1)
             if checkpoint is not None else None)
    pending = []
    try:
        ranges = []
        for s in range(passes):
            r = checkpoint.load_pass(s) if checkpoint is not None else None
            if r is None:
                r = _run_pass(pass_batches(), s, passes, n, window)
                if checkpoint is not None:
                    pending.append(saver.submit(checkpoint.save_pass, s, r))
            if r is not None:
                ranges.append(r)
        for f in pending:
            f.result()
    finally:
        if saver is not None:
            saver.shutdown(wait=True)
    _check_count_overflow(ranges, n)
    return ranges, sum(r[3] for r in ranges)


def _check_count_overflow(ranges, n: int) -> None:
    """Counts are int32 on device (the host twin counts in int64); a
    single pair exceeding 2^31 co-occurrences wraps NEGATIVE.  One scalar
    probe per range catches that FIRST wrap before it silently corrupts
    the PMI.  (A count wrapping past 2^32 lands positive again and is
    undetectable here — that needs a pair >20× over a whole pass's
    budget concentrated on one key; the host path is the refuge for such
    corpora either way.)"""
    import jax

    import jax.numpy as jnp

    if "cntmin" not in _JITS:
        _JITS["cntmin"] = jax.jit(
            lambda cen, cnt, n_: jnp.min(jnp.where(cen < n_, cnt, 1)))
    for cen, _, cnt, _ in ranges:
        if int(_JITS["cntmin"](cen, cnt, jnp.int32(n))) < 0:
            raise ValueError(
                "co-occurrence count overflow: one (center, context) pair "
                "exceeds 2^31 occurrences — use cooccurrence='host' "
                "(int64 counts) for this corpus"
            )


def _colsum_impl(cen, ctx, cnt, col_acc):
    """Accumulate one range's column sums into the global (n,) vector.

    Column sums span every range (contexts are unpartitioned), so they are
    reduced across ranges before any PMI value can be computed; the
    accumulator is donated — same shape in and out, so XLA aliases it."""
    import jax.numpy as jnp

    valid = cen < col_acc.shape[0]
    w = jnp.where(valid, cnt, 0).astype(jnp.float32)
    return col_acc.at[jnp.where(valid, ctx, 0)].add(w), jnp.sum(w)


def _ppmi_range_impl(cen, ctx, cnt, col_sums, total, *, n):
    """One range's counts → positive-PMI values, shaped for spmm_inner's
    flat path.  Row sums are range-local (each center id lives in exactly
    one range); column sums and the pair total are global inputs.

    Invalid/padding slots become (row n-1, col 0, val 0): harmless to the
    segment-sum and keeping rows nondecreasing (valid prefix is sorted,
    n-1 ≥ any valid row id), as the sorted-COO contract requires.
    """
    import jax.numpy as jnp

    valid = cen < n
    w = jnp.where(valid, cnt, 0).astype(jnp.float32)
    # invalid tail slots map to n-1 (not 0) so the index stream stays
    # genuinely nondecreasing — the sorted-scatter hint is an XLA
    # contract, not a suggestion; the tail's weight is 0 either way
    idx_r = jnp.where(valid, cen, n - 1)
    idx_c = jnp.where(valid, ctx, 0)
    row_sums = jnp.zeros(n, jnp.float32).at[idx_r].add(
        w, indices_are_sorted=True)
    denom = jnp.maximum(row_sums[idx_r], 1e-10) * \
        jnp.maximum(col_sums[idx_c], 1e-10)
    pmi = jnp.log(jnp.maximum(w * total / denom, 1e-15))
    val = jnp.where(valid, jnp.maximum(pmi, 0.0), 0.0).astype(jnp.float32)
    rows = jnp.where(valid, cen, n - 1)
    cols = jnp.where(valid, ctx, 0)
    return rows, cols, val


def _ppmi_jits():
    import jax

    if "colsum" not in _JITS:
        _JITS["colsum"] = jax.jit(_colsum_impl, donate_argnums=(3,))
        _JITS["ppmi_range"] = jax.jit(_ppmi_range_impl,
                                      static_argnames=("n",))
    return _JITS


def range_col_sums(ranges, n: int):
    """(col_sums (n,) f32 device array, total f32 scalar) over ``ranges``
    — the cross-range reduction phase of the PPMI transform, separated so
    the mesh-sharded factorization can reduce per-device partials
    globally before transforming (contexts span every range)."""
    import jax.numpy as jnp

    jits = _ppmi_jits()
    col_sums = jnp.zeros(n, jnp.float32)
    total = jnp.float32(0.0)
    for cen, ctx, cnt, _ in ranges:
        col_sums, t = jits["colsum"](cen, ctx, cnt, col_sums)
        total = total + t
    return col_sums, total


def ppmi_transform(ranges, n: int, col_sums, total):
    """Count ranges → positive-PMI COO triples, given ALREADY-REDUCED
    global column sums + pair total (see :func:`range_col_sums`).  Row
    sums are range-local by construction (ranges are center-disjoint)."""
    jits = _ppmi_jits()
    # consume the caller's list destructively: each range's count buffers
    # free as soon as its value triple exists, halving the transient HBM
    # peak (a tuple input is copied and the caller keeps its refs alive)
    out = []
    if isinstance(ranges, tuple):
        ranges = list(ranges)
    while ranges:
        cen, ctx, cnt, _ = ranges.pop(0)
        out.append(jits["ppmi_range"](cen, ctx, cnt, col_sums, total, n=n))
        del cen, ctx, cnt
    return tuple(out)


def ppmi_ranges(ranges, n: int):
    """[(rows, cols, vals), ...] positive-PMI COO, one triple per range.

    The triples are row-disjoint; chunk-aligned and concatenated they
    form the flat sorted COO the unfused randomized SVD consumes
    (algorithms._device_counts_to_embeddings / _rsvd_step_jits).
    """
    col_sums, total = range_col_sums(ranges, n)
    return ppmi_transform(ranges, n, col_sums, total)


def ppmi_coo(cen, ctx, cnt, n: int):
    """Single-range convenience wrapper around :func:`ppmi_ranges`."""
    return ppmi_ranges([(cen, ctx, cnt, None)], n)[0]


def pair_total(ranges, n: int) -> int:
    """Total counted pairs across ranges — summed ON DEVICE, one scalar
    fetch per range (fetching a 450M-slot count array through a tunneled
    runtime is exactly the multi-GB transfer this module exists to
    avoid)."""
    import jax

    import jax.numpy as jnp

    if "pairsum" not in _JITS:
        # f32 accumulation: never wraps (an int32 sum would past 2^31 if
        # a hash partition lands far over the per-pass budget), at worst
        # ~1e-7 relative error on this informational statistic; the
        # CROSS-range sum accumulates in a Python int
        _JITS["pairsum"] = jax.jit(
            lambda cen, cnt, n_: jnp.sum(
                jnp.where(cen < n_, cnt, 0).astype(jnp.float32)))
    return sum(
        int(round(float(_JITS["pairsum"](cen, cnt, jnp.int32(n)))))
        for cen, _, cnt, _ in ranges
    )
