"""Multi-chip embedding loop: shard_map over a 1D device mesh.

Reference analog: the row-parallel rayon SpMM + per-call thread pools
(/root/reference/src/embedding.rs:14-136) scaled across chips; the
reference itself is single-node only (SURVEY.md §2c).

Per-iteration schedule on each device (SURVEY.md §2c):
1. ``all_gather`` the row shards of X over ICI → full (N, D) gather table;
2. local gather · scale · segment-sum over the shard's own edges (output rows
   are shard-local by construction — see parallel/shard.py);
3. local residual mix + row normalize;
4. whitening with GLOBAL statistics: masked mean and D×D covariance reduced
   with ``psum``; the tiny eigh is computed replicated on every device.

Everything — all 40 iterations — runs inside one jitted shard_map, so an
entire embed is a single XLA program with fused compute and collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import SHARD_AXIS, make_mesh
from .shard import (
    BandedShards,
    HaloPlan,
    ShardedCoo,
    band_shards,
    pad_rows,
    plan_halo,
    shard_graph,
)


def _overlap_propagate(x_local, send_idx, groups, rows_per_shard, axis):
    """Pipelined halo exchange: P-1 ppermute rounds, each round's received
    boundary slab accumulated while the next transfer is in flight (see
    shard.OverlapPlan).  Returns the f32 local SpMM result."""
    n_rounds = len(groups)
    me = lax.axis_index(axis)

    def seg(table, lr, sc, sv):
        g = jnp.take(table, sc, axis=0).astype(jnp.float32)
        return jax.ops.segment_sum(
            g * sv[:, None], lr, num_segments=rows_per_shard,
            indices_are_sorted=True,
        )

    def slab_for(r):
        idx = jnp.take(send_idx, (me + r) % n_rounds, axis=0)  # (M,)
        send = jnp.take(x_local, idx, axis=0)  # (M, D) in state dtype
        perm = [(d, (d + r) % n_rounds) for d in range(n_rounds)]
        return lax.ppermute(send, axis, perm)

    # round 0 (local rows) computes while round 1's slab is in flight
    nxt = slab_for(1) if n_rounds > 1 else None
    lr0, sc0, sv0 = groups[0]
    acc = seg(x_local, lr0, sc0, sv0)
    for r in range(1, n_rounds):
        cur = nxt
        if r + 1 < n_rounds:
            nxt = slab_for(r + 1)
        lr, sc, sv = groups[r]
        acc = acc + seg(cur, lr, sc, sv)
    return acc


def _ell_propagate(table, ell, n_zero, n_hub, acc_dtype):
    """Local SpMM in the sharded sliced-ELL layout (parallel/ell.py): per
    degree bucket, gather rows of ``table`` → scale → sum over the static
    width axis — XLA fuses each bucket into one kernel with no HBM edge
    intermediate, same as the single-chip production path (ops/spmm_ell.py).
    """
    from ..ops.spmm_ell import _bucket_out

    parts = []
    if n_zero:
        parts.append(jnp.zeros((n_zero, table.shape[1]), acc_dtype))
    for cols_b, vals_b in ell["buckets"]:
        parts.append(_bucket_out(table, cols_b, vals_b, acc_dtype))
    if ell["hub"] is not None:
        hc, hv, seg = ell["hub"]
        raw = _bucket_out(table, hc, hv, acc_dtype)
        parts.append(jax.ops.segment_sum(
            raw, seg, num_segments=n_hub, indices_are_sorted=True
        ))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _hier_exchange(x_local, send_intra, send_cross, host_axis, chip_axis):
    """Two-phase hierarchical boundary-row exchange (shard.HierHaloPlan):
    chip-axis all_to_all of intra-host slabs (ICI), host-axis all_to_all
    of the per-destination-host UNION slabs (each row crosses DCN once),
    then a chip-axis all_gather fans the cross slabs out within the host.
    Returns the gather table in the plan's receive layout."""
    d = x_local.shape[1]
    si = jnp.take(x_local, send_intra, axis=0)  # (C, Mc, D)
    ri = lax.all_to_all(si, chip_axis, split_axis=0, concat_axis=0)
    sc = jnp.take(x_local, send_cross, axis=0)  # (H, Mh, D)
    rc = lax.all_to_all(sc, host_axis, split_axis=0, concat_axis=0)
    rcg = lax.all_gather(rc, chip_axis, axis=0, tiled=False)  # (C, H, Mh, D)
    return jnp.concatenate([ri.reshape(-1, d), rcg.reshape(-1, d)], axis=0)


def _propagate_local(
    x_local, lrows, cols, vals, *, rows_per_shard, axis, send_idx=None,
    overlap=None, ell=None, ell_static=None, hier_send=None,
):
    """Boundary-row exchange + local SpMM from inside shard_map — the
    shared propagate core of the embed loop and the sharded sibling
    algorithms (parallel/algorithms.py).  Returns the float32 result in
    the same state space (row block or per-shard ELL) as ``x_local``."""
    if overlap is not None:
        # 1c+2. pipelined boundary exchange fused with the local SpMM
        y = _overlap_propagate(x_local, send_idx, overlap, rows_per_shard,
                               axis)
        return y.astype(jnp.float32)
    if hier_send is not None:
        # 1d. explicit two-phase hierarchical exchange on a (host, chip)
        # mesh — axis is the ("host", "chip") tuple here
        x_full = _hier_exchange(x_local, hier_send[0], hier_send[1],
                                axis[0], axis[1])
    elif send_idx is None:
        # 1a. baseline: assemble the full gather table via all_gather
        x_full = lax.all_gather(x_local, axis, tiled=True)  # (N_padded, D)
    else:
        # 1b. halo exchange: ship only the boundary rows each peer needs.
        # send_idx (P, M): my local rows destined for each peer; one
        # all_to_all swaps (P, M, D) send slabs into (P, M, D) receive
        # slabs, and ``cols`` are pre-remapped into that buffer layout.
        send = jnp.take(x_local, send_idx, axis=0)  # (P, M, D)
        recv = lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
        x_full = recv.reshape(-1, x_local.shape[1])  # (P·M, D)

    if ell is not None:
        # 2-ELL. production layout: dense fixed-width gather+reduce
        n_zero, n_hub = ell_static
        if ell["remote"] is not None:
            # split mode: the bucketed (local-owner) edges read the
            # shard's OWN state, so this compute has no dependency on
            # the all_to_all above — XLA overlaps the boundary-row
            # exchange with the bulk local SpMM (SURVEY §2c).  The
            # remote remainder joins via one sorted segment-sum over
            # the received slab.
            y = _ell_propagate(x_local, ell, n_zero, n_hub, jnp.float32)
            rc, rv, rp = ell["remote"]
            g = (jnp.take(x_full, rc, axis=0).astype(jnp.float32)
                 * rv[:, None].astype(jnp.float32))
            y = y + jax.ops.segment_sum(
                g, rp, num_segments=y.shape[0], indices_are_sorted=True
            )
        else:
            y = _ell_propagate(x_full, ell, n_zero, n_hub, jnp.float32)
    else:
        # 2. local SpMM: every edge's output row is local.  Reuses
        # spmm_inner so the (nnz_local, D) gather intermediate is
        # chunk-bounded at production scale and bf16 tables promote to
        # f32 accumulation, same as single-chip.
        from ..ops.spmm import spmm_inner

        y = spmm_inner(lrows, cols, vals, x_full, rows_per_shard)
    return y.astype(jnp.float32)


def _local_step(
    x_local, lrows, cols, vals, *, rows_per_shard, n_rows, residual_weight,
    normalization, do_whiten, axis, send_idx=None, overlap=None, ell=None,
    ell_static=None, hier_send=None,
):
    """One propagate→normalize→whiten step from inside shard_map.

    bf16 state is supported like the single-device loop: the exchange ships
    the stored dtype (halving ICI/DCN bytes too); compute is float32 and the
    result is cast back at the end.
    """
    state_dtype = x_local.dtype
    y = _propagate_local(
        x_local, lrows, cols, vals, rows_per_shard=rows_per_shard,
        axis=axis, send_idx=send_idx, overlap=overlap, ell=ell,
        ell_static=ell_static, hier_send=hier_send,
    )

    # 3. residual + row normalization (purely local); weight pre-clamped by
    # embed_sharded via ops.loop.effective_residual_weight
    if residual_weight > 0.0:
        y = (1.0 - residual_weight) * y + residual_weight * x_local.astype(y.dtype)

    if ell is not None:
        # ELL space: real-row positions are a static per-shard mask
        valid = ell["valid"].astype(y.dtype)[:, None]
    else:
        my_id = lax.axis_index(axis)
        global_row = my_id * rows_per_shard + jnp.arange(rows_per_shard)
        valid = (global_row < n_rows).astype(y.dtype)[:, None]

    if normalization == "l2":
        norms = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
        y = y / jnp.maximum(norms, 1e-10)
    elif normalization == "l1":
        norms = jnp.sum(jnp.abs(y), axis=-1, keepdims=True)
        y = y / jnp.maximum(norms, 1e-10)
    elif normalization == "spectral":
        norms = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
        yn = y / jnp.maximum(norms, 1e-10)
        yn = yn * valid
        g = lax.psum(jnp.dot(yn.T, yn, preferred_element_type=jnp.float32), axis)
        s2, v = jnp.linalg.eigh(g)
        s2 = s2[::-1]
        v = v[:, ::-1]
        # yn = u s v^T  ⇒  u s = yn v
        y = jnp.dot(yn, v, preferred_element_type=jnp.float32)
    elif normalization != "none":
        raise ValueError(f"Unknown normalization method: {normalization}")

    # 4. whitening with global psum statistics
    if do_whiten and n_rows > 1:  # n<=1: ops/whiten.py returns x unchanged
        ym = y * valid
        mean = lax.psum(jnp.sum(ym, axis=0), axis) / n_rows
        yc = (y - mean) * valid
        cov = lax.psum(jnp.dot(yc.T, yc, preferred_element_type=jnp.float32), axis)
        cov = cov / (n_rows - 1)
        w, v = jnp.linalg.eigh(cov)
        w = w[::-1]
        v = v[:, ::-1]
        scale = 1.0 / jnp.sqrt(jnp.maximum(w, 1e-10))
        y = jnp.dot(yc, v * scale, preferred_element_type=jnp.float32)
    return y.astype(state_dtype)


def _shard_loop_fn(
    x_local, layout, send_idx=None, overlap=None, hier_send=None,
    start_iter=None, *,
    rows_per_shard, n_rows, num_iterations, residual_weight, normalization,
    do_whiten, convergence_threshold, ell_static=None, axis,
    return_meta=False,
):
    if send_idx is not None:
        send_idx = send_idx.reshape(send_idx.shape[-2:])  # drop shard dim
    if overlap is not None:  # drop the shard dim of each round's group
        overlap = tuple(
            tuple(a.reshape(a.shape[-1]) for a in g) for g in overlap
        )
    if hier_send is not None:  # drop shard dims: (1,C,Mc)/(1,H,Mh)
        hier_send = tuple(a.reshape(a.shape[-2:]) for a in hier_send)
    lrows = cols = vals = ell = None
    if isinstance(layout, dict):  # sharded sliced-ELL (parallel/ell.py)
        ell = jax.tree_util.tree_map(
            lambda a: a.reshape(a.shape[1:]), layout
        )
    else:
        lrows, cols, vals = layout
        if lrows.ndim == 3:  # banded layout: (1, n_bands, max_e) block
            lrows = lrows.reshape(lrows.shape[-2:])
            cols = cols.reshape(cols.shape[-2:])
            vals = vals.reshape(vals.shape[-2:])
    step = functools.partial(
        _local_step,
        lrows=lrows, cols=cols, vals=vals,
        rows_per_shard=rows_per_shard, n_rows=n_rows,
        residual_weight=residual_weight, normalization=normalization,
        do_whiten=do_whiten, axis=axis, send_idx=send_idx, overlap=overlap,
        ell=ell, ell_static=ell_static, hier_send=hier_send,
    )
    if convergence_threshold <= 0:
        return lax.fori_loop(0, num_iterations, lambda _, x: step(x), x_local)

    nd = n_rows * x_local.shape[1]
    # global iteration offset: checkpointed runs execute the loop in
    # segments but the RMSE check's "skip iteration 0" condition must be
    # evaluated against the GLOBAL iteration index for segment boundaries
    # to be invisible (VERDICT r3 #4)
    si = jnp.int32(0) if start_iter is None else start_iter.astype(jnp.int32)

    def cond(state):
        i, _, done = state
        return jnp.logical_and(i < num_iterations, jnp.logical_not(done))

    def body(state):
        i, x, _ = state
        y = step(x)
        diff = y - x
        rmse = jnp.sqrt(lax.psum(jnp.sum(diff * diff), axis) / nd)
        return (i + 1, y,
                jnp.logical_and(si + i > 0, rmse < convergence_threshold))

    i, x, done = lax.while_loop(
        cond, body, (jnp.int32(0), x_local, jnp.bool_(False))
    )
    if return_meta:
        # i / done derive from psum'd (replicated) scalars; pmax makes the
        # replication explicit for shard_map's output check
        return x, lax.pmax(i, axis), lax.pmax(done, axis)
    return x


def build_sharded_embed(
    mesh,
    sharded: ShardedCoo,
    feature_dim: int,
    num_iterations: int,
    residual_weight: float = 0.0,
    normalization: str = "l2",
    do_whiten: bool = False,
    convergence_threshold: float = 0.0,
    halo: Optional["HaloPlan"] = None,
    banded: Optional["BandedShards"] = None,
    overlap=None,
    ell=None,
    hier=None,
    return_meta: bool = False,
):
    """Compile the full multi-device embed loop for a given sharded graph.

    Returns (fn, place) where fn(*place(x_padded)) -> x_out and ``place``
    device_puts host arrays with the right NamedShardings.  With a
    ``halo`` plan, each iteration exchanges only boundary rows via
    all_to_all instead of all-gathering the full table.  With a ``banded``
    layout (build it over ``halo.remapped_cols`` when both are used), the
    local SpMM runs accumulator-free per row band.  With an ``ell`` layout
    (ell.ell_shards — the production choice; build it with ``halo=plan``
    when both are used), each device runs the sliced-ELL SpMM and the
    state lives in per-shard ELL space: ``place`` permutes it in, and the
    loop's output must be mapped back via ``ell.unpermute_state``.  With an
    ``overlap`` plan (shard.plan_overlap), the boundary exchange is
    decomposed into ppermute rounds pipelined against the per-owner-group
    local accumulation (halo/banded/ell are ignored in that mode).

    With a ``hier`` plan (shard.plan_halo_hier, requires a ("host",
    "chip") mesh), the boundary exchange runs as the explicit two-phase
    hierarchical scheme — chip-axis all_to_all (ICI), host-axis
    all_to_all of per-host union slabs (each row crosses DCN once), and a
    chip-axis fan-out all_gather; halo/banded/ell/overlap are ignored.

    ``return_meta=True`` (requires ``convergence_threshold > 0``) makes fn
    take one extra trailing int32 scalar (the GLOBAL iteration offset) and
    return ``(x_out, iters_run, converged)`` — the checkpointed driver
    runs the loop in segments with per-iteration convergence semantics
    identical to the monolithic program.
    """
    if hier is not None:
        halo = None
        banded = None
        ell = None
        overlap = None
    if overlap is not None:
        halo = None
        banded = None
        ell = None
    if ell is not None:
        banded = None
    from .mesh import shard_axes

    axis = shard_axes(mesh)  # ("host","chip") on hierarchical meshes
    row_spec = P(axis, None)

    if return_meta and convergence_threshold <= 0:
        raise ValueError("return_meta requires convergence_threshold > 0")
    if hier is not None and not isinstance(axis, tuple):
        raise ValueError(
            'hier exchange needs a ("host", "chip") mesh — build it with '
            "make_hier_mesh"
        )
    inner = functools.partial(
        _shard_loop_fn,
        rows_per_shard=sharded.rows_per_shard,
        n_rows=sharded.n_rows,
        num_iterations=num_iterations,
        residual_weight=residual_weight,
        normalization=normalization,
        do_whiten=do_whiten,
        convergence_threshold=convergence_threshold,
        ell_static=(ell.n_zero, ell.n_hub) if ell is not None else None,
        axis=axis,
        return_meta=return_meta,
    )
    # bind the optional trailing operands by the modes that ship them
    _has_send = halo is not None or overlap is not None

    def fn(x_local, layout, *rest):
        rest = list(rest)
        kw = {}
        if _has_send:
            kw["send_idx"] = rest.pop(0)
        if overlap is not None:
            kw["overlap"] = rest.pop(0)
        if hier is not None:
            kw["hier_send"] = rest.pop(0)
        if return_meta:
            kw["start_iter"] = rest.pop(0)
        return inner(x_local, layout, **kw)
    if ell is not None:
        layout_arrays = ell.arrays()
        layout_specs = jax.tree_util.tree_map(
            lambda a: P(axis, *((None,) * (a.ndim - 1))), layout_arrays
        )
    elif banded is not None:
        layout_arrays = (banded.local_rows, banded.cols, banded.vals)
        layout_specs = (P(axis, None, None),) * 3
    elif overlap is not None:
        # the overlap step reads only overlap.groups — ship 1-element
        # placeholders instead of the dead (P, E) flat COO arrays
        n_sh = sharded.local_rows.shape[0]
        layout_arrays = (
            np.zeros(n_sh, np.int32), np.zeros(n_sh, np.int32),
            np.zeros(n_sh, np.float32),
        )
        layout_specs = (P(axis),) * 3
    else:
        cols = (hier.remapped_cols if hier is not None
                else halo.remapped_cols if halo is not None
                else sharded.cols)
        layout_arrays = (
            sharded.local_rows.reshape(-1),
            cols.reshape(-1),
            sharded.vals.reshape(-1),
        )
        layout_specs = (P(axis),) * 3
    in_specs = [row_spec, layout_specs]
    if halo is not None or overlap is not None:
        in_specs.append(P(axis, None, None))  # send_idx
    if overlap is not None:
        in_specs.append(tuple(
            (P(axis, None),) * 3 for _ in overlap.groups
        ))
    if hier is not None:
        in_specs.append((P(axis, None, None), P(axis, None, None)))
    if return_meta:
        in_specs.append(P())  # start_iter scalar, replicated
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(row_spec, P(), P()) if return_meta else row_spec,
    )
    jitted = jax.jit(mapped)

    n_shards_total = int(mesh.devices.size)

    def _put(a, spec):
        """Multi-process-safe placement (shard.put_global): process-local
        slicing of leading-sharded dims, since a piece host's unowned
        shards are padding and device_put's cross-process equality check
        would reject them."""
        from .shard import put_global

        return put_global(mesh, a, spec, n_shards_total)

    def place(x_padded):
        if x_padded.shape[1] != feature_dim:
            raise ValueError(
                f"x_padded has feature dim {x_padded.shape[1]} but the loop "
                f"was built for feature_dim={feature_dim}"
            )
        if isinstance(x_padded, jax.Array):
            # already-placed state-space device array (device-side init or
            # a checkpoint resume) — no host permute/copy
            xs = x_padded
        else:
            if ell is not None:
                x_padded = ell.permute_state(np.asarray(x_padded))
            xs = _put(x_padded, row_spec)
        # paired walk (PartitionSpec is a tuple subclass — tree_map over the
        # spec tree would descend into it, so flatten against the array tree)
        arr_leaves, treedef = jax.tree_util.tree_flatten(layout_arrays)
        spec_leaves = treedef.flatten_up_to(layout_specs)
        placed_layout = treedef.unflatten([
            _put(a, s) for a, s in zip(arr_leaves, spec_leaves)
        ])
        out = [xs, placed_layout]
        if halo is not None or overlap is not None:
            if overlap is not None:
                send = overlap.send_idx
            elif ell is not None:
                send = ell.send_idx  # halo rows fetched from ELL-space state
            else:
                send = halo.send_idx
            out.append(_put(send, P(axis, None, None)))
        if overlap is not None:
            out.append(tuple(
                tuple(_put(a, P(axis, None)) for a in g)
                for g in overlap.groups
            ))
        if hier is not None:
            out.append((
                _put(hier.send_intra, P(axis, None, None)),
                _put(hier.send_cross, P(axis, None, None)),
            ))
        return tuple(out)

    return jitted, place


def embed_sharded(
    graph,
    feature_dim: int = 256,
    num_iterations: int = 40,
    propagation: str = "left",
    normalization: str = "l2",
    seed: int = 0,
    whiten: bool = True,
    residual_weight: float = 0.0,
    convergence_threshold: float = 0.0,
    mesh=None,
    n_devices: Optional[int] = None,
    initial_embeddings: Optional[np.ndarray] = None,
    halo: Optional[bool] = None,
    banded=None,
    ell=None,
    dtype: str = "float32",
    callback=None,
    out: str = "full",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 10,
):
    """Multi-device embed(): same semantics as cleora_tpu.embed, sharded.

    ``halo=None`` (auto) uses the boundary-row all_to_all exchange whenever
    its per-device gather table is smaller than the all-gathered full table;
    True/False force the choice.  ``halo="hier"`` (requires a
    ``make_hier_mesh`` ("host", "chip") mesh) opts into the explicit
    two-phase hierarchical exchange — chip-axis all_to_all over ICI, then
    a host-axis all_to_all of per-destination-host UNION slabs so each
    boundary row crosses DCN exactly once, then an intra-host fan-out —
    instead of leaving the DCN decomposition of the flat collective to
    XLA; A/B the two on a real pod (shard.HierHaloPlan).  ``ell=None`` (auto) runs each device's
    local SpMM in the sharded sliced-ELL layout (parallel/ell.py — the
    production single-chip layout, RESULTS.md) whenever the cross-shard
    padding cost is acceptable; True forces it, False disables;
    ``ell="split"`` additionally decouples the bucketed local-owner edges
    from the boundary exchange so the all_to_all overlaps the bulk local
    SpMM (the overlapped-halo production form).  When ELL
    declines (or is disabled), ``banded=None`` (auto) switches to the
    accumulator-free row-banded layout when the per-shard edge count
    exceeds one memory-budget chunk (same heuristics as single-chip);
    False disables, an int forces that band count; forcing a band count
    also disables the ELL auto-selection.
    ``dtype="bfloat16"`` stores and exchanges the state in bf16 (half HBM
    and half interconnect bytes, f32 compute).

    **Memory-bounded lifecycle** (no host ever holds the full (N, D)
    matrix — parallel/state.py): with ``initial_embeddings=None`` the
    deterministic hash init runs ON DEVICE per shard (bit-exact vs the
    host path).  ``out`` selects the output form: ``"full"`` (default)
    gathers the complete matrix to every process (back-compat;
    materializes (N, D) on host); ``"shards"`` returns this process's
    contiguous row block as an :class:`~cleora_tpu.parallel.state.EmbeddingShards`;
    a path ending in ``.npy`` streams every process's shards into one
    standard npy file via memmap writes (shared filesystem in
    multi-process runs) and returns a read-only memmap.

    **Checkpoint/resume**: ``checkpoint_dir`` persists the sharded state
    every ``checkpoint_every`` iterations (two-phase, per process —
    parallel/state.py); an interrupted run resumes from the last complete
    checkpoint when called again with the same parameters.
    ``convergence_threshold`` is evaluated per iteration inside each
    jitted segment, so a checkpointed run executes exactly the same
    iteration count as the same call without ``checkpoint_dir``.
    """
    from .._util import maybe_enable_compile_cache

    maybe_enable_compile_cache()
    if dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"Unknown dtype '{dtype}'. Use 'float32' or 'bfloat16'."
        )
    if out not in ("full", "shards") and not (
        isinstance(out, str) and out.endswith(".npy")
    ):
        raise ValueError(
            f"Unknown out {out!r}. Use 'full', 'shards', or a '.npy' path."
        )
    if callback is not None and (out != "full" or checkpoint_dir is not None):
        raise ValueError(
            "callback requires out='full' and no checkpoint_dir (the "
            "callback contract passes the full host matrix per iteration)"
        )
    from ..ops.loop import effective_residual_weight

    # same reference-path semantics as cleora_tpu.embed (see ops/loop.py)
    residual_weight = effective_residual_weight(
        residual_weight,
        rust_fast_semantics=(initial_embeddings is None and callback is None
                             and normalization == "l2" and not whiten),
    )
    if propagation not in ("left", "symmetric"):
        # same check (and message) as cleora_tpu._validate_propagation —
        # the DiskGraph loaders treat any other string as "left", which
        # would silently return wrong numerics
        raise ValueError(
            f"Unknown propagation type: '{propagation}'. "
            "Use 'left' or 'symmetric'."
        )
    if mesh is None:
        import jax as _jax

        if _jax.process_count() > 1 and n_devices is None:
            # multi-host production path: hierarchical ("host","chip") mesh
            # over ALL devices; every process calls embed_sharded with the
            # same graph and receives the full gathered result
            from .mesh import make_hier_mesh

            mesh = make_hier_mesh()
        else:
            mesh = make_mesh(n_devices)
    n_shards = mesh.devices.size

    # per-host PIECE of a sharded build (graph.stream sharded ingest): the
    # piece holds only this host's row blocks, so layouts needing global
    # edge data (halo planning, sharded ELL, banding) are unavailable —
    # run the flat layout with the all-gather exchange; the per-shard edge
    # capacity is allgathered so every process compiles the same shapes
    piece_range = (graph.meta.get("row_range")
                   if getattr(graph, "meta", None) else None)
    piece = (piece_range is not None
             and (piece_range[0] > 0
                  or piece_range[1] < graph.num_entities))
    if piece:
        import jax as _jax

        from .shard import shard_disk_graph

        if _jax.process_count() == 1:
            raise ValueError(
                "This DiskGraph is one host's piece of a sharded build "
                f"(rows {piece_range}); embedding it needs either the "
                "merged graph (graph.stream.merge_disk_graph_shards) or a "
                "multi-process run where every host holds its own piece."
            )
        if banded or halo in ("overlap", "hier") or ell == "split":
            raise ValueError(
                "banded/overlap/hier/ell-split layouts need global edge "
                "data; a sharded-build piece supports the flat, halo and "
                "ELL layouts (merge the pieces for the others)."
            )
        banded = False
        n = graph.num_entities
        from ..graph.stream import shard_row_bounds

        bounds = shard_row_bounds(n, n_shards)
        lo, hi = int(piece_range[0]), int(piece_range[1])
        if lo not in bounds or hi not in bounds:
            raise ValueError(
                f"piece row range [{lo}, {hi}) does not align with the "
                f"{n_shards}-device shard cut {bounds}; build pieces with "
                "graph.stream.host_piece_range(n_entities, n_devices, "
                "devices_per_host, host_id)"
            )
        # every shard this process will place must lie inside the piece
        me = _jax.process_index()
        for k in range(n_shards):
            if mesh.devices.flat[k].process_index != me:
                continue
            if not (lo <= bounds[k] and bounds[k + 1] <= hi):
                raise ValueError(
                    f"process {me} owns shard {k} (rows [{bounds[k]}, "
                    f"{bounds[k + 1]})) but its piece covers only "
                    f"[{lo}, {hi})"
                )
        local_max = max(
            (int(graph.indptr[bounds[k + 1]] - graph.indptr[bounds[k]])
             for k in range(n_shards)
             if lo <= bounds[k] and bounds[k + 1] <= hi),
            default=0,
        )
        from jax.experimental import multihost_utils

        cap = int(np.max(multihost_utils.process_allgather(
            jnp.asarray([local_max])
        )))
        sharded = shard_disk_graph(graph, propagation, n_shards,
                                   edge_capacity=cap)
    else:
        sharded = shard_graph(graph, propagation, n_shards)
    plan = None
    candidate = None
    overlap_plan = None
    hier_plan = None
    ell_extra = {}
    if piece:
        # piece-mode planners: the exchange plan and the ELL degree
        # histogram are assembled from small allgathers of per-shard
        # knowledge (need-lists, degree rows) — no host ever holds the
        # global edge list (parallel/shard.py)
        from .shard import allgather_degrees, plan_halo_distributed

        if ell is not False:
            ell_extra = {"global_deg": allgather_degrees(sharded, mesh)}
        if halo is not False and n_shards > 1:
            candidate = plan_halo_distributed(sharded, mesh)
            if halo or candidate.table_rows < sharded.n_rows_padded:
                plan = candidate
    elif halo == "hier" and n_shards > 1:
        from .mesh import CHIP_AXIS, HOST_AXIS
        from .shard import plan_halo_hier

        if tuple(mesh.axis_names) != (HOST_AXIS, CHIP_AXIS):
            raise ValueError(
                'halo="hier" needs a ("host", "chip") mesh — build it '
                "with make_hier_mesh"
            )
        hier_plan = plan_halo_hier(
            sharded, int(mesh.devices.shape[0]), int(mesh.devices.shape[1])
        )
        banded = False
        ell = False
    elif halo == "overlap" and n_shards > 1:
        from .shard import plan_overlap

        overlap_plan = plan_overlap(sharded)
        banded = False
    elif halo is not False and n_shards > 1:
        candidate = plan_halo(sharded)
        if halo or candidate.table_rows < sharded.n_rows_padded:
            plan = candidate
    if initial_embeddings is not None:
        x0 = np.asarray(initial_embeddings, dtype=np.float32)
        if x0.ndim != 2 or x0.shape[0] != graph.num_entities:
            raise ValueError(
                f"initial_embeddings shape {x0.shape} does not match "
                f"number of entities {graph.num_entities}"
            )
        feature_dim = x0.shape[1]
    else:
        x0 = None  # device-side per-shard hash init (parallel/state.py)

    ell_plan = None
    if overlap_plan is None and ell is not False:
        if ell in (True, "split") or (
            ell is None and banded in (None, False)
        ):
            from .ell import ell_shards

            if ell == "split" and plan is None:
                if halo is False:
                    raise ValueError(
                        "ell='split' overlaps the boundary-row exchange "
                        "with the local SpMM and cannot run with "
                        "halo=False; drop one of the two."
                    )
                # split needs the slab exchange; reuse the auto-select's
                # already-computed candidate instead of re-planning
                plan = candidate if candidate is not None else \
                    plan_halo(sharded)
            ell_plan = ell_shards(
                sharded, d=feature_dim, halo=plan,
                force=ell in (True, "split"), split=ell == "split",
                **ell_extra,
            )
    banded_plan = None
    if ell_plan is None and banded is not False:
        banded_plan = band_shards(
            sharded,
            d=feature_dim,
            cols=plan.remapped_cols if plan is not None else None,
            n_bands=None if banded in (None, True) else int(banded),
        )
    from . import state as lifecycle

    if x0 is None:
        sdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        from .mesh import shard_axes

        x_state = lifecycle.make_initial_state(
            mesh, shard_axes(mesh), sharded, lifecycle.entity_hashes(graph),
            feature_dim, seed, ell_plan=ell_plan, dtype=sdt,
        )
    else:
        x_state = pad_rows(x0, sharded.n_rows_padded)
        if dtype == "bfloat16":
            import ml_dtypes

            x_state = x_state.astype(ml_dtypes.bfloat16)

    from .._util import to_host as _base_to_host

    def _to_host(arr):
        """Full host copy of a (possibly multi-process global) device array."""
        import jax as _jax

        if _jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(arr, tiled=True)
            )
        return _base_to_host(arr)

    def _view(arr):
        """Host copy in original row order, trimmed to the real rows."""
        h = _to_host(arr.astype(jnp.float32))
        if ell_plan is not None:
            h = ell_plan.unpermute_state(h)
        return h[: graph.num_entities]

    if callback is not None:
        # one jitted sharded step per iteration (compile cached across
        # iterations); convergence checked on host, like cleora_tpu.embed
        fn, place = build_sharded_embed(
            mesh, sharded, feature_dim, 1,
            residual_weight=residual_weight, normalization=normalization,
            do_whiten=whiten, convergence_threshold=0.0, halo=plan,
            banded=banded_plan, overlap=overlap_plan, ell=ell_plan,
            hier=hier_plan,
        )
        placed = place(x_state)
        x, rest = placed[0], placed[1:]
        prev_host = None
        # num_iterations == 0 runs no steps: return the initial embeddings,
        # matching the non-callback path.  With iterations to run, skip the
        # pre-loop host view — it is a full device→host (and cross-process
        # allgather) copy that iteration 0 would immediately overwrite.
        host = _view(x) if int(num_iterations) == 0 else None
        for i in range(int(num_iterations)):
            x = fn(x, *rest)
            host = _view(x)
            callback(i, host)
            if convergence_threshold > 0 and i > 0:
                nd = host.shape[0] * host.shape[1]
                rmse = float(np.sqrt(np.sum((host - prev_host) ** 2) / nd))
                if rmse < convergence_threshold:
                    break
            prev_host = host
        return host.copy()

    if checkpoint_dir is not None:
        res = _run_checkpointed(
            mesh, sharded, feature_dim, int(num_iterations),
            residual_weight=residual_weight, normalization=normalization,
            whiten=whiten, convergence_threshold=convergence_threshold,
            plan=plan, banded_plan=banded_plan, overlap_plan=overlap_plan,
            hier_plan=hier_plan, ell_plan=ell_plan, x_state=x_state, dtype=dtype, seed=seed,
            propagation=propagation, user_init=x0 is not None,
            content_digest=lifecycle.content_digest(sharded, x0=x0),
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=int(checkpoint_every),
        )
    else:
        fn, place = build_sharded_embed(
            mesh, sharded, feature_dim, num_iterations,
            residual_weight=residual_weight, normalization=normalization,
            do_whiten=whiten, convergence_threshold=convergence_threshold,
            halo=plan, banded=banded_plan, overlap=overlap_plan,
            ell=ell_plan, hier=hier_plan,
        )
        res = fn(*place(x_state))
    if out == "shards":
        return lifecycle.collect_shards(res, sharded, ell_plan)
    if out != "full":
        return lifecycle.write_memmap(out, res, sharded, ell_plan)
    return _view(res).copy()


def _run_checkpointed(
    mesh, sharded, feature_dim, num_iterations, *, residual_weight,
    normalization, whiten, convergence_threshold, plan, banded_plan,
    overlap_plan, hier_plan, ell_plan, x_state, dtype, seed, propagation,
    user_init,
    content_digest, checkpoint_dir, checkpoint_every,
):
    """Run the sharded loop in checkpoint_every-iteration segments, saving
    the per-shard state after each (parallel/state.py), resuming from the
    last complete checkpoint when the parameters match.  Convergence runs
    PER ITERATION inside each jitted segment (the while_loop variant of
    _shard_loop_fn with a global iteration offset), so a checkpointed run
    executes exactly the same iteration count as the same call without
    checkpoint_dir (VERDICT r3 #4)."""
    from . import state as lifecycle
    from .mesh import shard_axes

    axis = shard_axes(mesh)
    seg = max(1, checkpoint_every)
    mode = ("hier" if hier_plan is not None else
            "overlap" if overlap_plan is not None else
            "ell-split" if ell_plan is not None and ell_plan.remote is not None
            else "ell" if ell_plan is not None else
            "banded" if banded_plan is not None else
            "halo" if plan is not None else "flat")
    fp = lifecycle.fingerprint(dict(
        n_rows=sharded.n_rows, n_rows_padded=sharded.n_rows_padded,
        rows_per_shard=sharded.rows_per_shard, feature_dim=feature_dim,
        dtype=dtype, normalization=normalization, whiten=bool(whiten),
        residual_weight=float(residual_weight), propagation=propagation,
        seed=seed, num_iterations=num_iterations, seg=seg, mode=mode,
        R=ell_plan.R if ell_plan is not None else None,
        user_init=bool(user_init),
        content=content_digest,
        convergence=float(convergence_threshold),
        n_shards=int(mesh.devices.size),
    ))
    ck = lifecycle.ShardedCheckpoint(checkpoint_dir, fp)

    built = {}
    converging = convergence_threshold > 0

    def fn_for(iters):
        if iters not in built:
            built[iters] = build_sharded_embed(
                mesh, sharded, feature_dim, iters,
                residual_weight=residual_weight, normalization=normalization,
                do_whiten=whiten,
                convergence_threshold=convergence_threshold,
                halo=plan, banded=banded_plan, overlap=overlap_plan,
                ell=ell_plan, hier=hier_plan, return_meta=converging,
            )
        return built[iters]

    fn, place = fn_for(min(seg, num_iterations) or 1)
    placed = place(x_state)
    x, rest = placed[0], placed[1:]
    meta = ck.latest()
    done = 0
    if meta is not None:
        done = min(int(meta["iteration"]), num_iterations)
        if done > 0:
            x = ck.load(mesh, axis, meta)
        if meta.get("converged") and done > 0:
            return x

    while done < num_iterations:
        it = min(seg, num_iterations - done)
        f, _ = fn_for(it)
        if converging:
            x, iters_run, conv = f(x, *rest, jnp.int32(done))
            done += int(iters_run)
            ck.save(x, done, extra={"converged": bool(conv)})
            if bool(conv):
                break
        else:
            x = f(x, *rest)
            done += it
            ck.save(x, done)
    return x
