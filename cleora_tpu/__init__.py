"""cleora_tpu — a TPU-native hypergraph embedding framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
BaseModelAI/cleora (pycleora 3.2.1).  The hot loop — SpMM propagate →
L2 row-normalize → PCA whitening — runs fused on device (one dispatch for all
iterations); graph construction is a deterministic host-side clique-expansion
pipeline with bit-exact XXH64/FxHash numerics.

Top-level API parity: /root/reference/pycleora/__init__.py.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from ._util import to_host
from .sparse import SparseMatrix

DEFAULT_FEATURE_DIM = 256
DEFAULT_NUM_ITERATIONS = 40

__version__ = "0.1.0"


def _jnp():
    import jax.numpy as jnp

    return jnp


def embed_using_baseline_cleora(graph, feature_dim: int, iter: int):
    """Parity helper (pycleora/__init__.py:16-21): explicit per-iter loop."""
    embeddings = graph.initialize_deterministically(feature_dim)
    for _ in range(iter):
        embeddings = graph.left_markov_propagate(embeddings)
        embeddings = _postprocess_iteration(embeddings, "l2", True)
    return embeddings


def _validate_propagation(propagation: str):
    if propagation not in ("left", "symmetric"):
        raise ValueError(
            f"Unknown propagation type: '{propagation}'. Use 'left' or 'symmetric'."
        )


def _get_propagate_fn(graph: SparseMatrix, propagation: str):
    _validate_propagation(propagation)
    return (
        graph.symmetric_markov_propagate
        if propagation == "symmetric"
        else graph.left_markov_propagate
    )


def _to_scipy_sparse(graph: SparseMatrix, markov_type: str = "left"):
    from scipy.sparse import csr_matrix

    rows, cols, vals, n_rows, n_cols = graph.to_sparse_csr(markov_type)
    return csr_matrix(
        (vals, (rows.astype(np.int64), cols.astype(np.int64))),
        shape=(n_rows, n_cols),
    )


def _auto_iterations(feature_dim: int) -> int:
    return DEFAULT_NUM_ITERATIONS


def embed(
    graph: SparseMatrix,
    feature_dim: int = DEFAULT_FEATURE_DIM,
    num_iterations: Union[int, str] = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    seed: int = 0,
    initial_embeddings: Optional[np.ndarray] = None,
    num_workers: Optional[int] = None,
    callback: Optional[Callable[[int, np.ndarray], None]] = None,
    residual_weight: float = 0.0,
    convergence_threshold: float = 0.0,
    whiten: bool = True,
    dtype: str = "float32",
    canonical_shapes: Optional[bool] = None,
) -> np.ndarray:
    """Cleora embedding: num_iterations × [propagate → normalize → whiten].

    Semantics parity with the reference embed() (pycleora/__init__.py:51-127),
    but every configuration runs the fused on-device loop — there is no slow
    path: normalization modes, whitening, residual, convergence, and initial
    embeddings are all handled inside one jitted fori/while loop.  Only a
    per-iteration callback falls back to one dispatch per iteration.

    ``dtype="bfloat16"`` stores the embedding state (and gather table) in
    bf16 — half the HBM, double the per-chip graph capacity — while all
    accumulation, normalization, and whitening compute in float32.  The
    returned array is always float32.

    ``canonical_shapes`` quantizes the sliced-ELL layout to
    graph-independent shapes so graphs of similar scale reuse one
    compiled XLA program (cold TPU compiles cost minutes per shape).
    **Default ON since round 4**: measured 88.7 vs 89.1 M edge-ops/s at
    the bench shape — within the run-to-run band (RESULTS.md) — so the
    compile-cache portability is free; ``canonical_shapes=False`` or
    ``CLEORA_TPU_CANON=0`` restores the exact-shape layout.  Padding
    rows stay exactly zero and are excluded from whitening/RMSE
    statistics (ops/spmm_ell.py:_plan_ell_canonical); output is
    numerically equivalent at float tolerance.
    """
    from ._util import maybe_enable_compile_cache

    maybe_enable_compile_cache()
    if dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"Unknown dtype '{dtype}'. Use 'float32' or 'bfloat16'."
        )
    if isinstance(num_iterations, str):
        if num_iterations == "auto":
            num_iterations = _auto_iterations(feature_dim)
        else:
            raise ValueError(
                f"num_iterations must be an int or 'auto', got '{num_iterations}'"
            )
    if not hasattr(graph, "data"):
        # streamed build (graph.stream.DiskGraph): route through the sharded
        # loop, whose loader reads the memmapped CSR one row block at a time
        # (a 1-device mesh on a single chip) — embed() semantics unchanged.
        # warn only on an EXPLICIT canonical request (argument or env set
        # by the user) — canonical is the round-4 default, and the default
        # path should not warn on every DiskGraph embed
        if canonical_shapes or (
            canonical_shapes is None
            and os.environ.get("CLEORA_TPU_CANON") == "1"
        ):
            import warnings

            warnings.warn(
                "canonical_shapes is not supported for streamed-build "
                "(DiskGraph) inputs; the sharded loop uses its exact-shape "
                "layout, so a new graph shape pays the full cold compile.",
                stacklevel=2,
            )
        from .parallel.embed import embed_sharded as _disk_embed

        return _disk_embed(
            graph, feature_dim=feature_dim, num_iterations=num_iterations,
            propagation=propagation, normalization=normalization, seed=seed,
            whiten=whiten, residual_weight=residual_weight,
            convergence_threshold=convergence_threshold,
            initial_embeddings=initial_embeddings, dtype=dtype,
            callback=callback,
        )
    _validate_propagation(propagation)
    if normalization not in ("l2", "l1", "spectral", "none"):
        raise ValueError(
            f"Unknown normalization method: {normalization}. "
            "Use 'l2', 'l1', 'spectral', or 'none'."
        )

    import jax.numpy as jnp

    from .ops.loop import (
        effective_residual_weight,
        embed_loop,
        embed_loop_convergence,
        embed_step,
        from_layout_order,
        to_layout_order,
    )

    # which reference path would this configuration have taken?  (Their
    # residual semantics differ — see effective_residual_weight.)
    residual_weight = effective_residual_weight(
        residual_weight,
        rust_fast_semantics=(initial_embeddings is None and callback is None
                             and normalization == "l2" and not whiten),
    )

    if initial_embeddings is not None:
        x0 = np.asarray(initial_embeddings, dtype=np.float32)
        if x0.shape[0] != graph.num_entities:
            raise ValueError(
                f"initial_embeddings has {x0.shape[0]} rows but graph has "
                f"{graph.num_entities} entities"
            )
        feature_dim = x0.shape[1]
    else:
        x0 = graph.initialize_deterministically(feature_dim, seed)

    from .ops.memory import check_device_fit

    check_device_fit(graph.num_entities, int(feature_dim),
                     int(graph.data.indices.shape[0]), dtype)
    if canonical_shapes is None:
        canonical_shapes = os.environ.get("CLEORA_TPU_CANON", "1") != "0"
    rows, cols, vals = graph._device_coo(
        propagation, banded_dim=int(feature_dim),
        canonical=bool(canonical_shapes),
    )
    n = graph.num_entities
    from .ops.spmm_ell import EllPlan

    state_rows = rows.state_rows if isinstance(rows, EllPlan) else n
    if state_rows != n:
        # canonical-shape plan: re-check HBM fit at the PADDED shape — the
        # state/output/whitening buffers are all sized by state_rows (up to
        # ~25% over n just past a grid step) and the gather slabs by the
        # padded slot count, both of which the pre-plan check (true n/nnz)
        # underestimates; near-ceiling graphs must fail with the actionable
        # error here, not in the XLA allocator
        check_device_fit(state_rows, int(feature_dim), int(rows.slots),
                         dtype)
        # the loop state is padded to the plan's
        # quantized row grid; pad rows are zero and sliced off on return
        x0 = np.concatenate(
            [np.asarray(x0, dtype=np.float32),
             np.zeros((state_rows - n, int(feature_dim)), dtype=np.float32)]
        )
    x0 = jnp.asarray(x0)
    if dtype == "bfloat16":
        x0 = x0.astype(jnp.bfloat16)

    if callback is None and convergence_threshold <= 0:
        out = embed_loop(
            rows, cols, vals, x0,
            n_rows=state_rows,
            num_iterations=int(num_iterations),
            residual_weight=float(residual_weight),
            normalization=normalization,
            do_whiten=bool(whiten),
        )
        if state_rows != n:
            out = out[:n]
        return to_host(out.astype(jnp.float32))

    if callback is None:
        out, _ = embed_loop_convergence(
            rows, cols, vals, x0,
            n_rows=state_rows,
            max_iterations=int(num_iterations),
            residual_weight=float(residual_weight),
            convergence_threshold=float(convergence_threshold),
            normalization=normalization,
            do_whiten=bool(whiten),
        )
        if state_rows != n:
            out = out[:n]
        return to_host(out.astype(jnp.float32))

    # callback path: one jitted step per iteration, convergence on host.
    # State stays in the layout's relabeled row space for the whole loop
    # (permutes are per host-visible view, not per step); RMSE is
    # permutation-invariant so it runs on the relabeled arrays directly.
    x = to_layout_order(rows, x0)
    for i in range(int(num_iterations)):
        prev = x
        x = embed_step(
            rows, cols, vals, x,
            n_rows=state_rows,
            residual_weight=float(residual_weight),
            normalization=normalization,
            do_whiten=bool(whiten),
            relabeled=True,
        )
        callback(
            i,
            np.asarray(from_layout_order(rows, x).astype(jnp.float32))[:n],
        )
        if convergence_threshold > 0 and i > 0:
            # canonical padding rows are exactly zero in both x and prev, so
            # only the denominator needs the true row count
            rmse = _compute_rmse(
                np.asarray(x.astype(jnp.float32)),
                np.asarray(prev.astype(jnp.float32)),
            ) * np.sqrt(state_rows / n)
            if rmse < convergence_threshold:
                break
    return to_host(from_layout_order(rows, x).astype(jnp.float32)[:n])


def embed_dim_sharded(
    graph: SparseMatrix,
    feature_dim: int = DEFAULT_FEATURE_DIM,
    slice_dim: int = 64,
    num_iterations: Union[int, str] = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    seed: int = 0,
    whiten: bool = False,
    slice_callback: Optional[Callable[[int, np.ndarray], None]] = None,
    **embed_kwargs,
) -> np.ndarray:
    """The reference FAQ's embeddings-don't-fit workflow, automated
    (README.md:359-361): run the loop per dimension slice, concatenate, and
    L2-renormalize the concatenation.

    Slice k seeds its deterministic init with ``seed + k·slice_dim``, which
    makes the concatenated init exactly equal the full-dim hash init (the
    init value for column c is a function of hash + c + seed).  Propagation
    treats dimensions independently, so with whiten=False (the default here —
    whitening mixes dimensions and is per-slice if enabled) the only
    difference from a full-dim run is per-slice instead of full-vector
    normalization, exactly as in the reference's documented manual workflow.
    ``slice_callback(k, slice_embeddings)`` supports persist-to-disk flows.
    """
    if feature_dim % slice_dim != 0:
        raise ValueError(
            f"feature_dim ({feature_dim}) must be a multiple of slice_dim "
            f"({slice_dim})"
        )
    if "initial_embeddings" in embed_kwargs:
        # forwarding it would make every slice a full-dim run of the same
        # init (embed() overrides feature_dim from the array's width) and
        # return a silently wrong (n, dim²/slice_dim) concatenation
        raise ValueError(
            "embed_dim_sharded derives each slice's init from the "
            "deterministic hash (seed + k*slice_dim); initial_embeddings "
            "is not supported — slice it yourself and call embed() per "
            "slice instead"
        )
    if not hasattr(graph, "data"):
        # streamed build (graph.stream.DiskGraph): each slice runs through
        # the sharded loop, which loads edges off the memmapped CSR one row
        # block at a time — so one chip can embed a graph whose full-dim
        # state exceeds HBM by combining the two scale axes (dim slices ×
        # out-of-core build), without ever materializing the edge list in
        # RAM.  The same call scales out on a pod mesh.
        from .parallel.embed import embed_sharded as _slice_embed

        if num_iterations == "auto":
            num_iterations = _auto_iterations(feature_dim)

        def _one_slice(k):
            return _slice_embed(
                graph,
                feature_dim=slice_dim,
                num_iterations=num_iterations,
                propagation=propagation,
                normalization=normalization,
                seed=seed + k * slice_dim,
                whiten=whiten,
                **embed_kwargs,
            )
    else:
        def _one_slice(k):
            return embed(
                graph,
                feature_dim=slice_dim,
                num_iterations=num_iterations,
                propagation=propagation,
                normalization=normalization,
                seed=seed + k * slice_dim,
                whiten=whiten,
                **embed_kwargs,
            )
    slices = []
    for k in range(feature_dim // slice_dim):
        part = _one_slice(k)
        if slice_callback is not None:
            slice_callback(k, part)
        slices.append(part)
    return _normalize(np.concatenate(slices, axis=1), "l2")


def whiten_embeddings(
    embeddings: np.ndarray, n_components: Optional[int] = None
) -> np.ndarray:
    """PCA whitening, numerically matching the reference host implementation
    (pycleora/__init__.py:130-164): float64 mean/covariance/eigh, float32
    projection.  For the on-device float32 variant see cleora_tpu.ops.whiten.
    """
    embeddings = np.asarray(embeddings)
    n, d = embeddings.shape
    if n <= 1:
        return embeddings.copy()

    mean = embeddings.mean(axis=0, dtype=np.float64)
    centered = embeddings.astype(np.float64) - mean
    cov = (centered.T @ centered) / (n - 1)

    eigenvalues, eigenvectors = np.linalg.eigh(cov)
    idx = np.argsort(eigenvalues)[::-1]
    eigenvalues = eigenvalues[idx]
    eigenvectors = eigenvectors[:, idx]

    if n_components is not None:
        eigenvalues = eigenvalues[:n_components]
        eigenvectors = eigenvectors[:, :n_components]

    scale = 1.0 / np.sqrt(np.maximum(eigenvalues, 1e-10))
    transform = (eigenvectors * scale).astype(np.float32)
    mean_f32 = mean.astype(np.float32)
    return ((embeddings.astype(np.float32) - mean_f32) @ transform).astype(np.float32)


def embed_with_node_features(
    graph: SparseMatrix,
    node_features: Dict[str, np.ndarray],
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    feature_weight: float = 0.5,
    num_workers: Optional[int] = None,
) -> np.ndarray:
    """Warm-start the embed from a convex mix of the deterministic hash
    init and user-supplied feature vectors: nodes named in
    ``node_features`` start at ``(1−w)·hash_init + w·feature``, everything
    else at the plain hash init; names absent from the graph are ignored.
    Semantics parity: pycleora/__init__.py:167-203 (asserted geometry-level
    by tests/test_reference_verbatim.py), vectorized here — the features
    are stacked once and blended with a single fancy-index assignment
    instead of a per-entity Python loop."""
    if not node_features:
        raise ValueError(
            "node_features must be a non-empty dict of entity_id -> feature_vector"
        )

    names = list(node_features)
    feat_dim = len(node_features[names[0]])
    stacked = np.empty((len(names), feat_dim), dtype=np.float32)
    for i, name in enumerate(names):
        vec = np.asarray(node_features[name], dtype=np.float32)
        if vec.shape != (feat_dim,):
            raise ValueError(
                f"Feature for '{name}' has dimension "
                f"{vec.shape[-1] if vec.ndim else 0}, expected {feat_dim}"
            )
        stacked[i] = vec

    x0 = graph.initialize_deterministically(feat_dim)
    index_map = graph._index_map  # cached; names absent from the graph → -1
    idx = np.fromiter((index_map.get(n, -1) for n in names),
                      dtype=np.int64, count=len(names))
    known = idx >= 0
    rows = idx[known]
    x0[rows] = (1.0 - feature_weight) * x0[rows] + feature_weight * stacked[known]
    return embed(
        graph,
        feature_dim=feat_dim,
        num_iterations=num_iterations,
        propagation=propagation,
        normalization=normalization,
        initial_embeddings=x0,
        num_workers=num_workers,
    )


def embed_with_attention(
    graph: SparseMatrix,
    feature_dim: int = DEFAULT_FEATURE_DIM,
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    attention_temperature: float = 1.0,
    seed: int = 0,
    num_workers: Optional[int] = None,
    callback: Optional[Callable[[int, np.ndarray], None]] = None,
    whiten: bool = True,
) -> np.ndarray:
    """Per-iteration softmax dot-product attention over edges
    (parity: pycleora/__init__.py:206-276), fully on device.

    Edge attention = softmax_row(cos(e_i, e_j)/T); the attention matrix
    reweights the Markov matrix, is row-renormalized, then propagates.
    Implemented with the same COO segment ops as SpMM — no scipy.
    """
    _validate_propagation(propagation)
    if attention_temperature <= 0:
        raise ValueError(
            f"attention_temperature must be positive, got {attention_temperature}"
        )
    if num_iterations <= 0:
        raise ValueError(f"num_iterations must be positive, got {num_iterations}")

    import jax
    import jax.numpy as jnp

    from .ops.loop import embed_step
    from .ops.memory import check_device_fit
    from .ops.normalize import l2_normalize
    from .ops.spmm import spmm_inner

    n = graph.num_entities
    check_device_fit(n, int(feature_dim), int(graph.data.indices.shape[0]))
    rows, cols, vals = graph._device_coo(propagation)

    x = jnp.asarray(graph.initialize_deterministically(feature_dim, seed))
    x = embed_step(
        rows, cols, vals, x, n_rows=n, normalization=normalization, do_whiten=whiten
    )
    if callback is not None:
        callback(0, np.asarray(x))
    if num_iterations == 1:
        return to_host(x)

    import functools

    @functools.partial(jax.jit, static_argnames=("n_rows", "normalization", "do_whiten"))
    def attention_step(rows, cols, vals, x, temperature, *, n_rows, normalization,
                       do_whiten):
        emb_normed = l2_normalize(x)
        scores = jnp.sum(
            jnp.take(emb_normed, rows, axis=0) * jnp.take(emb_normed, cols, axis=0),
            axis=1,
        ) / temperature
        # mask padding (vals == 0) out of the softmax
        valid = vals != 0.0
        neg_inf = jnp.float32(-jnp.inf)
        masked = jnp.where(valid, scores, neg_inf)
        row_max = jax.ops.segment_max(
            masked, rows, num_segments=n_rows, indices_are_sorted=True
        )
        row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
        exp_scores = jnp.where(valid, jnp.exp(masked - row_max[rows]), 0.0)
        denom = jax.ops.segment_sum(
            exp_scores, rows, num_segments=n_rows, indices_are_sorted=True
        )
        attn = exp_scores / jnp.maximum(denom, 1e-10)[rows]
        weighted = attn * vals
        wsum = jax.ops.segment_sum(
            weighted, rows, num_segments=n_rows, indices_are_sorted=True
        )
        weighted = weighted / jnp.maximum(wsum, 1e-10)[rows]
        y = spmm_inner(rows, cols, weighted, x, n_rows)
        from .ops.normalize import normalize as _norm
        from .ops.whiten import whiten as _whiten

        y = _norm(y, normalization)
        if do_whiten:
            y = _whiten(y)
        return y

    temp = jnp.float32(attention_temperature)
    for i in range(1, num_iterations):
        x = attention_step(
            rows, cols, vals, x, temp,
            n_rows=n, normalization=normalization, do_whiten=whiten,
        )
        if callback is not None:
            callback(i, np.asarray(x))
    return to_host(x)


def embed_multiscale(
    graph: SparseMatrix,
    feature_dim: int = DEFAULT_FEATURE_DIM,
    scales: Optional[List[int]] = None,
    propagation: str = "left",
    normalization: str = "l2",
    seed: int = 0,
    num_workers: Optional[int] = None,
    whiten: bool = True,
) -> np.ndarray:
    """Concatenate snapshots at multiple iteration scales
    (parity: pycleora/__init__.py:279-309)."""
    _validate_propagation(propagation)
    if scales is None:
        scales = [10, 20, 30, 40]
    if not scales or not all(isinstance(s, int) and s > 0 for s in scales):
        raise ValueError("scales must be a non-empty list of positive integers")

    import jax.numpy as jnp

    from .ops.loop import embed_loop
    from .ops.memory import check_device_fit

    n = graph.num_entities
    check_device_fit(n, int(feature_dim), int(graph.data.indices.shape[0]))
    rows, cols, vals = graph._device_coo(propagation, banded_dim=int(feature_dim))
    x = jnp.asarray(graph.initialize_deterministically(feature_dim, seed))

    snapshots = []
    current = 0
    for scale in sorted(scales):
        iters = scale - current
        if iters > 0:
            x = embed_loop(
                rows, cols, vals, x,
                n_rows=n, num_iterations=iters,
                normalization=normalization, do_whiten=whiten,
            )
            current = scale
        snapshots.append(np.asarray(x))
    return np.concatenate(snapshots, axis=1)


def embed_weighted(
    edges_with_weights: List[Tuple[str, float]],
    columns: str,
    feature_dim: int = DEFAULT_FEATURE_DIM,
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    seed: int = 0,
    hyperedge_trim_n: int = 16,
    num_workers: Optional[int] = None,
    whiten: bool = True,
) -> Tuple[SparseMatrix, np.ndarray]:
    """Max-edge-weight diagonal reweighting + row renorm
    (parity: pycleora/__init__.py:312-359), propagated on device."""
    edge_strs = [e for e, _ in edges_with_weights]
    graph = SparseMatrix.from_iterator(
        iter(edge_strs), columns, hyperedge_trim_n, num_workers
    )

    n = graph.num_entities
    weight_diag = np.ones(n, dtype=np.float64)
    index_map = graph._index_map  # cached on the graph; O(n) once, not per call
    for edge_str, w in edges_with_weights:
        for ent in edge_str.strip().split():
            idx = index_map.get(ent)
            if idx is not None:
                weight_diag[idx] = max(weight_diag[idx], w)

    data = graph.data
    base_vals = data.sym_vals if propagation == "symmetric" else data.left_vals
    coo_rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(data.indptr))
    vals = base_vals.astype(np.float64) * weight_diag[coo_rows]
    row_sums = np.zeros(n, dtype=np.float64)
    np.add.at(row_sums, coo_rows, vals)
    vals = vals / np.maximum(row_sums, 1e-10)[coo_rows]

    emb = _propagate_custom_coo(
        graph, coo_rows, data.indices, vals.astype(np.float32), feature_dim,
        num_iterations, normalization, whiten, seed,
    )
    return graph, emb


def _propagate_custom_coo(
    graph, coo_rows, coo_cols, coo_vals, feature_dim, num_iterations,
    normalization, whiten, seed, init=None,
):
    """Run the fused device loop over a caller-supplied COO matrix."""
    import jax.numpy as jnp

    from .ops.loop import embed_loop
    from .ops.spmm import pad_coo

    n = graph.num_entities
    prow, pcol, pval = pad_coo(
        coo_rows.astype(np.int32), coo_cols.astype(np.int32),
        coo_vals.astype(np.float32), n,
    )
    x0 = init if init is not None else graph.initialize_deterministically(
        feature_dim, seed
    )
    out = embed_loop(
        jnp.asarray(prow), jnp.asarray(pcol), jnp.asarray(pval), jnp.asarray(x0),
        n_rows=n, num_iterations=int(num_iterations),
        normalization=normalization, do_whiten=bool(whiten),
    )
    return to_host(out)


def embed_directed(
    edges: List[str],
    columns: str,
    feature_dim: int = DEFAULT_FEATURE_DIM,
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    normalization: str = "l2",
    seed: int = 0,
    hyperedge_trim_n: int = 16,
    num_workers: Optional[int] = None,
    whiten: bool = True,
) -> Tuple[SparseMatrix, np.ndarray]:
    """Keep only (i, j) transition entries ordered as in the input lines
    (parity: pycleora/__init__.py:362-410)."""
    graph = SparseMatrix.from_iterator(iter(edges), columns, hyperedge_trim_n, num_workers)

    directed_pairs = set()
    for edge_str in edges:
        parts = edge_str.strip().split()
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                directed_pairs.add((parts[i], parts[j]))

    data = graph.data
    n = graph.num_entities
    coo_rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(data.indptr))
    eids = graph.entity_ids
    keep = np.fromiter(
        (
            (eids[int(r)], eids[int(c)]) in directed_pairs
            for r, c in zip(coo_rows, data.indices)
        ),
        dtype=bool,
        count=coo_rows.shape[0],
    )
    rows_k = coo_rows[keep]
    cols_k = data.indices[keep].astype(np.int64)
    vals_k = data.left_vals[keep].astype(np.float64)
    row_sums = np.zeros(n, dtype=np.float64)
    np.add.at(row_sums, rows_k, vals_k)
    vals_k = vals_k / np.maximum(row_sums, 1e-10)[rows_k]

    emb = _propagate_custom_coo(
        graph, rows_k, cols_k, vals_k.astype(np.float32), feature_dim,
        num_iterations, normalization, whiten, seed,
    )
    return graph, emb


def supervised_refine(
    graph: SparseMatrix,
    embeddings: np.ndarray,
    positive_pairs: List[Tuple[str, str]],
    negative_pairs: Optional[List[Tuple[str, str]]] = None,
    learning_rate: float = 0.01,
    num_epochs: int = 50,
    margin: float = 0.5,
    num_negatives_per_positive: int = 5,
    callback: Optional[Callable[[int, float], None]] = None,
) -> np.ndarray:
    """Cosine triplet-loss SGD refinement
    (parity: pycleora/__init__.py:413-512, including rng(42) neg sampling)."""
    if embeddings.shape[0] != graph.num_entities:
        raise ValueError(
            f"embeddings has {embeddings.shape[0]} rows but graph has "
            f"{graph.num_entities} entities"
        )

    x = embeddings.copy().astype(np.float64)
    n = graph.num_entities
    pos_idx = _pair_indices(graph, positive_pairs)
    neg_idx = (_pair_indices(graph, negative_pairs)
               if negative_pairs is not None else [])
    rng = np.random.default_rng(42)  # parity: fixed neg-sampling stream

    for epoch in range(num_epochs):
        epoch_loss = 0.0
        for i, j in pos_idx:
            hinge = _cosine_sgd_step(x, i, j, learning_rate)
            if hinge is None:
                continue  # degenerate norms skip the negatives too
            epoch_loss += hinge
            if negative_pairs is not None:
                contrast = neg_idx
            else:
                # drawn every positive step (even converged ones) so the
                # RNG stream is position-independent of the loss values
                draw = rng.choice(
                    n, size=min(num_negatives_per_positive, n - 1),
                    replace=False,
                )
                contrast = [(i, int(c)) for c in draw if c != i]
            for ni, nj in contrast[:num_negatives_per_positive]:
                h = _cosine_sgd_step(x, ni, nj, learning_rate,
                                     push_margin=margin)
                if h is not None:
                    epoch_loss += h

        mean_loss = epoch_loss / max(len(pos_idx), 1)
        if callback is not None:
            callback(epoch, mean_loss)
        if mean_loss < 1e-6:
            break

    return _normalize(x.astype(np.float32), "l2")


def _pair_indices(graph: SparseMatrix,
                  pairs: List[Tuple[str, str]]) -> List[Tuple[int, int]]:
    """Entity-name pairs → dense-index pairs, erroring on unknown names
    (the graph's cached index map makes this O(1) per lookup)."""
    index_map = graph._index_map
    out = []
    for a, b in pairs:
        ia = index_map.get(a)
        ib = index_map.get(b)
        if ia is None:
            raise ValueError(f"Entity '{a}' not found in graph")
        if ib is None:
            raise ValueError(f"Entity '{b}' not found in graph")
        out.append((ia, ib))
    return out


def _cosine_sgd_step(x: np.ndarray, i: int, j: int, lr: float,
                     push_margin: Optional[float] = None):
    """One in-place cosine SGD step on rows (i, j) of ``x``.

    Default mode pulls the pair together (hinge 1 − cos); with
    ``push_margin`` it pushes them apart once cos exceeds the margin
    (hinge cos − margin), applying the negated gradient.  Returns the
    hinge loss, or None when either row's norm underflows (callers use
    that to skip a degenerate pair's whole step, reference semantics).
    ∂cos/∂x_i = x_j/(‖x_i‖‖x_j‖) − x_i·cos/‖x_i‖²; both row gradients
    are evaluated before either row is updated."""
    u, v = x[i], x[j]
    nu, nv = np.linalg.norm(u), np.linalg.norm(v)
    if nu < 1e-10 or nv < 1e-10:
        return None
    cos = np.dot(u, v) / (nu * nv)
    push = push_margin is not None
    hinge = max(0.0, cos - push_margin) if push else max(0.0, 1.0 - cos)
    if hinge > 0:
        gi = v / (nu * nv) - u * cos / (nu * nu)
        gj = u / (nu * nv) - v * cos / (nv * nv)
        if push:
            x[i] -= lr * gi
            x[j] -= lr * gj
        else:
            x[i] += lr * gi
            x[j] += lr * gj
    return hinge


def update_graph(
    existing_edges: List[str],
    new_edges: List[str],
    columns: str,
    hyperedge_trim_n: int = 16,
    num_workers: Optional[int] = None,
) -> SparseMatrix:
    all_edges = list(existing_edges) + list(new_edges)
    return SparseMatrix.from_iterator(iter(all_edges), columns, hyperedge_trim_n, num_workers)


def remove_edges(
    existing_edges: List[str],
    edges_to_remove: List[str],
    columns: str,
    hyperedge_trim_n: int = 16,
    num_workers: Optional[int] = None,
) -> SparseMatrix:
    remove_set = set(edges_to_remove)
    remaining = [e for e in existing_edges if e not in remove_set]
    if not remaining:
        raise ValueError("Cannot remove all edges from the graph")
    return SparseMatrix.from_iterator(iter(remaining), columns, hyperedge_trim_n, num_workers)


def embed_inductive(
    trained_graph: SparseMatrix,
    trained_embeddings: np.ndarray,
    existing_edges: List[str],
    new_edges: List[str],
    columns: str,
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    hyperedge_trim_n: int = 16,
    num_workers: Optional[int] = None,
) -> Tuple[SparseMatrix, np.ndarray]:
    """Warm-start an updated graph from trained embeddings
    (parity: pycleora/__init__.py:540-580)."""
    if trained_embeddings.shape[0] != trained_graph.num_entities:
        raise ValueError(
            f"trained_embeddings has {trained_embeddings.shape[0]} rows but graph "
            f"has {trained_graph.num_entities} entities"
        )

    updated_graph = update_graph(existing_edges, new_edges, columns,
                                 hyperedge_trim_n, num_workers)
    old_index_map = trained_graph._index_map  # cached on the graph
    dim = trained_embeddings.shape[1]
    init = np.random.randn(updated_graph.num_entities, dim).astype(np.float32) * 0.01
    for i, eid in enumerate(updated_graph.entity_ids):
        if eid in old_index_map:
            init[i] = trained_embeddings[old_index_map[eid]]

    updated_embeddings = embed(
        updated_graph,
        feature_dim=dim,
        num_iterations=num_iterations,
        propagation=propagation,
        normalization=normalization,
        initial_embeddings=init,
        num_workers=num_workers,
    )
    return updated_graph, updated_embeddings


def embed_streaming(
    edge_batches,
    columns: str,
    feature_dim: int = DEFAULT_FEATURE_DIM,
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    hyperedge_trim_n: int = 16,
    num_workers: Optional[int] = None,
    batch_callback: Optional[Callable[[int, SparseMatrix, np.ndarray], None]] = None,
) -> Tuple[SparseMatrix, np.ndarray]:
    """Cumulative-batch streaming with warm starts
    (parity: pycleora/__init__.py:583-633)."""
    all_edges: List[str] = []
    graph = None
    embeddings = None
    prev_entity_ids: List[str] = []

    for batch_idx, batch in enumerate(edge_batches):
        all_edges.extend(batch)
        graph = SparseMatrix.from_iterator(
            iter(all_edges), columns, hyperedge_trim_n, num_workers
        )

        if embeddings is not None:
            old_index_map = {eid: i for i, eid in enumerate(prev_entity_ids)}
            init = np.random.randn(graph.num_entities, feature_dim).astype(np.float32) * 0.01
            for i, eid in enumerate(graph.entity_ids):
                if eid in old_index_map:
                    old_idx = old_index_map[eid]
                    if old_idx < embeddings.shape[0]:
                        init[i] = embeddings[old_idx]
            embeddings = embed(
                graph, feature_dim=feature_dim, num_iterations=num_iterations,
                propagation=propagation, normalization=normalization,
                initial_embeddings=init, num_workers=num_workers,
            )
        else:
            embeddings = embed(
                graph, feature_dim=feature_dim, num_iterations=num_iterations,
                propagation=propagation, normalization=normalization,
                num_workers=num_workers,
            )

        prev_entity_ids = list(graph.entity_ids)
        if batch_callback is not None:
            batch_callback(batch_idx, graph, embeddings)

    return graph, embeddings


def predict_links(
    graph: SparseMatrix,
    embeddings: np.ndarray,
    top_k: int = 10,
    exclude_existing: bool = True,
    source_entities: Optional[List[str]] = None,
) -> List[Dict]:
    """Cosine-similarity link prediction (parity: pycleora/__init__.py:636-681)."""
    norms = np.linalg.norm(embeddings, axis=1, keepdims=True)
    normed = embeddings / np.maximum(norms, 1e-10)

    fwd = rev = None
    if exclude_existing:
        # vectorized existing-edge masking: out-neighbors from the CSR plus
        # in-neighbors from its transpose (the reference scans a pair set
        # per candidate, pycleora/__init__.py:654-663 — same semantics)
        rows, cols, _, n, _ = graph.to_sparse_csr()
        rows = rows.astype(np.int64)
        cols = cols.astype(np.int64)
        from scipy.sparse import csr_matrix

        fwd = csr_matrix(
            (np.ones(len(rows), np.int8), (rows, cols)), shape=(n, n)
        )
        rev = fwd.T.tocsr()

    if source_entities is not None:
        source_indices = [graph.get_entity_index(eid) for eid in source_entities]
    else:
        source_indices = list(range(graph.num_entities))

    predictions = []
    for src_idx in source_indices:
        sims = normed @ normed[src_idx]
        sims[src_idx] = -2.0
        if exclude_existing:
            sims[fwd.indices[fwd.indptr[src_idx]:fwd.indptr[src_idx + 1]]] = -2.0
            sims[rev.indices[rev.indptr[src_idx]:rev.indptr[src_idx + 1]]] = -2.0
        top_indices = np.argsort(sims)[::-1][:top_k]
        for tgt_idx in top_indices:
            if sims[tgt_idx] <= -2.0:
                continue
            predictions.append(
                {
                    "source": graph.entity_ids[src_idx],
                    "target": graph.entity_ids[int(tgt_idx)],
                    "score": float(sims[int(tgt_idx)]),
                }
            )

    predictions.sort(key=lambda x: x["score"], reverse=True)
    return predictions[:top_k]


def propagate_gpu(
    graph: SparseMatrix,
    embeddings: np.ndarray,
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    device: str = "tpu",
    callback: Optional[Callable[[int, np.ndarray], None]] = None,
    whiten: bool = True,
) -> np.ndarray:
    """Accelerator propagation (name kept for reference API parity,
    pycleora/__init__.py:684-739).  Here every propagate already runs on the
    TPU; this wrapper iterates from caller-supplied embeddings."""
    _validate_propagation(propagation)
    if normalization not in ("l2", "l1", "none"):
        raise ValueError(
            "GPU propagation supports 'l2', 'l1', or 'none' normalization. "
            f"Got: '{normalization}'"
        )
    return embed(
        graph,
        num_iterations=num_iterations,
        propagation=propagation,
        normalization=normalization,
        initial_embeddings=np.asarray(embeddings, dtype=np.float32),
        callback=callback,
        whiten=whiten,
    )


propagate_tpu = propagate_gpu


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a_flat = np.asarray(a).flatten()
    b_flat = np.asarray(b).flatten()
    dot = np.dot(a_flat, b_flat)
    norm_a = np.linalg.norm(a_flat)
    norm_b = np.linalg.norm(b_flat)
    if norm_a == 0 or norm_b == 0:
        return 0.0
    return float(dot / (norm_a * norm_b))


def find_most_similar(
    graph: SparseMatrix,
    embeddings: np.ndarray,
    query_entity: str,
    top_k: int = 10,
    exclude_self: bool = True,
) -> List[Dict]:
    query_idx = graph.get_entity_index(query_entity)
    query_vec = embeddings[query_idx]

    norms = np.linalg.norm(embeddings, axis=1, keepdims=True)
    normalized = embeddings / np.maximum(norms, 1e-10)
    query_norm = query_vec / max(np.linalg.norm(query_vec), 1e-10)
    similarities = normalized @ query_norm

    if exclude_self:
        similarities[query_idx] = -1.0

    top_indices = np.argsort(similarities)[::-1][:top_k]
    return [
        {
            "entity_id": graph.entity_ids[idx],
            "index": int(idx),
            "similarity": float(similarities[idx]),
        }
        for idx in top_indices
    ]


def embed_edge_features(
    graph: SparseMatrix,
    edge_features: Dict[str, np.ndarray],
    feature_dim: int = DEFAULT_FEATURE_DIM,
    num_iterations: int = DEFAULT_NUM_ITERATIONS,
    propagation: str = "left",
    normalization: str = "l2",
    combine: str = "concat",
    num_workers: Optional[int] = None,
    whiten: bool = True,
) -> np.ndarray:
    """Structural + edge-feature embeddings (parity: pycleora/__init__.py:784-852)."""
    _validate_propagation(propagation)

    struct_emb = embed(
        graph, feature_dim=feature_dim, num_iterations=num_iterations,
        propagation=propagation, normalization=normalization,
        num_workers=num_workers, whiten=whiten,
    )
    if not edge_features:
        return struct_emb

    sample_feat = next(iter(edge_features.values()))
    edge_feat_dim = len(sample_feat)
    n = graph.num_entities
    index_map = graph._index_map  # cached on the graph; O(n) once, not per call

    node_feats = np.zeros((n, edge_feat_dim), dtype=np.float64)
    node_counts = np.zeros(n, dtype=np.float64)
    for edge_key, feat in edge_features.items():
        parts = edge_key.strip().split()
        if len(parts) == 2:
            ia = index_map.get(parts[0])
            ib = index_map.get(parts[1])
            if ia is not None and ib is not None:
                feat_arr = np.array(feat, dtype=np.float64)
                node_feats[ia] += feat_arr
                node_feats[ib] += feat_arr
                node_counts[ia] += 1
                node_counts[ib] += 1
    node_feats /= np.maximum(node_counts, 1.0)[:, None]

    data = graph.data
    coo_rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(data.indptr))
    base_vals = data.sym_vals if propagation == "symmetric" else data.left_vals
    edge_emb = _propagate_custom_coo(
        graph, coo_rows, data.indices, base_vals, edge_feat_dim, num_iterations,
        "l2", whiten, 0, init=node_feats.astype(np.float32),
    )

    if combine == "concat":
        return np.concatenate([struct_emb, edge_emb], axis=1)
    if combine == "mean":
        min_dim = min(struct_emb.shape[1], edge_emb.shape[1])
        return (struct_emb[:, :min_dim] + edge_emb[:, :min_dim]) / 2.0
    if combine == "edge_only":
        return edge_emb
    raise ValueError(
        f"Unknown combine mode: '{combine}'. Use 'concat', 'mean', or 'edge_only'."
    )


class CleoraEmbedder:
    """sklearn-style wrapper (parity: pycleora/__init__.py:855-939)."""

    def __init__(
        self,
        feature_dim: int = DEFAULT_FEATURE_DIM,
        num_iterations: int = DEFAULT_NUM_ITERATIONS,
        propagation: str = "left",
        normalization: str = "l2",
        columns: str = "complex::reflexive::node",
        seed: int = 0,
        hyperedge_trim_n: int = 16,
        num_workers: Optional[int] = None,
        whiten: bool = True,
    ):
        self.feature_dim = feature_dim
        self.num_iterations = num_iterations
        self.propagation = propagation
        self.normalization = normalization
        self.columns = columns
        self.seed = seed
        self.hyperedge_trim_n = hyperedge_trim_n
        self.num_workers = num_workers
        self.whiten = whiten
        self.graph_ = None
        self.embeddings_ = None
        self.entity_ids_ = None

    def fit(self, edges: List[str], y=None):
        self.graph_ = SparseMatrix.from_iterator(
            iter(edges), self.columns, self.hyperedge_trim_n, self.num_workers
        )
        self.embeddings_ = embed(
            self.graph_,
            feature_dim=self.feature_dim,
            num_iterations=self.num_iterations,
            propagation=self.propagation,
            normalization=self.normalization,
            seed=self.seed,
            num_workers=self.num_workers,
            whiten=self.whiten,
        )
        self.entity_ids_ = list(self.graph_.entity_ids)
        return self

    def transform(self, edges: Optional[List[str]] = None) -> np.ndarray:
        if self.embeddings_ is None:
            raise RuntimeError("Call fit() before transform()")
        if edges is None:
            return self.embeddings_
        index_map = self.graph_._index_map  # cached on the fitted graph
        seen = set()
        ordered_indices = []
        for edge in edges:
            for ent in edge.strip().split():
                if ent not in seen:
                    idx = index_map.get(ent)
                    if idx is not None:
                        seen.add(ent)
                        ordered_indices.append(idx)
        if not ordered_indices:
            raise ValueError(
                "None of the entities in edges were found in the fitted graph"
            )
        return self.embeddings_[ordered_indices]

    def fit_transform(self, edges: List[str], y=None) -> np.ndarray:
        return self.fit(edges, y).transform()

    def get_params(self, deep=True) -> Dict:
        return {
            "feature_dim": self.feature_dim,
            "num_iterations": self.num_iterations,
            "propagation": self.propagation,
            "normalization": self.normalization,
            "columns": self.columns,
            "seed": self.seed,
            "hyperedge_trim_n": self.hyperedge_trim_n,
            "num_workers": self.num_workers,
            "whiten": self.whiten,
        }

    def set_params(self, **params):
        for key, value in params.items():
            if hasattr(self, key):
                setattr(self, key, value)
            else:
                raise ValueError(f"Invalid parameter: {key}")
        return self


def _normalize(embeddings: np.ndarray, method: str) -> np.ndarray:
    """Host normalization (parity: pycleora/__init__.py:942-960)."""
    if method == "l2":
        norms = np.linalg.norm(embeddings, ord=2, axis=-1, keepdims=True)
        return embeddings / np.maximum(norms, 1e-10)
    if method == "l1":
        norms = np.linalg.norm(embeddings, ord=1, axis=-1, keepdims=True)
        return embeddings / np.maximum(norms, 1e-10)
    if method == "spectral":
        norms = np.linalg.norm(embeddings, ord=2, axis=-1, keepdims=True)
        normalized = embeddings / np.maximum(norms, 1e-10)
        u, s, vt = np.linalg.svd(normalized, full_matrices=False)
        return u * s
    if method == "none":
        return embeddings
    raise ValueError(
        f"Unknown normalization method: {method}. Use 'l2', 'l1', 'spectral', or 'none'."
    )


def _postprocess_iteration(
    embeddings: np.ndarray, normalization: str, whiten: bool
) -> np.ndarray:
    embeddings = _normalize(embeddings, normalization)
    if whiten:
        embeddings = whiten_embeddings(embeddings)
    return embeddings


def _compute_rmse(current: np.ndarray, previous: np.ndarray) -> float:
    diff = current.astype(np.float64, copy=False) - previous.astype(np.float64, copy=False)
    return float(np.sqrt(np.mean(diff * diff)))
