"""Fused on-device embedding iteration loops.

Reference semantics: ``embed_full`` / ``embed_full_with_convergence``
(/root/reference/src/embedding.rs:106-188) — per iteration:
SpMM propagate → optional residual mix ((1-w)·y + w·x when 0<w<1) →
L2 row-normalize, double-buffered.  The convergence variant checks
RMSE(new, old) = sqrt(Σδ²/(N·D)) < threshold after the first iteration.

The whole multi-iteration loop is one jitted ``lax.fori_loop`` /
``lax.while_loop`` — a single dispatch for 40 iterations, zero host↔device
round-trips (the reference pays one Python↔Rust crossing per call; its fast
path is one crossing total, matched here).

The whiten-enabled loop (the reference's default Python path,
pycleora/__init__.py:109-126) fuses propagate → normalize → whiten per
iteration, all on device including the D×D eigh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .normalize import l2_normalize, normalize
from .spmm import spmm_inner
from .spmm_ell import EllPlan
from .whiten import whiten


def _to_relabeled(rows, x0):
    """Sliced-ELL layouts keep the state in degree-relabeled row space for
    the whole loop (all per-iteration ops are permutation-invariant); the
    wrappers permute once on entry and once on exit."""
    if isinstance(rows, EllPlan):
        return jnp.take(x0, rows.order, axis=0)
    return x0


def _from_relabeled(rows, x):
    if isinstance(rows, EllPlan):
        return jnp.take(x, rows.rank, axis=0)
    return x


def effective_residual_weight(w: float, rust_fast_semantics: bool) -> float:
    """The reference has TWO residual behaviors: its Rust fast path applies
    the mix only for 0 < w < 1 (src/embedding.rs:121-129), while its Python
    slow path — taken whenever whitening / a callback / non-l2 normalization
    / initial embeddings are in play (pycleora/__init__.py:70-96) — applies
    it for ANY w > 0.  Callers pass the semantics their entry point mirrors;
    the loop then applies any non-zero weight it receives."""
    w = float(w)
    if w <= 0.0 or (rust_fast_semantics and w >= 1.0):
        return 0.0
    return w


def _step(rows, cols, vals, x, n_rows, residual_weight, normalization, do_whiten):
    # bf16 storage mode: propagate/normalize/whiten compute in f32 (spmm_inner
    # promotes), then the state is stored back at the x dtype
    y = spmm_inner(rows, cols, vals, x, n_rows)
    if residual_weight > 0.0:  # callers pre-clamp via effective_residual_weight
        y = (1.0 - residual_weight) * y + residual_weight * x.astype(y.dtype)
    y = normalize(y, normalization)
    if do_whiten:
        if isinstance(rows, EllPlan) and rows.valid is not None:
            # canonical-shape plan: padded state rows are excluded from the
            # whitening statistics and forced back to zero (spmm_ell.py)
            y = whiten(y, mask=rows.valid, count=rows.count)
        else:
            y = whiten(y)
    return y.astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_rows", "num_iterations", "residual_weight", "normalization", "do_whiten",
    ),
)
def embed_loop(rows, cols, vals, x0, *, n_rows, num_iterations,
               residual_weight=0.0, normalization="l2", do_whiten=False):
    """num_iterations × [SpMM → residual → normalize → (whiten)] in one jit."""

    def body(_, x):
        return _step(rows, cols, vals, x, n_rows, residual_weight, normalization,
                     do_whiten)

    out = lax.fori_loop(0, num_iterations, body, _to_relabeled(rows, x0))
    return _from_relabeled(rows, out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_rows", "max_iterations", "residual_weight", "normalization", "do_whiten",
    ),
)
def embed_loop_convergence(rows, cols, vals, x0, *, n_rows, max_iterations,
                           residual_weight=0.0, convergence_threshold=0.0,
                           normalization="l2", do_whiten=False):
    """Iterate until RMSE(x_new, x_old) < threshold (checked from iter 1 on).

    Returns (embeddings, actual_iterations).  Mirrors
    embed_full_with_convergence (src/embedding.rs:138-188): the check runs
    only when iter > 0, and on early stop actual_iterations = iter + 1.
    """
    nd = x0.shape[0] * x0.shape[1]
    if isinstance(rows, EllPlan) and rows.count is not None:
        # canonical-shape plan: padded rows stay exactly zero (zero diff),
        # but the RMSE denominator must count only the real rows
        nd = rows.count * x0.shape[1]

    def cond(state):
        i, _, done = state
        return jnp.logical_and(i < max_iterations, jnp.logical_not(done))

    def body(state):
        i, x, _ = state
        y = _step(rows, cols, vals, x, n_rows, residual_weight, normalization,
                  do_whiten)
        diff = y - x
        rmse = jnp.sqrt(jnp.sum(diff * diff) / nd)
        done = jnp.logical_and(i > 0, rmse < convergence_threshold)
        return (i + 1, y, done)

    i, x, _ = lax.while_loop(
        cond, body, (jnp.int32(0), _to_relabeled(rows, x0), jnp.bool_(False))
    )
    return _from_relabeled(rows, x), i


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_rows", "residual_weight", "normalization", "do_whiten", "relabeled",
    ),
)
def embed_step(rows, cols, vals, x, *, n_rows, residual_weight=0.0,
               normalization="l2", do_whiten=False, relabeled=False):
    """Single jitted iteration (used when a per-iteration callback is set).

    With ``relabeled=True`` the caller keeps ``x`` in the layout's
    degree-relabeled row space for the whole loop (permuting once on entry
    and once per host-visible view via :func:`to_layout_order` /
    :func:`from_layout_order`) instead of paying two O(N·D) permutes here
    on every iteration.
    """
    if relabeled:
        return _step(rows, cols, vals, x, n_rows,
                     residual_weight, normalization, do_whiten)
    y = _step(rows, cols, vals, _to_relabeled(rows, x), n_rows,
              residual_weight, normalization, do_whiten)
    return _from_relabeled(rows, y)


@jax.jit
def to_layout_order(rows, x):
    """Permute state into the layout's relabeled row space (identity for
    non-ELL layouts)."""
    return _to_relabeled(rows, x)


@jax.jit
def from_layout_order(rows, x):
    """Permute relabeled state back to original entity row order."""
    return _from_relabeled(rows, x)
