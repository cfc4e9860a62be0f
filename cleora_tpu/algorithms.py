"""Sibling embedding algorithms on the same sparse-transition substrate.

Semantics parity with the reference (/root/reference/pycleora/algorithms.py):
ProNE (Chebyshev filters of the normalized Laplacian), RandNE (iterated random
projection), HOPE (Katz proximity SVD), NetMF (log-PMI matrix factorization),
GraRep (k-step log-transition SVDs), DeepWalk/Node2Vec (biased walks → PMI →
SVD).  All default paths compute in float64 and L2-normalize to float32, like
the reference.

TPU-first additions: the SpMM-heavy algorithms (ProNE, RandNE) accept
``backend="device"`` to run their propagation loops on the TPU in float32 via
the shared COO SpMM kernel — these scale to graphs the host f64 path cannot
hold.  HOPE also accepts ``backend="device"``: a matrix-free randomized SVD
of the Katz operator (the (I−βA)^{-1}−I inverse applied as a Neumann series
of SpMMs) that never materializes the n×n proximity matrix the host path —
and the reference — must build.  NetMF/GraRep apply an elementwise log to a
dense n×n matrix by construction, so their device backends are dense: the
transition powers become full-precision MXU matmuls and the factorization a
randomized SVD, gated by an HBM fit check (≈45k rows on a 16 GiB chip) with
the unbounded f64 host path as the documented fallback.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _adjacency(graph):
    """Left-Markov CSR as float64 scipy (reference algorithms.py:6-19)."""
    from scipy.sparse import csr_matrix

    rows, cols, vals, n, _ = graph.to_sparse_csr()
    return csr_matrix(
        (vals.astype(np.float64), (rows.astype(np.int32), cols.astype(np.int32))),
        shape=(n, n),
    )


def _sym_normalized(A):
    """D^-1/2 A D^-1/2 and the degree vector."""
    from scipy.sparse import diags

    degrees = np.maximum(np.asarray(A.sum(axis=1)).ravel(), 1e-10)
    D_inv_sqrt = diags(1.0 / np.sqrt(degrees))
    return D_inv_sqrt @ A @ D_inv_sqrt, degrees


def _dense(x):
    return x.toarray() if hasattr(x, "toarray") else np.asarray(x)


def _finalize(result: np.ndarray, feature_dim: int) -> np.ndarray:
    """Pad/truncate to feature_dim and L2-normalize to float32."""
    n = result.shape[0]
    if result.shape[1] > feature_dim:
        result = result[:, :feature_dim]
    elif result.shape[1] < feature_dim:
        result = np.concatenate(
            [result, np.zeros((n, feature_dim - result.shape[1]), result.dtype)],
            axis=1,
        )
    norms = np.maximum(np.linalg.norm(result, axis=1, keepdims=True), 1e-10)
    return (result / norms).astype(np.float32)


def _fetch_f64(dev) -> np.ndarray:
    """Device→host fetch of an algorithm result in bounded row chunks
    (CLEORA_TPU_FETCH_MB), then float64.  One multi-hundred-MB fetch can
    stall a tunneled runtime where chunked transfers stream fine — the
    same pattern the sharded-embed outputs use (parallel/state.py)."""
    from .parallel.state import _fetch_shard

    return _fetch_shard(dev).astype(np.float64)


def _svd_sqrt(M: np.ndarray, k: int) -> np.ndarray:
    """U_k · sqrt(S_k) — the shared factorization epilogue."""
    u, s, _ = np.linalg.svd(M, full_matrices=False)
    k = min(k, u.shape[1])
    return u[:, :k] * np.sqrt(np.maximum(s[:k], 0))


# ------------------------------------------------------------------- device
def _device_layout(rows, cols, vals, n: int, d: int):
    """Device SpMM layout for the algorithm loops: the production sliced-ELL
    plan (ops/spmm_ell.py — dense fixed-width gather+reduce, no HBM edge
    intermediate) with the flat padded-COO fallback when ELL padding is
    pathological.  Returns (layout_args, order, rank): ``layout_args``
    unpacks into spmm_inner's (rows, cols, vals); with an ELL plan the state
    must live in relabeled row space — permute in with ``x[order]``, out
    with ``y[rank]`` (both None for the COO fallback; all the algorithm
    recurrences are row-permutation-invariant)."""
    import jax.numpy as jnp

    from ._util import maybe_enable_compile_cache
    from .ops.spmm import pad_coo
    from .ops.spmm_ell import plan_ell

    maybe_enable_compile_cache()
    plan = plan_ell(rows, cols, vals, n, d=d)
    if plan is not None:
        return (plan.device(), (), ()), plan.order, plan.rank
    prow, pcol, pval = pad_coo(rows, cols, vals, n)
    return (
        (jnp.asarray(prow), jnp.asarray(pcol), jnp.asarray(pval)),
        None, None,
    )


def _weighted_sum_jit():
    """Module-level jitted Σ_i w_i·N^i·x0 (one trace per shape, not per
    embed_randne call)."""
    global _WEIGHTED_SUM_FN
    if _WEIGHTED_SUM_FN is None:
        import functools

        import jax

        from .ops.spmm import spmm_inner

        @functools.partial(jax.jit, static_argnames=("n_rows", "steps"))
        def run(rows, cols, vals, x0, w, *, n_rows, steps):
            def body(carry, wi):
                acc, x = carry
                x = spmm_inner(rows, cols, vals, x, n_rows)
                return (acc + wi * x, x), None

            (acc, _), _ = jax.lax.scan(
                body, (w[0] * x0, x0), w[1 : steps + 1]
            )
            return acc

        _WEIGHTED_SUM_FN = run
    return _WEIGHTED_SUM_FN


_WEIGHTED_SUM_FN = None


def _device_weighted_sum_core(graph, R: np.ndarray, weights: List[float],
                              sym_norm: bool):
    """Device half of :func:`_device_spmm_weighted_sum`: returns
    (device_array, rank) with the result still on device in the layout's
    relabeled row space — probes time this with a scalar fetch."""
    import jax.numpy as jnp

    rows, cols, vals, n, _ = graph.to_sparse_csr()
    from .ops.memory import check_device_fit

    # the scan carries (acc, x) plus the SpMM output — the embed-loop
    # estimate (4 N·D f32 arrays + edges) upper-bounds it
    check_device_fit(n, R.shape[1], rows.shape[0])
    vals = vals.astype(np.float64)
    if sym_norm:
        deg = np.zeros(n, dtype=np.float64)
        np.add.at(deg, rows.astype(np.int64), vals)
        d_inv_sqrt = 1.0 / np.sqrt(np.maximum(deg, 1e-10))
        vals = d_inv_sqrt[rows.astype(np.int64)] * vals * d_inv_sqrt[
            cols.astype(np.int64)
        ]
    layout, order, rank = _device_layout(
        rows.astype(np.int32), cols.astype(np.int32),
        vals.astype(np.float32), n, R.shape[1],
    )
    w = jnp.asarray(np.asarray(weights, dtype=np.float32))
    x0 = R.astype(np.float32)
    if order is not None:
        x0 = x0[order]

    return _weighted_sum_jit()(
        *layout, jnp.asarray(x0), w, n_rows=n, steps=len(weights) - 1
    ), rank


def _device_spmm_weighted_sum(graph, R: np.ndarray, weights: List[float],
                              sym_norm: bool) -> np.ndarray:
    """Σ_i weights[i] · N^i · R on the TPU (N = adjacency, optionally
    D^-1/2 A D^-1/2), one fused jit over the production SpMM layout."""
    dev, rank = _device_weighted_sum_core(graph, R, weights, sym_norm)
    out = _fetch_f64(dev)
    return out[rank] if rank is not None else out


def _cheb_jit():
    """Module-level jitted Chebyshev filter (one trace per shape, not per
    embed_prone call; theta/mu are traced scalars so hyperparameter sweeps
    reuse the compiled program)."""
    global _CHEB_FN
    if _CHEB_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        from .ops.spmm import spmm_inner

        @functools.partial(jax.jit, static_argnames=("n_rows", "kmax"))
        def cheb(rows, cols, vals, R, theta, mu, *, n_rows, kmax):
            def lmul(x):
                return x - spmm_inner(rows, cols, vals, x, n_rows)

            U = R
            prev = R
            curr = lmul(R)

            def body(k, state):
                U, prev, curr = state
                nxt = 2.0 * lmul(curr) - prev
                coeff = jnp.exp(-theta * k.astype(jnp.float32)) * mu
                return (U + coeff * nxt, curr, nxt)

            U, _, _ = jax.lax.fori_loop(2, kmax, body, (U, prev, curr))
            return U

        _CHEB_FN = cheb
    return _CHEB_FN


_CHEB_FN = None


def _prone_chebyshev_core(graph, feature_dim: int, mu: float, theta: float,
                          seed: int):
    """Device half of ProNE: Chebyshev filtering T_k(L)·R on the production
    SpMM layout (L@X = X - N@X, N = D^-1/2 A D^-1/2).  Returns
    (device_array, rank) with the result still on device in the layout's
    relabeled row space — probes time this with a scalar fetch."""
    import jax.numpy as jnp

    from .ops.memory import check_device_fit

    n = graph.num_entities
    rows, cols, vals, _, _ = graph.to_sparse_csr()
    # Chebyshev keeps (U, prev, curr) + the SpMM output — bounded by
    # the embed-loop estimate (4 N·D f32 arrays + edges)
    check_device_fit(n, feature_dim, rows.shape[0])
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, rows.astype(np.int64), vals.astype(np.float64))
    dis = 1.0 / np.sqrt(np.maximum(deg, 1e-10))
    nvals = (
        dis[rows.astype(np.int64)] * vals.astype(np.float64)
        * dis[cols.astype(np.int64)]
    ).astype(np.float32)
    layout, order, rank = _device_layout(
        rows.astype(np.int32), cols.astype(np.int32), nvals, n, feature_dim,
    )

    rng = np.random.default_rng(seed)
    R = rng.standard_normal((n, feature_dim)).astype(np.float32)
    if order is not None:
        R = R[order]

    return _cheb_jit()(
        *layout, jnp.asarray(R), jnp.float32(theta), jnp.float32(mu),
        n_rows=n, kmax=min(10, n),
    ), rank


def _hope_rsvd_jit():
    """Module-level jitted matrix-free randomized SVD of the Katz operator
    M = (I − βA)^{-1} − I = Σ_{k≥1} β^k A^k (Neumann series, each term one
    SpMM on the production layout).  Subspace iteration with QR
    re-orthonormalization; the small SVD runs on the (r, n) projection.
    Everything stays on device — only the final (n, 2k) embedding leaves."""
    global _HOPE_RSVD_FN
    if _HOPE_RSVD_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        from .ops.spmm import spmm_inner

        def apply_layout(layout, order, rank, x, n_rows):
            # ELL layouts compute P·A·Pᵀ in relabeled row space; wrap with
            # the permutation gathers so M and Mᵀ compose in ORIGINAL space
            # (they carry different relabelings).
            if order is not None:
                x = jnp.take(x, order, axis=0)
            y = spmm_inner(*layout, x, n_rows)
            return jnp.take(y, rank, axis=0) if rank is not None else y

        def katz(layout, order, rank, x, beta, n_rows, terms):
            def body(carry, _):
                acc, cur = carry
                cur = beta * apply_layout(layout, order, rank, cur, n_rows)
                return (acc + cur, cur), None

            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros_like(x), x), None, length=terms
            )
            return acc

        @functools.partial(
            jax.jit, static_argnames=("n_rows", "terms", "k", "power_iters")
        )
        def rsvd(layA, ordA, rnkA, layT, ordT, rnkT, omega, beta, *,
                 n_rows, terms, k, power_iters):
            M = lambda x: katz(layA, ordA, rnkA, x, beta, n_rows, terms)
            MT = lambda x: katz(layT, ordT, rnkT, x, beta, n_rows, terms)
            Y = M(omega)
            for _ in range(power_iters):  # static unroll
                Q, _ = jnp.linalg.qr(Y)
                Y = M(MT(Q))
            Q, _ = jnp.linalg.qr(Y)
            C = MT(Q)  # (n, r); Cᵀ = Qᵀ·M — the projected operator
            Ub, s, Vt = jnp.linalg.svd(C.T, full_matrices=False)
            su = jnp.sqrt(jnp.maximum(s[:k], 0.0))
            return jnp.concatenate(
                [(Q @ Ub[:, :k]) * su, Vt[:k].T * su], axis=1
            )

        _HOPE_RSVD_FN = rsvd
    return _HOPE_RSVD_FN


_HOPE_RSVD_FN = None


def _hope_device(graph, feature_dim: int, beta: float, seed: int,
                 oversample: int, power_iters: int) -> np.ndarray:
    """Device half of HOPE: plans A and Aᵀ layouts, sizes the Neumann
    series from the ∞-norm bound, and runs the randomized SVD on device."""
    import jax.numpy as jnp

    from .ops.memory import check_device_fit

    rows, cols, vals, n, _ = graph.to_sparse_csr()
    rows = rows.astype(np.int32)
    cols = cols.astype(np.int32)
    vals = vals.astype(np.float32)

    row_sums = np.zeros(n, dtype=np.float64)
    np.add.at(row_sums, rows.astype(np.int64), np.abs(vals.astype(np.float64)))
    beta_norm = beta * float(row_sums.max(initial=0.0))
    if beta_norm >= 1.0:
        raise ValueError(
            f"backend='device' needs beta * ||A||_inf < 1 for the Neumann "
            f"series to converge (got {beta_norm:.3f}); use backend='host' "
            f"or a smaller beta"
        )
    # β^terms ≤ 1e-12 → truncation error below f32 resolution
    terms = (
        int(np.ceil(np.log(1e-12) / np.log(beta_norm))) if beta_norm > 0 else 1
    )
    terms = max(2, min(terms, 128))

    k = min(feature_dim // 2, n - 1)
    r = min(n, k + oversample)
    # live set ≈ Y/Q/C + the scan carry: ~6 (n, r) f32 buffers
    check_device_fit(n, max(1, (3 * r) // 2), rows.shape[0])

    layA, ordA, rnkA = _device_layout(rows, cols, vals, n, r)
    t_order = np.argsort(cols, kind="stable")
    layT, ordT, rnkT = _device_layout(
        cols[t_order], rows[t_order], vals[t_order], n, r
    )

    rng = np.random.default_rng(seed)
    omega = jnp.asarray(rng.standard_normal((n, r)).astype(np.float32))
    ordA = jnp.asarray(ordA) if ordA is not None else None
    rnkA = jnp.asarray(rnkA) if rnkA is not None else None
    ordT = jnp.asarray(ordT) if ordT is not None else None
    rnkT = jnp.asarray(rnkT) if rnkT is not None else None

    out = _hope_rsvd_jit()(
        layA, ordA, rnkA, layT, ordT, rnkT, omega, jnp.float32(beta),
        n_rows=n, terms=terms, k=k, power_iters=power_iters,
    )
    return _fetch_f64(out)


# --------------------------------------- device dense log-factorization core
def _rsvd_u_sqrt(M, omega, k: int, power_iters: int):
    """Device twin of ``_svd_sqrt``: U_k·√S_k of a dense matrix via
    randomized subspace iteration (traced under jit; exact when omega has
    ≥ n columns).  All matmuls run at HIGHEST precision — the factorization
    compares against an f64 host path."""
    import jax.numpy as jnp
    from jax import lax

    hp = lax.Precision.HIGHEST
    Y = jnp.dot(M, omega, precision=hp)
    for _ in range(power_iters):  # static unroll
        Q, _ = jnp.linalg.qr(Y)
        Y = jnp.dot(M, jnp.dot(M.T, Q, precision=hp), precision=hp)
    Q, _ = jnp.linalg.qr(Y)
    C = jnp.dot(M.T, Q, precision=hp)  # (n, r);  Cᵀ = Qᵀ·M
    # M ≈ Q·Qᵀ·M = (Q·Ub)·S·Vt, so the left singular vectors lift through Q
    Ub, s, _ = jnp.linalg.svd(C.T, full_matrices=False)
    su = jnp.sqrt(jnp.maximum(s[:k], 0.0))
    return jnp.dot(Q, Ub[:, :k], precision=hp) * su


def _dense_markov(rows, cols, vals, n: int):
    """Dense left-Markov transition P = D⁻¹A scattered from COO, plus the
    degree vector and volume (device, f32)."""
    import jax.numpy as jnp

    A = jnp.zeros((n, n), jnp.float32).at[rows, cols].add(vals)
    deg = jnp.maximum(A.sum(axis=1), 1e-10)
    return A / deg[:, None], deg, A.sum()


def _netmf_dense_jit():
    """Module-level jitted device NetMF: dense transition powers on the MXU,
    log-PMI clip, randomized SVD (reference algorithms.py:152-198 semantics
    with the full SVD replaced by a sketch of width r ≥ k)."""
    global _NETMF_FN
    if _NETMF_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(
            jax.jit, static_argnames=("n", "window", "k", "power_iters")
        )
        def netmf(rows, cols, vals, omega, neg, *, n, window, k, power_iters):
            hp = jax.lax.Precision.HIGHEST
            P, deg, vol = _dense_markov(rows, cols, vals, n)
            acc, Pk = P, P
            for _ in range(window - 1):  # static unroll, one MXU matmul each
                Pk = jnp.dot(Pk, P, precision=hp)
                acc = acc + Pk
            Mbar = acc / window
            M = (vol / neg) * (Mbar / deg[:, None]) * deg[None, :]
            M_log = jnp.log(jnp.maximum(M, 1.0))
            return _rsvd_u_sqrt(M_log, omega, k, power_iters)

        _NETMF_FN = netmf
    return _NETMF_FN


_NETMF_FN = None


def _grarep_dense_jit():
    """Module-level jitted device GraRep: per-step dense P^k on the MXU,
    log clip, per-step randomized SVD (reference algorithms.py:201-245)."""
    global _GRAREP_FN
    if _GRAREP_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(
            jax.jit, static_argnames=("n", "max_step", "k", "power_iters")
        )
        def grarep(rows, cols, vals, omega, *, n, max_step, k, power_iters):
            hp = jax.lax.Precision.HIGHEST
            P, _, _ = _dense_markov(rows, cols, vals, n)
            embs = []
            Pk = P
            for step in range(max_step):  # static unroll
                M_log = (
                    jnp.log(jnp.maximum(Pk, 1e-10)) - jnp.log(jnp.float32(1e-10))
                )
                embs.append(_rsvd_u_sqrt(M_log, omega[step], k, power_iters))
                if step + 1 < max_step:
                    Pk = jnp.dot(Pk, P, precision=hp)
            return jnp.concatenate(embs, axis=1)

        _GRAREP_FN = grarep
    return _GRAREP_FN


_GRAREP_FN = None


def _check_dense_fit(n: int, n_bufs: int = 6, limit=None):
    """The dense device factorizations hold ~n_bufs (n, n) f32 buffers live
    (A/P, P^k, accumulator, M_log, rsvd temporaries).  Refuse shapes that
    cannot fit rather than dying in the allocator.  ``limit`` overrides
    the live device budget (the capacity planner evaluates this gate for
    hypothetical chips)."""
    import os

    from .ops import memory

    if os.environ.get("CLEORA_TPU_SKIP_FIT_CHECK") == "1":
        return
    if limit is None:
        limit = memory.device_hbm_limit()
    if limit is None:
        return
    need = n_bufs * n * n * 4
    if need > int(limit * 0.9):
        gib = 1 << 30
        raise ValueError(
            f"backend='device' builds dense (n, n) transition powers: "
            f"n={n} needs ~{need / gib:.1f} GiB HBM (> {limit / gib:.1f} GiB "
            f"available). Use backend='host' (unbounded, f64) for graphs "
            f"this large."
        )


def _dense_fits(n: int, n_bufs: int = 6, limit=None) -> bool:
    """True when the dense (n, n) device factorization fits HBM."""
    try:
        _check_dense_fit(n, n_bufs, limit=limit)
        return True
    except ValueError:
        return False


def _coo_f32(graph):
    rows, cols, vals, n, _ = graph.to_sparse_csr()
    return (
        rows.astype(np.int32), cols.astype(np.int32),
        vals.astype(np.float32), n,
    )


# ------------------------- blocked (beyond-HBM) device log-factorizations
# VERDICT r2 #6: the elementwise log forces NetMF/GraRep into an explicit
# dense matrix, but only a ROW BLOCK of it needs to exist at a time.  Each
# block of M's rows is materialized on the fly — the transition-power walk
# S_t = E_b·P^t runs as Y_t = (Pᵀ)^t·E_bᵀ, i.e. T sliced-ELL SpMMs
# (ops/spmm_ell.py, the production dense-output kernel) at feature width b
# — then log/clip and the two randomized-SVD products are fused behind one
# MXU dot each.  HBM holds O(n·b), not O(n²), so the device path extends
# arbitrarily far past the dense gate; cost per full sweep over M is
# T·nnz·n/b gather-issues + n²·r MXU FLOPs.  Reference anchor: the host
# paths below (reference algorithms.py:152-245).
def _pt_ell_plan(rows, cols, vals, n: int):
    """Sliced-ELL plan of the TRANSPOSE transition operator Pᵀ (entries
    Pᵀ[j, i] = A[i, j]/deg[i]), plus deg and vol of A."""
    from .ops.spmm_ell import plan_ell

    deg64 = np.bincount(rows, weights=vals.astype(np.float64), minlength=n)
    vol = float(deg64.sum())
    deg = np.maximum(deg64, 1e-10).astype(np.float32)
    pt_rows = cols.astype(np.int64)
    pt_cols = rows.astype(np.int64)
    pt_vals = (vals / deg[rows]).astype(np.float32)
    o = np.argsort(pt_rows, kind="stable")
    plan = plan_ell(pt_rows[o], pt_cols[o], pt_vals[o], n, max_waste=4.0)
    if plan is None:  # _K_MAX virtual rows bound the waste; always planable
        plan = plan_ell(pt_rows[o], pt_cols[o], pt_vals[o], n, max_waste=1e12)
    return plan, deg, vol


def _auto_block_rows(n: int, r: int, limit=None) -> int:
    """Largest MXU-friendly block width whose O(n·b) working set (three
    (n, b) f32 buffers + rSVD (n, r) operands) fits half the chip."""
    from .ops import memory

    if limit is None:
        limit = memory.device_hbm_limit()
    if limit is None:
        b = 4096
    else:
        budget = int(limit * 0.5) - 6 * n * r * 4
        b = budget // (16 * n)
    b = min(b, 4096, n)
    return int(max(128, (b // 128) * 128)) if b >= 128 else int(max(8, b))


_NETMF_BLOCK_FN = None


def _netmf_block_jit():
    """Per-block NetMF kernel: walk the window of transition powers for one
    row block, scale to M = (vol/neg)·D⁻¹·mean(P^t)·D, log-clip at 1, and
    return BOTH randomized-SVD products for the streaming driver:
    (Lᵀ·W, L·V[start:start+b]) with L the (n, b) column-major block of
    M_log.  Rows of L live in the plan's RELABELED space; the driver keeps
    every (n, r) operand in that space too."""
    global _NETMF_BLOCK_FN
    if _NETMF_BLOCK_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        from .ops.spmm_ell import spmm_ell

        @functools.partial(jax.jit, static_argnames=("window", "b"))
        def block(plan, deg_rel, deg_orig, scale, start, W, Vfull, *,
                  window, b):
            hp = jax.lax.Precision.HIGHEST
            n = deg_rel.shape[0]
            iota = jnp.arange(b, dtype=jnp.int32)
            idx = start + iota
            valid = (idx < n).astype(jnp.float32)  # padded tail cols stay 0
            safe = jnp.minimum(idx, n - 1)
            y = jnp.zeros((n, b), jnp.float32).at[plan.rank[safe], iota].add(
                valid
            )
            acc = jnp.zeros((n, b), jnp.float32)
            for _ in range(window):  # static unroll, like the dense path
                y = spmm_ell(plan, y)
                acc = acc + y
            s_col = scale / deg_orig[safe]
            L = jnp.log(
                jnp.maximum(acc * deg_rel[:, None] * s_col[None, :], 1.0)
            )
            V = jax.lax.dynamic_slice(Vfull, (start, 0),
                                      (b, Vfull.shape[1]))
            return (jnp.dot(L.T, W, precision=hp),
                    jnp.dot(L, V, precision=hp))

        _NETMF_BLOCK_FN = block
    return _NETMF_BLOCK_FN


_GRAREP_BLOCK_FN = None


def _grarep_block_jit():
    """Per-block GraRep kernel: one walk serves ALL steps — at each power
    P^s the step's log block L_s = log(max(P^s, 1e-10)) − log(1e-10) feeds
    that step's pair of randomized-SVD products (per-step W/V operands)."""
    global _GRAREP_BLOCK_FN
    if _GRAREP_BLOCK_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        from .ops.spmm_ell import spmm_ell

        @functools.partial(jax.jit, static_argnames=("max_step", "b"))
        def block(plan, start, W, Vfull, *, max_step, b):
            hp = jax.lax.Precision.HIGHEST
            n = plan.rank.shape[0]
            iota = jnp.arange(b, dtype=jnp.int32)
            idx = start + iota
            valid = (idx < n).astype(jnp.float32)
            safe = jnp.minimum(idx, n - 1)
            y = jnp.zeros((n, b), jnp.float32).at[plan.rank[safe], iota].add(
                valid
            )
            brs, nrs = [], []
            for s in range(max_step):  # static unroll
                y = spmm_ell(plan, y)
                # padded tail cols hold y == 0 → L == 0, no masking needed
                L = (jnp.log(jnp.maximum(y, 1e-10))
                     - jnp.log(jnp.float32(1e-10)))
                V = jax.lax.dynamic_slice(Vfull[s], (start, 0),
                                          (b, Vfull.shape[2]))
                brs.append(jnp.dot(L.T, W[s], precision=hp))
                nrs.append(jnp.dot(L, V, precision=hp))
            return jnp.stack(brs), jnp.stack(nrs)

        _GRAREP_BLOCK_FN = block
    return _GRAREP_BLOCK_FN


def _blocked_u_sqrt(pass_fn, k: int, power_iters: int, omega):
    """Streamed twin of :func:`_rsvd_u_sqrt`: ``pass_fn(W, V)`` sweeps the
    blocks once and returns (M·W, Mᵀ·V) at (n, r).  Identical math, one
    sweep per product (2 + 2·power_iters sweeps total)."""
    import jax.numpy as jnp

    zeros = jnp.zeros_like(omega)
    Y, _ = pass_fn(omega, zeros)
    for _ in range(power_iters):
        Q, _ = jnp.linalg.qr(Y)
        _, G = pass_fn(zeros, Q)
        Y, _ = pass_fn(G, zeros)
    Q, _ = jnp.linalg.qr(Y)
    _, C = pass_fn(zeros, Q)  # (n, r);  Cᵀ = Qᵀ·M
    Ub, s, _ = jnp.linalg.svd(C.T, full_matrices=False)
    su = jnp.sqrt(jnp.maximum(s[:k], 0.0))
    import jax

    return jnp.dot(Q, Ub[:, :k], precision=jax.lax.Precision.HIGHEST) * su

def _netmf_blocked_device(graph, feature_dim: int, window_size: int,
                          negative_samples: float, seed: int, oversample: int,
                          power_iters: int, block_rows=None) -> np.ndarray:
    import jax.numpy as jnp

    rows, cols, vals, n = _coo_f32(graph)
    plan, deg, vol = _pt_ell_plan(rows, cols, vals, n)
    k = min(feature_dim, n)
    r = min(n, k + oversample)
    b = int(block_rows) if block_rows else _auto_block_rows(n, r)
    b = max(1, min(b, n))
    n_pad = -(-n // b) * b
    window = max(1, window_size)

    rng = np.random.default_rng(seed)
    # same draws as the dense path, permuted once into relabeled row space
    # so the sketch Y = M·Ω matches the dense sketch exactly (j-sums are
    # permutation-invariant)
    omega = rng.standard_normal((n, r)).astype(np.float32)
    omega_rel = jnp.asarray(omega[plan.order])
    deg_rel = jnp.asarray(deg[plan.order])
    deg_orig = jnp.asarray(deg)
    scale = jnp.float32(vol / (negative_samples * window))
    plan_dev = plan.device()
    kernel = _netmf_block_jit()

    def pass_fn(W, V):
        Vp = jnp.zeros((n_pad, r), jnp.float32).at[:n].set(V)
        G = None
        pieces = []
        for start in range(0, n_pad, b):
            br, nr = kernel(plan_dev, deg_rel, deg_orig, scale,
                            jnp.int32(start), W, Vp, window=window, b=b)
            pieces.append(br)
            G = nr if G is None else G + nr
        Y = jnp.concatenate(pieces, axis=0)[:n] if len(pieces) > 1 \
            else pieces[0][:n]
        return Y, G

    out = _blocked_u_sqrt(pass_fn, k, power_iters, omega_rel)
    return _fetch_f64(out)


def _grarep_blocked_device(graph, feature_dim: int, max_step: int, seed: int,
                           oversample: int, power_iters: int,
                           block_rows=None) -> np.ndarray:
    import jax.numpy as jnp

    rows, cols, vals, n = _coo_f32(graph)
    plan, _, _ = _pt_ell_plan(rows, cols, vals, n)
    dim_per_step = max(feature_dim // max_step, 1)
    k = min(dim_per_step, n)
    r = min(n, k + oversample)
    b = int(block_rows) if block_rows else _auto_block_rows(n, r)
    b = max(1, min(b, n))
    n_pad = -(-n // b) * b

    rng = np.random.default_rng(seed)
    omega = rng.standard_normal((max_step, n, r)).astype(np.float32)
    omega_rel = jnp.asarray(omega[:, plan.order])
    plan_dev = plan.device()
    kernel = _grarep_block_jit()

    def pass_fn(W, V):
        # W, V: (max_step, n, r) stacks; one walk sweep serves every step
        Vp = jnp.zeros((max_step, n_pad, r), jnp.float32).at[:, :n].set(V)
        G = None
        pieces = []
        for start in range(0, n_pad, b):
            br, nr = kernel(plan_dev, jnp.int32(start), W, Vp,
                            max_step=max_step, b=b)
            pieces.append(br)
            G = nr if G is None else G + nr
        Y = jnp.concatenate(pieces, axis=1)[:, :n] if len(pieces) > 1 \
            else pieces[0][:, :n]
        return Y, G

    zeros = jnp.zeros_like(omega_rel)
    Y, _ = pass_fn(omega_rel, zeros)
    for _ in range(power_iters):
        Q = jnp.linalg.qr(Y)[0]
        _, G = pass_fn(zeros, Q)
        Y, _ = pass_fn(G, zeros)
    Q = jnp.linalg.qr(Y)[0]
    _, C = pass_fn(zeros, Q)
    import jax

    hp = jax.lax.Precision.HIGHEST
    embs = []
    for s in range(max_step):
        Ub, sv, _ = jnp.linalg.svd(C[s].T, full_matrices=False)
        su = jnp.sqrt(jnp.maximum(sv[:k], 0.0))
        embs.append(jnp.dot(Q[s], Ub[:, :k], precision=hp) * su)
    # the blocked driver exists precisely for large n, where this result
    # is the fetch big enough to stall a tunneled runtime — chunk it
    return _fetch_f64(jnp.concatenate(embs, axis=1))


def _netmf_device(graph, feature_dim: int, window_size: int,
                  negative_samples: float, seed: int, oversample: int,
                  power_iters: int, block_rows=None) -> np.ndarray:
    import jax.numpy as jnp

    rows, cols, vals, n = _coo_f32(graph)
    if block_rows is not None or not _dense_fits(n):
        return _netmf_blocked_device(
            graph, feature_dim, window_size, negative_samples, seed,
            oversample, power_iters, block_rows,
        )
    k = min(feature_dim, n)
    r = min(n, k + oversample)
    rng = np.random.default_rng(seed)
    omega = jnp.asarray(rng.standard_normal((n, r)).astype(np.float32))
    out = _netmf_dense_jit()(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), omega,
        jnp.float32(negative_samples),
        n=n, window=max(1, window_size), k=k, power_iters=power_iters,
    )
    return _fetch_f64(out)


def _grarep_device(graph, feature_dim: int, max_step: int, seed: int,
                   oversample: int, power_iters: int,
                   block_rows=None) -> np.ndarray:
    import jax.numpy as jnp

    rows, cols, vals, n = _coo_f32(graph)
    if block_rows is not None or not _dense_fits(n):
        return _grarep_blocked_device(
            graph, feature_dim, max_step, seed, oversample, power_iters,
            block_rows,
        )
    dim_per_step = max(feature_dim // max_step, 1)
    k = min(dim_per_step, n)
    r = min(n, k + oversample)
    rng = np.random.default_rng(seed)
    omega = jnp.asarray(
        rng.standard_normal((max_step, n, r)).astype(np.float32)
    )
    out = _grarep_dense_jit()(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), omega,
        n=n, max_step=max_step, k=k, power_iters=power_iters,
    )
    return _fetch_f64(out)


# ---------------------------------------------------------------- algorithms
def embed_prone(
    graph,
    feature_dim: int = 256,
    mu: float = 0.2,
    theta: float = 0.5,
    seed: int = 0,
    backend: str = "host",
    mesh=None,
    n_devices: Optional[int] = None,
    out: Optional[str] = None,
) -> np.ndarray:
    """ProNE spectral propagation (reference algorithms.py:23-64):
    U = R + Σ_{k=2}^{min(10,n)-1} exp(-θk)·μ · T_k(L_norm)·R, then
    SVD sqrt-singular rescale.

    ``backend="device"`` with ``mesh=``/``n_devices=`` runs the Chebyshev
    recurrence AND the U_k√S_k epilogue sharded across the device mesh
    (parallel/algorithms.py) — graphs past one chip's HBM included; output
    matches single-device up to per-column sign flips (eigh ambiguity).
  ``out=`` writes the finalized embedding to a ``.npy`` and returns a read-only memmap; with the sharded backend the write streams per shard block — no host ever holds (n, d)."""
    n = graph.num_entities

    if backend == "device" and (mesh is not None or n_devices is not None):
        from .parallel.algorithms import prone_sharded

        res = prone_sharded(graph, feature_dim, mu, theta, seed,
                            mesh=mesh, n_devices=n_devices, out=out)
        return res if out is not None else _finalize(res, feature_dim)
    if backend == "device":
        dev, rank = _prone_chebyshev_core(graph, feature_dim, mu, theta, seed)
        U = _fetch_f64(dev)
        if rank is not None:
            U = U[rank]
    else:
        from scipy.sparse import eye

        N, _ = _sym_normalized(_adjacency(graph))
        L_norm = eye(n) - N
        rng = np.random.default_rng(seed)
        R = rng.standard_normal((n, feature_dim)).astype(np.float64)
        U = R.copy()
        prev = R.copy()
        curr = _dense(L_norm @ R)
        for k in range(2, min(10, n)):
            nxt = _dense(2 * (L_norm @ curr) - prev)
            U += np.exp(-theta * k) * mu * nxt
            prev, curr = curr, nxt

    emb = _finalize(_svd_sqrt(U, feature_dim), feature_dim)
    return _write_npy(emb, out) if out is not None else emb


def embed_randne(
    graph,
    feature_dim: int = 256,
    num_iterations: int = 40,
    weights: Optional[List[float]] = None,
    seed: int = 0,
    backend: str = "host",
    mesh=None,
    n_devices: Optional[int] = None,
    out: Optional[str] = None,
) -> np.ndarray:
    """RandNE iterated Gaussian projection (reference algorithms.py:67-100):
    U = Σ_i w_i · N^i · R with N = D^-1/2 A D^-1/2, w_i = 1/2^i default.

    ``backend="device"`` with ``mesh=``/``n_devices=`` runs the whole
    weighted-power loop sharded across the device mesh
    (parallel/algorithms.py).  ``out=`` writes the finalized embedding to a ``.npy`` and returns a read-only memmap; with the sharded backend the write streams per shard block — no host ever holds (n, d)."""
    n = graph.num_entities
    if weights is None:
        weights = [1.0 / (2**i) for i in range(num_iterations + 1)]
    # the reference reuses the last weight if the list is short
    full = [
        weights[i] if i < len(weights) else weights[-1]
        for i in range(num_iterations + 1)
    ]

    rng = np.random.default_rng(seed)
    R = rng.standard_normal((n, feature_dim))

    if backend == "device" and (mesh is not None or n_devices is not None):
        from .parallel.algorithms import randne_sharded

        res = randne_sharded(graph, feature_dim, full, seed,
                             mesh=mesh, n_devices=n_devices, out=out)
        return res if out is not None else _finalize(res, feature_dim)
    if backend == "device":
        U = _device_spmm_weighted_sum(graph, R, full, sym_norm=True)
    else:
        A = _adjacency(graph)
        N, _ = _sym_normalized(A)
        U = full[0] * R
        current = R.copy()
        for i in range(num_iterations):
            current = _dense(N @ current)
            U += full[i + 1] * current

    emb = _finalize(U, feature_dim)
    return _write_npy(emb, out) if out is not None else emb


def embed_hope(
    graph,
    feature_dim: int = 256,
    beta: float = 0.1,
    backend: str = "host",
    seed: int = 0,
    oversample: int = 8,
    power_iters: int = 2,
    mesh=None,
    n_devices: Optional[int] = None,
    out: Optional[str] = None,
) -> np.ndarray:
    """HOPE Katz-proximity factorization (reference algorithms.py:103-149):
    M = (I − βA)^-1 − I, truncated SVD at dim/2, concat source ∥ target.

    ``backend="device"`` runs a matrix-free randomized SVD on the TPU: the
    Katz inverse is applied as a Neumann series of SpMMs (production sliced-
    ELL layout), so the n×n proximity matrix is never materialized — HOPE
    scales to graphs where the host path (and the reference) OOM.  Requires
    β·‖A‖_∞ < 1; accuracy is the usual randomized-SVD guarantee, tunable via
    ``oversample``/``power_iters``.  seed only affects the device sketch.
    With ``mesh=``/``n_devices=`` the whole pipeline (Neumann SpMMs,
    CholeskyQR subspace iteration, Gram-SVD) runs sharded across the
    device mesh (parallel/algorithms.py).  ``out=`` writes the finalized embedding to a ``.npy`` and returns a read-only memmap; with the sharded backend the write streams per shard block — no host ever holds (n, d)."""
    n = graph.num_entities

    if backend == "device" and (mesh is not None or n_devices is not None):
        from .parallel.algorithms import hope_sharded

        result = hope_sharded(graph, feature_dim, beta, seed, oversample,
                              power_iters, mesh=mesh, n_devices=n_devices,
                              out=out)
        return result if out is not None else _finalize(result, feature_dim)
    if backend == "device":
        result = _hope_device(
            graph, feature_dim, beta, seed, oversample, power_iters
        )
        emb = _finalize(result, feature_dim)
        return _write_npy(emb, out) if out is not None else emb

    A = _adjacency(graph)

    from scipy.sparse import csr_matrix, eye

    S = eye(n) - beta * A
    try:
        from scipy.sparse.linalg import inv as sparse_inv

        S_inv = sparse_inv(S.tocsc())
    except Exception:
        S_inv = csr_matrix(np.linalg.inv(S.toarray()))
    M = S_inv - eye(n)

    k = min(feature_dim // 2, n - 1)
    try:
        from scipy.sparse.linalg import svds

        u, s, vt = svds(M, k=k)
        order = np.argsort(-s)
        u, s, vt = u[:, order], s[order], vt[order, :]
    except Exception:
        u, s, vt = np.linalg.svd(_dense(M), full_matrices=False)
        u, s, vt = u[:, :k], s[:k], vt[:k, :]

    sqrt_s = np.sqrt(np.maximum(s, 0))
    result = np.concatenate([u * sqrt_s, vt.T * sqrt_s], axis=1)
    emb = _finalize(result, feature_dim)
    return _write_npy(emb, out) if out is not None else emb


def embed_netmf(
    graph,
    feature_dim: int = 256,
    window_size: int = 5,
    negative_samples: float = 1.0,
    backend: str = "host",
    seed: int = 0,
    oversample: int = 10,
    power_iters: int = 2,
    block_rows: Optional[int] = None,
    mesh=None,
    n_devices: Optional[int] = None,
    out: Optional[str] = None,
) -> np.ndarray:
    """NetMF log-PMI factorization (reference algorithms.py:152-198):
    M = (vol/b) · D^-1 · mean(P^1..P^w) · D, log-clipped at 1, full SVD.

    ``backend="device"`` runs the whole pipeline on the TPU: the transition
    powers become dense full-precision MXU matmuls and the full SVD a
    randomized SVD of width ``feature_dim + oversample`` (exact when that
    reaches n).  Past the dense-(n, n) HBM gate (~45k rows on a 16 GiB
    chip) the device path automatically switches to the BLOCKED driver
    (:func:`_netmf_blocked_device`): M_log is materialized one row block
    at a time via sliced-ELL transition-power walks and streamed through
    the randomized SVD, so HBM holds O(n·block) — any n that fits the
    embedding itself now runs on device.  ``block_rows`` forces the
    blocked path with that block width (auto-sized when None).  With
    ``mesh=``/``n_devices=`` the blocked driver runs SHARDED: the (n, b)
    blocks and the SpMM walk are row-partitioned across the device mesh
    (parallel/algorithms.py:netmf_sharded), multiplying both capacity and
    SpMM throughput by the mesh size.  ``out=`` persists the finalized embedding to a ``.npy`` and returns a read-only memmap."""
    if backend == "device" and (mesh is not None or n_devices is not None):
        from .parallel.algorithms import netmf_sharded

        res = netmf_sharded(graph, feature_dim, window_size,
                            negative_samples, seed, oversample,
                            power_iters, block_rows=block_rows, mesh=mesh,
                            n_devices=n_devices, out=out)
        return res if out is not None else _finalize(res, feature_dim)
    if backend == "device":
        emb = _finalize(
            _netmf_device(graph, feature_dim, window_size, negative_samples,
                          seed, oversample, power_iters, block_rows),
            feature_dim,
        )
        return _write_npy(emb, out) if out is not None else emb
    n = graph.num_entities
    A = _adjacency(graph)

    from scipy.sparse import csr_matrix, diags, eye

    degrees = np.asarray(A.sum(axis=1)).ravel()
    vol = degrees.sum()
    degrees = np.maximum(degrees, 1e-10)
    D_inv = diags(1.0 / degrees)
    P = D_inv @ A

    M_sum = csr_matrix((n, n), dtype=np.float64)
    P_power = eye(n, dtype=np.float64)
    for _ in range(window_size):
        P_power = P_power @ P
        M_sum = M_sum + P_power
    M_sum = M_sum / window_size

    M = (vol / negative_samples) * D_inv @ M_sum @ diags(degrees)
    M_log = np.log(np.maximum(_dense(M), 1.0))
    emb = _finalize(_svd_sqrt(M_log, min(feature_dim, n)), feature_dim)
    return _write_npy(emb, out) if out is not None else emb


def embed_grarep(
    graph,
    feature_dim: int = 256,
    max_step: int = 4,
    backend: str = "host",
    seed: int = 0,
    oversample: int = 10,
    power_iters: int = 2,
    block_rows: Optional[int] = None,
    mesh=None,
    n_devices: Optional[int] = None,
    out: Optional[str] = None,
) -> np.ndarray:
    """GraRep per-step log(P^k) SVDs, concat dim/max_step each
    (reference algorithms.py:201-245).

    ``backend="device"`` runs dense P^k powers on the MXU and a per-step
    randomized SVD; past the dense-(n, n) HBM gate it switches to the
    blocked streaming driver like the device NetMF (one transition-power
    walk per sweep serves every step's sketch), so any n that fits the
    embedding runs on device.  ``block_rows`` forces the blocked path.
    With ``mesh=``/``n_devices=`` the blocked driver runs SHARDED across
    the device mesh (parallel/algorithms.py:grarep_sharded).  ``out=`` persists the finalized embedding to a ``.npy`` and returns a read-only memmap."""
    if backend == "device" and (mesh is not None or n_devices is not None):
        from .parallel.algorithms import grarep_sharded

        res = grarep_sharded(graph, feature_dim, max_step, seed, oversample,
                             power_iters, block_rows=block_rows, mesh=mesh,
                             n_devices=n_devices, out=out)
        return res if out is not None else _finalize(res, feature_dim)
    if backend == "device":
        emb = _finalize(
            _grarep_device(graph, feature_dim, max_step, seed, oversample,
                           power_iters, block_rows),
            feature_dim,
        )
        return _write_npy(emb, out) if out is not None else emb
    n = graph.num_entities
    A = _adjacency(graph)

    from scipy.sparse import diags

    degrees = np.maximum(np.asarray(A.sum(axis=1)).ravel(), 1e-10)
    P = diags(1.0 / degrees) @ A

    dim_per_step = max(feature_dim // max_step, 1)
    embs = []
    P_k = P.copy()
    for step in range(1, max_step + 1):
        M_log = np.log(np.maximum(_dense(P_k), 1e-10)) - np.log(1e-10)
        embs.append(_svd_sqrt(M_log, min(dim_per_step, n)))
        if step < max_step:
            P_k = P_k @ P

    emb = _finalize(np.concatenate(embs, axis=1), feature_dim)
    return _write_npy(emb, out) if out is not None else emb


# ------------------------------------------------- device random-walk engine
def _device_walk_jit():
    """Module-level jitted batched uniform random walk: one lax.scan step
    per hop, each hop a CSR gather ``cols[indptr[cur] + floor(u·deg(cur))]``.
    Dead ends emit the sentinel ``n_rows`` and stay there; pair extraction
    masks the sentinel (same co-occurrence semantics as the reference's
    early-terminated walks, algorithms.py:262-312)."""
    global _WALK_FN
    if _WALK_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("walk_length", "n_rows"))
        def walks(indptr, cols, deg, starts, key, *, walk_length, n_rows):
            def body(cur, k):
                valid = cur < n_rows
                cur_c = jnp.where(valid, cur, 0)
                d = jnp.take(deg, cur_c)
                u = jax.random.uniform(k, cur.shape)
                t = jnp.minimum(
                    (u * d.astype(jnp.float32)).astype(jnp.int32),
                    jnp.maximum(d - 1, 0),
                )
                nxt = jnp.take(cols, jnp.take(indptr, cur_c) + t)
                nxt = jnp.where(valid & (d > 0), nxt, n_rows)
                return nxt, nxt

            keys = jax.random.split(key, walk_length - 1)
            _, ys = jax.lax.scan(body, starts, keys)
            return jnp.concatenate([starts[None, :], ys], axis=0).T

        _WALK_FN = walks
    return _WALK_FN


_WALK_FN = None

# Walks fetched per device batch: bounds both device memory and the
# device→host transfer size (the remote-TPU tunnel wedges on GB fetches).
_WALK_BATCH = 262_144


def _walk_csr(graph, with_vals: bool = False):
    """Self-loop-free CSR on host (reference drops r==c, algorithms.py:248-259).

    Column ids stay (row, col)-sorted — to_sparse_csr emits them that way —
    which the second-order walker's binary-search membership test relies on.
    ``with_vals`` additionally returns the edge weights plus the per-row max
    weight (the rejection-sampling envelope) and per-row weight sum (the
    host walker's dead-row termination threshold).

    Cached per graph (when the graph carries a cache dict): the walk
    pipeline calls this repeatedly — pass estimation, then the walk
    engine once per counting pass when the cross-pass walk cache falls
    back to regeneration — and rebuilding the multi-GB host CSR each
    time is a redundant seconds-to-minutes pass on big graphs."""
    cache = getattr(graph, "_device_cache", None)
    key = ("walk_csr", with_vals)
    if cache is not None and key in cache:
        return cache[key]
    out = _walk_csr_build(graph, with_vals)
    if cache is not None:
        cache[key] = out
    return out


def _walk_csr_build(graph, with_vals: bool):
    if not hasattr(graph, "to_sparse_csr"):  # DiskGraph (streamed build)
        return _walk_csr_build_disk(graph, with_vals)
    rows, cols, vals, n, _ = graph.to_sparse_csr()
    keep = rows != cols
    rows = rows[keep].astype(np.int64)
    cols = cols[keep].astype(np.int32)
    deg = np.bincount(rows, minlength=n).astype(np.int32)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    if int(indptr[-1]) >= 2**31:
        # the device walkers gather with int32 edge offsets; a silent wrap
        # would corrupt hop bases and the binary-search bounds
        raise ValueError(
            f"graph has {int(indptr[-1])} self-loop-free edges; the device "
            "walk engines support < 2**31 — use backend='host' or shard the "
            "walk workload by subgraph"
        )
    ip32 = indptr[:-1].astype(np.int32)
    if not with_vals:
        return ip32, cols, deg, n
    v = vals[keep].astype(np.float32)
    wmax = np.zeros(n, dtype=np.float32)
    np.maximum.at(wmax, rows, v)
    wsum = np.zeros(n, dtype=np.float64)
    np.add.at(wsum, rows, v.astype(np.float64))
    return ip32, cols, deg, n, v, wmax, wsum.astype(np.float32)


def _walk_csr_build_disk(g, with_vals: bool, chunk_rows: int = 1 << 21):
    """Walk CSR straight off a DiskGraph's memmaps (graph/stream.py) —
    two bounded passes over the on-disk arrays (count self-loops, then
    fill), never materializing entity-id strings or the int64 COO rows
    that ``to_sparse_matrix()``/``to_sparse_csr()`` would build.  Output
    identical to the in-RAM branch on the same graph (parity-tested)."""
    pr = (g.meta.get("row_range") if getattr(g, "meta", None) else None)
    if pr is not None and (int(pr[0]) > 0 or int(pr[1]) < g.num_entities):
        # a sharded-build PIECE has edges only for rows [lo, hi) — walks
        # on it would silently dead-end at every other row
        raise ValueError(
            f"This DiskGraph is one host's piece of a sharded build "
            f"(rows {pr}); the walk engines need the whole graph — merge "
            "the pieces first (graph.stream.merge_disk_graph_shards)."
        )
    n = g.num_entities
    src_ip = g.indptr  # (n+1,) int64 memmap
    deg = np.zeros(n, dtype=np.int64)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        s, e = int(src_ip[lo]), int(src_ip[hi])
        counts = np.diff(np.asarray(src_ip[lo:hi + 1]))
        cols_c = np.asarray(g.indices[s:e])
        rows_c = np.repeat(np.arange(lo, hi, dtype=np.int64), counts)
        loops = np.bincount(rows_c[cols_c == rows_c] - lo, minlength=hi - lo)
        deg[lo:hi] = counts - loops
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    nnz = int(indptr[-1])
    if nnz >= 2**31:
        raise ValueError(
            f"graph has {nnz} self-loop-free edges; the device walk "
            "engines support < 2**31 — use backend='host' or shard the "
            "walk workload by subgraph"
        )
    cols = np.empty(nnz, dtype=np.int32)
    v = np.empty(nnz, dtype=np.float32) if with_vals else None
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        s, e = int(src_ip[lo]), int(src_ip[hi])
        counts = np.diff(np.asarray(src_ip[lo:hi + 1]))
        cols_c = np.asarray(g.indices[s:e])
        rows_c = np.repeat(np.arange(lo, hi, dtype=np.int64), counts)
        keep = cols_c != rows_c
        o, d = int(indptr[lo]), int(indptr[hi])
        cols[o:d] = cols_c[keep]
        if with_vals:
            v[o:d] = np.asarray(g.left_vals[s:e])[keep]
    deg32 = deg.astype(np.int32)
    ip32 = indptr[:-1].astype(np.int32)
    if not with_vals:
        return ip32, cols, deg32, n
    rows64 = np.repeat(np.arange(n, dtype=np.int64), deg)
    wmax = np.zeros(n, dtype=np.float32)
    np.maximum.at(wmax, rows64, v)
    wsum = np.zeros(n, dtype=np.float64)
    np.add.at(wsum, rows64, v.astype(np.float64))
    return ip32, cols, deg32, n, v, wmax, wsum.astype(np.float32)


def _lane_pad(length: int, batch: int, lo: int, mesh) -> int:
    """Padding lanes for a walk-starts chunk.

    Trailing (lo > 0) short chunks pad to the compiled batch shape; a
    sole/first short chunk keeps its own shape EXCEPT under a mesh, where
    the lane axis must divide by the device count (an unpadded 149-lane
    chunk on a 4-device mesh is a sharding error).  Padded lanes start at
    the sentinel row and are dropped (host path) or masked (resident
    consumers)."""
    target = batch if (length < batch and lo > 0) else length
    if mesh is not None and target % mesh.size:
        # batch itself may not divide a non-power-of-two mesh
        target += mesh.size - target % mesh.size
    return target - length


def _walk_placers(mesh):
    """(replicate, shard_batch) placement helpers for the walk engines.

    With a mesh, the CSR tables replicate across devices and the walk
    STARTS shard along the batch axis — every per-lane op partitions
    trivially under SPMD, so N chips generate N× the walks per dispatch
    with VALUE-IDENTICAL outputs (integer gathers + per-lane PRNG; no
    float reassociation)."""
    if mesh is None:
        import jax.numpy as jnp

        return jnp.asarray, jnp.asarray
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import shard_axes

    ax = shard_axes(mesh)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(ax))
    return (lambda a: jax.device_put(np.asarray(a), rep),
            lambda a: jax.device_put(np.asarray(a), shd))


def _device_walks(graph, num_walks: int, walk_length: int, seed: int,
                  batch: int = _WALK_BATCH, mesh=None, resident: bool = False,
                  walk_tables: str = "auto"):
    """Yield (B, walk_length) int32 host walk batches (sentinel == n).

    ``mesh`` shards each batch's walk lanes across the devices (tables
    replicated) — same outputs, N× the walk throughput per dispatch.
    ``walk_tables`` picks the table placement ('auto' fit-checks —
    :func:`_walk_table_mode`): 'sharded' row-partitions the CSR over the
    mesh for graphs past one chip's HBM (owner-routed hops,
    value-identical outputs).  ``resident=True`` instead yields
    ``(device_array, pad)`` without fetching — for the on-device
    co-occurrence path (ops/cooccur.py), which must mask the ``pad``
    trailing lanes itself."""
    import jax

    indptr, cols, deg, n = _walk_csr(graph)
    mode = _walk_table_mode(walk_tables, mesh, n, int(cols.shape[0]), False)
    starts = np.nonzero(deg > 0)[0].astype(np.int32)
    if starts.shape[0] == 0:
        return
    all_starts = np.tile(starts, num_walks)
    rep, shard_batch = _walk_placers(mesh)
    if mode == "sharded":
        fn = _device_walk_sharded_jit(mesh)
        cache = getattr(graph, "_device_cache", None)
        ck = ("walk_tables_sharded",
              tuple(d.id for d in mesh.devices.flat))
        if cache is not None and ck in cache:
            ip_sh, cols_sh, deg_sh, rps = cache[ck]
        else:
            ip_sh, cols_sh, deg_sh, rps = _shard_walk_tables(
                indptr, cols, deg, n, mesh)
            if cache is not None:
                cache[ck] = (ip_sh, cols_sh, deg_sh, rps)
        run = lambda chunk, key: fn(ip_sh, cols_sh, deg_sh, rep(chunk),
                                    key, walk_length=walk_length, n_rows=n,
                                    rps=rps)
    else:
        d_indptr, d_cols, d_deg = rep(indptr), rep(cols), rep(deg)
        fn = _device_walk_jit()
        run = lambda chunk, key: fn(d_indptr, d_cols, d_deg,
                                    shard_batch(chunk), key,
                                    walk_length=walk_length, n_rows=n)
    root = jax.random.PRNGKey(seed)
    for i, lo in enumerate(range(0, all_starts.shape[0], batch)):
        chunk = all_starts[lo:lo + batch]
        pad = _lane_pad(chunk.shape[0], batch, lo, mesh)
        if pad:
            chunk = np.concatenate([chunk, np.full(pad, n, dtype=np.int32)])
        out = run(chunk, jax.random.fold_in(root, i))
        if resident:
            yield out, pad
            continue
        w = np.asarray(out)
        yield w[: w.shape[0] - pad] if pad else w


# --------------------------------------- sharded-table first-order engine
_WALK_SHARDED_JITS: dict = {}


def _device_walk_sharded_jit(mesh):
    """First-order walk engine with the CSR TABLES row-sharded over the
    mesh (round 5, VERDICT r4 #5) — the capacity mode for graphs whose
    cols array exceeds one chip's HBM (each device holds nnz/P edges).

    Owner-routed hop: the frontier is replicated (each hop's (B,) int32
    ids cost one psum — tiny next to the table), every device computes
    the next hop for the lanes whose CURRENT row it owns (a local
    gather in its CSR slice), and a psum combines the disjoint
    contributions.  The per-hop uniforms are drawn replicated with the
    SAME key/shape as the replicated engine, and each valid row has
    exactly one owner, so outputs are VALUE-IDENTICAL to
    :func:`_device_walk_jit` (tested).  Dead ends/sentinels behave
    identically (n_rows, sticky)."""
    key = tuple(d.id for d in mesh.devices.flat)
    if key not in _WALK_SHARDED_JITS:
        import functools

        import jax
        import jax.numpy as jnp
        from jax import lax
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import shard_axes

        axis = shard_axes(mesh)

        @functools.partial(
            jax.jit, static_argnames=("walk_length", "n_rows", "rps"))
        def walks(ip_sh, cols_sh, deg_sh, starts, key_, *, walk_length,
                  n_rows, rps):
            def local(ip, cols, deg, starts_, kk):
                ip = ip.reshape(-1)
                cols = cols.reshape(-1)
                deg = deg.reshape(-1)
                row_lo = lax.axis_index(axis) * rps
                ecap = cols.shape[0]

                def body(cur, k):
                    valid = cur < n_rows
                    u = jax.random.uniform(k, cur.shape)
                    lr = cur - row_lo
                    owned = valid & (lr >= 0) & (lr < rps)
                    lrc = jnp.clip(lr, 0, rps - 1)
                    d = jnp.take(deg, lrc)
                    t = jnp.minimum(
                        (u * d.astype(jnp.float32)).astype(jnp.int32),
                        jnp.maximum(d - 1, 0),
                    )
                    slot = jnp.clip(jnp.take(ip, lrc) + t, 0, ecap - 1)
                    cand = jnp.where(d > 0, jnp.take(cols, slot), n_rows)
                    nxt = lax.psum(jnp.where(owned, cand, 0), axis)
                    nxt = jnp.where(valid, nxt, n_rows)
                    return nxt, nxt

                keys = jax.random.split(kk, walk_length - 1)
                _, ys = lax.scan(body, starts_, keys)
                return jnp.concatenate([starts_[None, :], ys], axis=0).T

            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(axis, None),) * 3 + (P(), P()),
                out_specs=P(),
            )(ip_sh, cols_sh, deg_sh, starts, key_)

        _WALK_SHARDED_JITS[key] = walks
    return _WALK_SHARDED_JITS[key]


def _shard_walk_tables(indptr, cols, deg, n, mesh):
    """(ip_sh (P, rps), cols_sh (P, E), deg_sh (P, rps), rps) — the walk
    CSR row-partitioned for the sharded-table engine.  Per-shard indptr
    is LOCAL to the shard's cols slice; shards pad to the max per-shard
    edge count (dead slots are never addressed: local gathers clip and
    unowned lanes contribute zero to the psum)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import shard_axes

    P_ = int(mesh.devices.size)
    rps = -(-n // P_)
    ip64 = np.zeros(n + 1, dtype=np.int64)
    ip64[:n] = indptr
    ip64[n] = (int(indptr[n - 1]) + int(deg[n - 1])) if n else 0
    bounds = np.minimum(np.arange(P_ + 1) * rps, n)
    counts = [int(ip64[bounds[k + 1]] - ip64[bounds[k]]) for k in range(P_)]
    E = max(max(counts), 1)
    ip_sh = np.zeros((P_, rps), dtype=np.int32)
    deg_sh = np.zeros((P_, rps), dtype=np.int32)
    cols_sh = np.zeros((P_, E), dtype=np.int32)
    for k in range(P_):
        lo, hi = bounds[k], bounds[k + 1]
        if hi > lo:
            ip_sh[k, : hi - lo] = (ip64[lo:hi] - ip64[lo]).astype(np.int32)
            deg_sh[k, : hi - lo] = deg[lo:hi]
            cols_sh[k, :counts[k]] = cols[ip64[lo]:ip64[hi]]
    ax = shard_axes(mesh)
    sh = NamedSharding(mesh, P(ax, None))
    return (jax.device_put(ip_sh, sh), jax.device_put(cols_sh, sh),
            jax.device_put(deg_sh, sh), rps)


def _walk_table_mode(mode: str, mesh, n: int, nnz: int,
                     second_order: bool, limit=None,
                     n_devices=None) -> str:
    """Resolve the walk-table placement: 'auto' prefers replicated
    tables (no per-hop collective) and switches to the sharded-table
    engine when the replicated CSR wouldn't fit one device's HBM.  The
    chain ends with an actionable error (backend='host' walks the graph
    from host RAM) rather than a silent 1000× host-walker fallback.

    ``limit``/``n_devices`` let the capacity planner (plan.py) evaluate
    the same chain for a hypothetical chip/mesh without a live backend;
    by default the limit comes from the real device and the device count
    from ``mesh``."""
    if mode not in ("auto", "replicated", "sharded"):
        raise ValueError(
            f"Unknown walk_tables '{mode}'. Use 'auto', 'replicated' or "
            "'sharded'."
        )
    if mode != "auto":
        if mode == "sharded" and mesh is None:
            raise ValueError("walk_tables='sharded' needs a mesh")
        return mode
    if limit is None:
        from .ops.memory import device_hbm_limit

        limit = device_hbm_limit()
    if limit is None:
        return "replicated"
    # replicated live set: cols + indptr + deg (+vals/wmax/wsum for the
    # second-order engine) + ~3 batch-sized (B, L) buffers
    per_row = 8
    per_edge = 8 if second_order else 4
    table = n * per_row + nnz * per_edge + (n * 12 if second_order else 0)
    batch = 3 * (_WALK2_BATCH if second_order else _WALK_BATCH) * 4 * 80
    if table + batch <= int(limit * 0.9):
        return "replicated"
    P_ = int(mesh.devices.size) if mesh is not None else n_devices
    if P_ is not None and P_ > 1:
        if table / P_ + batch <= int(limit * 0.9):
            return "sharded"
    raise ValueError(
        f"walk tables need ~{table / (1 << 30):.1f} GiB "
        f"({'replicated' if not P_ or P_ <= 1 else 'even sharded over the mesh'}"
        f" exceeds the ~{limit / (1 << 30):.1f} GiB device budget) — "
        "use more devices (mesh=), or backend='host' for host-RAM walks"
    )


# ----------------------------------- sharded-table second-order engine
_WALK2_SHARDED_JITS: dict = {}


def _shard_walk_tables2(indptr, cols, vals, deg, wmax, wsum, n, mesh):
    """Second-order twin of :func:`_shard_walk_tables`: the row-
    partitioned CSR plus the edge weights and per-row envelope tables
    (wmax/wsum) the rejection sampler reads."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import shard_axes

    P_ = int(mesh.devices.size)
    rps = -(-n // P_)
    ip64 = np.zeros(n + 1, dtype=np.int64)
    ip64[:n] = indptr
    ip64[n] = (int(indptr[n - 1]) + int(deg[n - 1])) if n else 0
    bounds = np.minimum(np.arange(P_ + 1) * rps, n)
    counts = [int(ip64[bounds[k + 1]] - ip64[bounds[k]]) for k in range(P_)]
    E = max(max(counts), 1)
    ip_sh = np.zeros((P_, rps), dtype=np.int32)
    deg_sh = np.zeros((P_, rps), dtype=np.int32)
    wmax_sh = np.zeros((P_, rps), dtype=np.float32)
    wsum_sh = np.zeros((P_, rps), dtype=np.float32)
    cols_sh = np.zeros((P_, E), dtype=np.int32)
    vals_sh = np.zeros((P_, E), dtype=np.float32)
    for k in range(P_):
        lo, hi = bounds[k], bounds[k + 1]
        if hi > lo:
            ip_sh[k, : hi - lo] = (ip64[lo:hi] - ip64[lo]).astype(np.int32)
            deg_sh[k, : hi - lo] = deg[lo:hi]
            wmax_sh[k, : hi - lo] = wmax[lo:hi]
            wsum_sh[k, : hi - lo] = wsum[lo:hi]
            cols_sh[k, :counts[k]] = cols[ip64[lo]:ip64[hi]]
            vals_sh[k, :counts[k]] = vals[ip64[lo]:ip64[hi]]
    ax = shard_axes(mesh)
    sh = NamedSharding(mesh, P(ax, None))
    placed = tuple(jax.device_put(a, sh) for a in
                   (ip_sh, cols_sh, vals_sh, deg_sh, wmax_sh, wsum_sh))
    return placed + (rps,)


def _device_walk2_sharded_jit(mesh):
    """Second-order (p/q) engine with the CSR row-sharded over the mesh
    (round 5) — the capacity mode when the weighted tables exceed one
    chip's HBM.

    Ownership split per hop: the owner of each lane's CURRENT row
    supplies degree/envelope/backtrack weight and, per rejection round,
    the uniform proposal's (neighbor, weight); the owner of the PREV row
    answers the common-neighbor membership test; psums combine the
    disjoint per-owner contributions (~3 (B,)-sized collectives per
    round — the price of not replicating the (nnz,) tables), and every
    probability decision runs replicated with the SAME key splits as the
    replicated engine's no-tail-compaction path.  Walks are therefore
    BITWISE-identical to :func:`_device_walk2_jit` for batches below its
    compaction threshold (4096, tested); at larger batches this engine
    runs plain full-width rejection rounds (compaction's lane gathers
    don't owner-route) — the same sampler and mixing bound, its own
    draw stream."""
    key = tuple(d.id for d in mesh.devices.flat)
    if key not in _WALK2_SHARDED_JITS:
        import functools

        import jax
        import jax.numpy as jnp
        from jax import lax
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import shard_axes

        axis = shard_axes(mesh)

        @functools.partial(
            jax.jit,
            static_argnames=("walk_length", "n_rows", "tries", "bsteps",
                             "rps"),
        )
        def walks2s(ip_sh, cols_sh, vals_sh, deg_sh, wmax_sh, wsum_sh,
                    starts, key_, inv_p, inv_q, *, walk_length, n_rows,
                    tries, bsteps, rps):
            def local(ip, colsL, valsL, degL, wmL, wsL, starts_, kk,
                      ipv, iqv):
                ip = ip.reshape(-1)
                colsL = colsL.reshape(-1)
                valsL = valsL.reshape(-1)
                degL = degL.reshape(-1)
                wmL = wmL.reshape(-1)
                wsL = wsL.reshape(-1)
                row_lo = lax.axis_index(axis) * rps
                E = colsL.shape[0]
                m2 = jnp.maximum(jnp.float32(1.0), iqv)
                rounds = tries  # chunk == 1, like the production default
                PRELUDE = min(4, rounds)

                def own_of(u):
                    lr = u - row_lo
                    ok = (lr >= 0) & (lr < rps)
                    return ok, jnp.clip(lr, 0, rps - 1)

                def bsearch_local(u_ok, u_lr, x):
                    """(found, pos) of x in the LOCAL slice of row u —
                    same halving schedule as the replicated engine, so
                    equal results on owned rows."""
                    lo0 = jnp.take(ip, u_lr)
                    hi0 = lo0 + jnp.take(degL, u_lr)

                    def bstep(_, lh):
                        lo, hi = lh
                        active = lo < hi
                        mid = (lo + hi) // 2
                        v = jnp.take(colsL, jnp.clip(mid, 0, E - 1))
                        right = active & (v < x)
                        return (
                            jnp.where(right, mid + 1, lo),
                            jnp.where(active & ~right, mid, hi),
                        )

                    lo, _ = lax.fori_loop(0, bsteps, bstep, (lo0, hi0))
                    v = jnp.take(colsL, jnp.clip(lo, 0, E - 1))
                    return u_ok & (lo < hi0) & (v == x), lo

                def hop(carry, k):
                    prev, cur = carry
                    valid = cur < n_rows
                    ownc, lrc = own_of(cur)
                    ownc = ownc & valid
                    d = lax.psum(
                        jnp.where(ownc, jnp.take(degL, lrc), 0), axis)
                    wm = lax.psum(
                        jnp.where(ownc, jnp.take(wmL, lrc), 0.0), axis)
                    ws = lax.psum(
                        jnp.where(ownc, jnp.take(wsL, lrc), 0.0), axis)
                    first = prev >= n_rows
                    prev_c = jnp.where(first, 0, prev)
                    bt_found, bt_pos = bsearch_local(ownc, lrc, prev_c)
                    w_bt = lax.psum(
                        jnp.where(
                            bt_found & ~first,
                            jnp.take(valsL, jnp.clip(bt_pos, 0, E - 1))
                            * ipv,
                            0.0,
                        ),
                        axis,
                    )
                    env = w_bt + d.astype(jnp.float32) * wm * m2
                    pi = w_bt / jnp.maximum(env, 1e-30)
                    dead = ws * m2 + w_bt < 1e-15
                    alive = valid & (d > 0) & ~dead
                    base_l = jnp.take(ip, lrc)
                    ownp, lrp = own_of(prev_c)
                    ownp = ownp & ~first

                    # same split as the replicated hop; k_b/k_b2 are its
                    # compaction-stage keys, unused on this path
                    k_a, k_b, k_b2, k_c = jax.random.split(k, 4)
                    del k_b, k_b2

                    def run_stage(key0, acc, cand, max_rounds, forced):
                        cshape = (1,) + acc.shape

                        def cond(s):
                            r, _, a, _ = s
                            return (r < max_rounds) & ~jnp.all(a)

                        def body(s):
                            r, kk2, a, c = s
                            kk2, k0, k1, k2 = jax.random.split(kk2, 4)
                            is_bt = ~first & (
                                jax.random.uniform(k0, cshape) < pi)
                            u = jax.random.uniform(k1, cshape)
                            j = jnp.minimum(
                                (u * d.astype(jnp.float32)).astype(
                                    jnp.int32),
                                jnp.maximum(d - 1, 0),
                            )
                            idx = jnp.clip(base_l + j, 0, E - 1)
                            x = lax.psum(
                                jnp.where(ownc, jnp.take(colsL, idx), 0),
                                axis)
                            w = lax.psum(
                                jnp.where(
                                    ownc, jnp.take(valsL, idx), 0.0),
                                axis)
                            common_l, _ = bsearch_local(
                                jnp.broadcast_to(ownp, cshape),
                                jnp.broadcast_to(lrp, cshape), x)
                            common = lax.psum(
                                common_l.astype(jnp.int32), axis) > 0
                            alpha2 = jnp.where(
                                x == prev_c, 0.0,
                                jnp.where(common, 1.0, iqv))
                            p_acc = jnp.where(
                                first, 1.0,
                                w * alpha2 / jnp.maximum(wm * m2, 1e-30))
                            hit = is_bt | (
                                jax.random.uniform(k2, cshape) < p_acc)
                            prop = jnp.where(is_bt, prev_c, x)
                            any_hit = jnp.any(hit, axis=0)
                            fi = jnp.argmax(hit, axis=0)
                            sel = jnp.take_along_axis(
                                prop, fi[None, :], axis=0)[0]
                            exhausted = forced & (r == max_rounds - 1)
                            take_it = alive & ~a & (any_hit | exhausted)
                            c = jnp.where(
                                take_it,
                                jnp.where(any_hit, sel, x[-1]), c)
                            return r + 1, kk2, a | take_it | ~alive, c

                        _, _, acc, cand = lax.while_loop(
                            cond, body, (jnp.int32(0), key0, acc, cand))
                        return acc, cand

                    acc = ~alive
                    cand = jnp.full(cur.shape, n_rows, jnp.int32)
                    acc, cand = run_stage(k_a, acc, cand, PRELUDE, False)
                    _, cand = run_stage(k_c, acc, cand, rounds, True)
                    return (cur, cand), cand

                keys = jax.random.split(kk, walk_length - 1)
                prev0 = jnp.full(starts_.shape, n_rows, jnp.int32)
                _, ys = lax.scan(hop, (prev0, starts_), keys)
                return jnp.concatenate([starts_[None, :], ys], axis=0).T

            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(axis, None),) * 6 + (P(),) * 4,
                out_specs=P(),
            )(ip_sh, cols_sh, vals_sh, deg_sh, wmax_sh, wsum_sh, starts,
              key_, inv_p, inv_q)

        _WALK2_SHARDED_JITS[key] = walks2s
    return _WALK2_SHARDED_JITS[key]


# ------------------------------------- device second-order (p/q) walk engine
def _device_walk2_jit():
    """Module-level jitted batched SECOND-order (Node2Vec p/q-biased) walk.

    Same target distribution as the reference's host walker
    (algorithms.py:262-312): uniform first hop, then next-hop probability
    ∝ edge_weight · α where α = 1/p for backtracking, 1 for a common
    neighbor of (prev, cur), 1/q otherwise.  Sampled by COMPOSITION +
    REJECTION with a per-edge-tight envelope: the backtrack edge is an
    EXACT point-mass component (weight w(cur→prev)/p, looked up once per
    hop by binary search), and the remaining mass is rejection-sampled
    from uniform neighbor proposals under envelope w_max·m2 with
    m2 = max(1, 1/q) — so acceptance never degrades with extreme p, and
    for q < 1 most proposals accept outright (α = 1/q = the envelope).
    The common-neighbor test is a fixed-depth binary search over the
    row's sorted column slice (CSR is (row, col) sorted).

    The rejection rounds run in three stages to avoid paying full batch
    width for the straggler tail (measured: per-round cost is
    gather-issue-bound ∝ active width, and the tail dominates — a chunk
    sweep showed more proposals per round only ADDS cost,
    scripts/walk2_chunk_sweep.py): a short full-width prelude, then the
    still-rejecting lanes are compacted via top_k into a quarter-width
    view for the long tail, then a full-width cleanup for the rare
    overflow (normally 0 rounds).

    Approximation bound: after ``tries`` proposals an element falls back
    to a uniform proposal, so the sampled distribution mixes toward
    uniform with weight (1−a)^tries for per-proposal acceptance
    a = (w_bt + Σ_{x≠prev} wₓαₓ) / (w_bt + d·w_max·m2) — independent of
    p, and of q below 1; the residual low-acceptance regimes are skewed
    weights (w ≪ w_max) and q ≫ 1 with few common neighbors (the target
    itself concentrates on a small set).  Rows whose host-walker
    transition mass underflows (Σ w·α < 1e-15 ⇐ wsum·m2 + w_bt < 1e-15)
    terminate with the sentinel, matching the reference's dead-row stop;
    dead ends likewise emit ``n_rows``."""
    global _WALK2_FN
    if _WALK2_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(
            jax.jit,
            static_argnames=(
                "walk_length", "n_rows", "tries", "bsteps", "chunk",
            ),
        )
        def walks2(indptr, cols, vals, deg, wmax, wsum, starts, key,
                   inv_p, inv_q, *, walk_length, n_rows, tries, bsteps=32,
                   chunk=1):
            nnz = cols.shape[0]
            m2 = jnp.maximum(jnp.float32(1.0), inv_q)  # non-backtrack α cap
            rounds = -(-tries // chunk)
            batch = int(starts.shape[0])
            # two-stage tail compaction: after PRELUDE full-width rounds
            # only ~(1−a)^PRELUDE of lanes are still rejecting; gather them
            # into a batch//4 view so straggler rounds cost a quarter
            PRELUDE = min(4, rounds)
            sub = batch // 4 if batch >= 4096 else 0
            sub2 = batch // 16 if batch >= 16384 else 0

            def bsearch(u, x):
                """(found, position) of x in the sorted neighbor slice
                cols[indptr[u] : indptr[u] + deg[u])."""
                lo0 = jnp.take(indptr, u)
                hi0 = lo0 + jnp.take(deg, u)

                def bstep(_, lh):
                    lo, hi = lh
                    active = lo < hi
                    mid = (lo + hi) // 2
                    v = jnp.take(cols, jnp.clip(mid, 0, nnz - 1))
                    right = active & (v < x)
                    return (
                        jnp.where(right, mid + 1, lo),
                        jnp.where(active & ~right, mid, hi),
                    )

                # the hop loop is gather-issue-bound and this search is its
                # dominant gather volume — callers pass bsteps =
                # ceil(log2(max_degree + 1)) so it halves only as often as
                # the longest row needs (32 covers any int32 slice)
                lo, _ = jax.lax.fori_loop(0, bsteps, bstep, (lo0, hi0))
                v = jnp.take(cols, jnp.clip(lo, 0, nnz - 1))
                return (lo < hi0) & (v == x), lo

            def run_stage(key0, acc, cand, st, max_rounds, forced):
                """Rejection rounds over one lane view.  ``st`` holds the
                per-lane constants; ``forced`` stages fall back to the last
                uniform proposal when the budget is exhausted (the
                documented (1−a)^tries uniform-mixing bound)."""
                alive, first, prev_c, d, base, wm, pi = st
                cshape = (chunk,) + acc.shape

                def cond(s):
                    r, _, a, _ = s
                    return (r < max_rounds) & ~jnp.all(a)

                def body(s):
                    r, kk, a, c = s
                    kk, k0, k1, k2 = jax.random.split(kk, 4)
                    # composition: with prob π take the EXACT backtrack
                    # point mass, else a uniform neighbor proposal under
                    # the per-edge-tight envelope w_max·m2 (α(prev) is
                    # excluded from the envelope entirely)
                    is_bt = ~first & (
                        jax.random.uniform(k0, cshape) < pi
                    )
                    u = jax.random.uniform(k1, cshape)
                    j = jnp.minimum(
                        (u * d.astype(jnp.float32)).astype(jnp.int32),
                        jnp.maximum(d - 1, 0),
                    )
                    idx = jnp.clip(base + j, 0, nnz - 1)
                    x = jnp.take(cols, idx)
                    w = jnp.take(vals, idx)
                    common, _ = bsearch(jnp.broadcast_to(prev_c, cshape), x)
                    alpha2 = jnp.where(
                        x == prev_c, 0.0, jnp.where(common, 1.0, inv_q)
                    )
                    p_acc = jnp.where(
                        first, 1.0, w * alpha2 / jnp.maximum(wm * m2, 1e-30)
                    )
                    hit = is_bt | (jax.random.uniform(k2, cshape) < p_acc)
                    prop = jnp.where(is_bt, prev_c, x)
                    any_hit = jnp.any(hit, axis=0)
                    fi = jnp.argmax(hit, axis=0)  # first accepted proposal
                    sel = jnp.take_along_axis(prop, fi[None, :], axis=0)[0]
                    exhausted = forced & (r == max_rounds - 1)
                    take_it = alive & ~a & (any_hit | exhausted)
                    c = jnp.where(take_it, jnp.where(any_hit, sel, x[-1]), c)
                    return r + 1, kk, a | take_it | ~alive, c

                _, _, acc, cand = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), key0, acc, cand)
                )
                return acc, cand

            def hop(carry, k):
                prev, cur = carry
                valid = cur < n_rows
                cur_c = jnp.where(valid, cur, 0)
                d = jnp.take(deg, cur_c)
                base = jnp.take(indptr, cur_c)
                wm = jnp.take(wmax, cur_c)
                first = prev >= n_rows  # no prev yet → uniform hop
                prev_c = jnp.where(first, 0, prev)
                # exact backtrack component: w(cur→prev)·(1/p)
                bt_found, bt_pos = bsearch(cur_c, prev_c)
                w_bt = jnp.where(
                    bt_found & ~first,
                    jnp.take(vals, jnp.clip(bt_pos, 0, nnz - 1)) * inv_p,
                    0.0,
                )
                env = w_bt + d.astype(jnp.float32) * wm * m2
                pi = w_bt / jnp.maximum(env, 1e-30)
                # the host walker stops when the row's biased transition
                # mass underflows; wsum·m2 + w_bt bounds it from above
                dead = jnp.take(wsum, cur_c) * m2 + w_bt < 1e-15
                alive = valid & (d > 0) & ~dead

                k_a, k_b, k_b2, k_c = jax.random.split(k, 4)
                acc = ~alive
                cand = jnp.full(cur.shape, n_rows, jnp.int32)
                st = (alive, first, prev_c, d, base, wm, pi)
                acc, cand = run_stage(k_a, acc, cand, st, PRELUDE, False)
                if sub:
                    _, gi = jax.lax.top_k((~acc).astype(jnp.int32), sub)
                    st_k = tuple(v[gi] for v in st)
                    acc_k, cand_k = run_stage(
                        k_b, acc[gi], cand[gi], st_k,
                        min(4, rounds) if sub2 else rounds, not sub2,
                    )
                    if sub2:  # deep tail: sixteenth-width view
                        _, gj = jax.lax.top_k((~acc_k).astype(jnp.int32),
                                              sub2)
                        st_j = tuple(v[gj] for v in st_k)
                        acc_j, cand_j = run_stage(
                            k_b2, acc_k[gj], cand_k[gj], st_j, rounds, True
                        )
                        acc_k = acc_k.at[gj].set(acc_j)
                        cand_k = cand_k.at[gj].set(cand_j)
                    acc = acc.at[gi].set(acc_k)
                    cand = cand.at[gi].set(cand_k)
                # leftovers (pending lanes that exceeded the compact views —
                # rare) finish full-width; normally all-accepted ⇒ 0 rounds
                _, cand = run_stage(k_c, acc, cand, st, rounds, True)
                return (cur, cand), cand

            keys = jax.random.split(key, walk_length - 1)
            prev0 = jnp.full(starts.shape, n_rows, jnp.int32)
            _, ys = jax.lax.scan(hop, (prev0, starts), keys)
            return jnp.concatenate([starts[None, :], ys], axis=0).T

        _WALK2_FN = walks2
    return _WALK2_FN


_WALK2_FN = None

# base rejection-proposal budget per hop; scaled up with
# α_max = max(1, 1/p, 1/q) so the uniform-fallback mixing weight
# (1−a)^tries stays negligible as extreme p/q shrink per-try acceptance
# (see _device_walk2_jit), capped to bound worst-case work
_WALK2_TRIES = 64
_WALK2_TRIES_CAP = 1024

# proposals per while_loop round.  MEASURED on the v5e (sweep in
# scripts/walk2_chunk_sweep.py): per-round cost is gather-issue-bound and
# scales with chunk while the tail rounds shrink sublinearly — chunk=1
# (11.3 s/batch) beat 2 (12.7), 4 (15.8) and 8 (21.1) at the probe shape;
# the tail is handled by compaction instead (see _device_walk2_jit)
_WALK2_CHUNK = 1

# Second-order batches are smaller than first-order ones: the rejection
# loop multiplies per-hop buffer count ~chunk-fold, and the 262144×80
# program crashed the v5e worker where 65536-wide shapes run fine.
_WALK2_BATCH = 65_536


def _device_walks2(graph, num_walks: int, walk_length: int, p: float,
                   q: float, seed: int, batch: int = _WALK2_BATCH,
                   tries: int | None = None, mesh=None,
                   resident: bool = False, walk_tables: str = "auto"):
    """Yield (B, walk_length) int32 host batches of p/q-biased walks.

    ``mesh`` shards the walk lanes across the devices (see
    :func:`_walk_placers`); ``resident=True`` yields ``(device_array,
    pad)`` unfetched, as in :func:`_device_walks`.  ``walk_tables``
    places the weighted CSR: 'sharded' row-partitions it over the mesh
    with owner-routed rejection sampling
    (:func:`_device_walk2_sharded_jit`) — the capacity mode for tables
    past one chip's HBM."""
    import jax

    import jax.numpy as jnp

    indptr, cols, deg, n, vals, wmax, wsum = _walk_csr(graph, with_vals=True)
    mode = _walk_table_mode(walk_tables, mesh, n, int(cols.shape[0]), True)
    bsteps = max(1, int(np.ceil(np.log2(int(deg.max(initial=0)) + 2))))
    if tries is None:
        # the composition sampler's acceptance is independent of p (exact
        # backtrack component) and of q below 1; scale the budget only for
        # q ≫ 1, where the target concentrates on common neighbors and
        # per-proposal acceptance approaches their frequency
        tries = int(min(_WALK2_TRIES_CAP,
                        max(_WALK2_TRIES, np.ceil(8.0 * q))))
    starts = np.nonzero(deg > 0)[0].astype(np.int32)
    if starts.shape[0] == 0:
        return
    all_starts = np.tile(starts, num_walks)
    rep, shard_batch = _walk_placers(mesh)
    if mode == "sharded":
        cache = getattr(graph, "_device_cache", None)
        ck = ("walk_tables2_sharded",
              tuple(d.id for d in mesh.devices.flat))
        if cache is not None and ck in cache:
            tables = cache[ck]
        else:
            tables = _shard_walk_tables2(indptr, cols, vals, deg, wmax,
                                         wsum, n, mesh)
            if cache is not None:
                cache[ck] = tables
        fn2 = _device_walk2_sharded_jit(mesh)
        rps = tables[-1]
        run = lambda part, key: fn2(
            *tables[:-1], rep(part), key,
            jnp.float32(1.0 / p), jnp.float32(1.0 / q),
            walk_length=walk_length, n_rows=n, tries=tries,
            bsteps=bsteps, rps=rps,
        )
    else:
        dev = (
            rep(indptr), rep(cols), rep(vals),
            rep(deg), rep(wmax), rep(wsum),
        )
        fn = _device_walk2_jit()
        run = lambda part, key: fn(
            *dev, shard_batch(part), key,
            jnp.float32(1.0 / p), jnp.float32(1.0 / q),
            walk_length=walk_length, n_rows=n, tries=tries, bsteps=bsteps,
            chunk=_WALK2_CHUNK,
        )
    root = jax.random.PRNGKey(seed)
    for i, lo in enumerate(range(0, all_starts.shape[0], batch)):
        part = all_starts[lo:lo + batch]
        pad = _lane_pad(part.shape[0], batch, lo, mesh)
        if pad:
            part = np.concatenate([part, np.full(pad, n, dtype=np.int32)])
        out = run(part, jax.random.fold_in(root, i))
        if resident:
            yield out, pad
            continue
        w = np.asarray(out)
        yield w[: w.shape[0] - pad] if pad else w


def _unique_counts_u64(keys: np.ndarray):
    """Unique keys + occurrence counts via the native parallel radix sort
    (cleora_tpu.native.sort_u64; np.sort fallback).  The co-occurrence keys
    span only ~2·log2(n) bits, so the radix runs few passes — measured
    ~1.4x numpy's comparison sort at 200M keys on this host, and it frees
    the merge from numpy's single allocation spike (sort is in place)."""
    if keys.size == 0:
        return keys, np.empty(0, dtype=np.int64)
    from .native import sort_u64

    keys = sort_u64(keys)
    boundaries = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.nonzero(boundaries)[0]
    counts = np.diff(np.append(starts, keys.size))
    return keys[starts].copy(), counts


def _merge_counts(keys_parts, counts_parts):
    """Sort-reduce (keys, counts) fragments into unique keys + summed
    counts (fragments are each sorted — numpy's stable mergesort exploits
    the runs)."""
    keys = np.concatenate(keys_parts)
    counts = np.concatenate(counts_parts)
    order = np.argsort(keys, kind="stable")
    keys, counts = keys[order], counts[order]
    boundaries = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.nonzero(boundaries)[0]
    return keys[starts], np.add.reduceat(counts, starts)


def _walk_pair_counts(walk_batches, n: int, window: int):
    """Sparse symmetric windowed co-occurrence over walk batches, as
    (keys = center·n + context, counts).  Mirrors the dense accumulation in
    :func:`_walks_to_embeddings` without the n×n matrix.

    Per batch: pack every window offset's (center, context) pairs into one
    uint64 key array, radix-sort-reduce it (``_unique_counts_u64``), and
    fold the per-batch uniques into a bounded fragment list.  A device-side
    (lax.sort) reduction was considered and rejected for this stage: the
    raw pair stream is generated host-side from fetched walk batches, and
    on a tunneled runtime shipping multi-GB key arrays to the chip and the
    (barely smaller) unique set back costs more than the host sort it
    saves; the native radix core is the right tool (VERDICT r3 #5)."""
    acc_keys = [np.empty(0, dtype=np.uint64)]
    acc_counts = [np.empty(0, dtype=np.int64)]
    for walks in walk_batches:
        parts = []
        for off in range(1, window + 1):
            if off >= walks.shape[1]:
                break
            a = walks[:, :-off].ravel()
            b = walks[:, off:].ravel()
            m = (a < n) & (b < n)
            a = a[m].astype(np.uint64)
            b = b[m].astype(np.uint64)
            parts.append(a * np.uint64(n) + b)
            parts.append(b * np.uint64(n) + a)
        if not parts:
            continue
        batch_keys = np.concatenate(parts)
        parts.clear()
        u, c = _unique_counts_u64(batch_keys)
        del batch_keys
        acc_keys.append(u)
        acc_counts.append(c)
        if len(acc_keys) > 16:  # bound the fragment list
            k, c = _merge_counts(acc_keys, acc_counts)
            acc_keys, acc_counts = [k], [c]
    keys, counts = _merge_counts(acc_keys, acc_counts)
    return keys.astype(np.int64), counts


_ALIGN_JIT: dict = {}
_RSVD_STEP_JITS: dict = {}


def _rsvd_step_jits():
    """Unfused randomized-SVD steps (apply / QR / tail), one jit each.

    The fused ``_sparse_rsvd_jit`` program holds every intermediate of the
    whole subspace iteration in one XLA allocation plan; at walk-corpus
    scale (450M-slot operands) the measured 62% HBM fragmentation pushed
    it past the chip (a run at that shape crashed the TPU worker).  Driving
    the same math as separate dispatches bounds the peak at one step's
    working set — the operands plus a single (n, r) panel and one bounded
    chunk intermediate — at the cost of a few dispatch round-trips."""
    if not _RSVD_STEP_JITS:
        import functools

        import jax
        import jax.numpy as jnp

        from .ops.spmm import spmm_inner

        @functools.partial(jax.jit,
                           static_argnames=("n_rows", "chunk_edges"))
        def apply_m(layout, x, *, n_rows, chunk_edges):
            return spmm_inner(*layout, x, n_rows, chunk_edges=chunk_edges)

        @functools.partial(jax.jit,
                           static_argnames=("n_rows", "chunk_edges"),
                           donate_argnums=(2,))
        def apply_add(layout, x, acc, *, n_rows, chunk_edges):
            # one range's partial added into the running (n, r) result —
            # ranges are row-disjoint, so the adds are exact (each row's
            # value comes from exactly one range; the rest add 0.0)
            return acc + spmm_inner(*layout, x, n_rows,
                                    chunk_edges=chunk_edges)

        @jax.jit
        def qr_q(y):
            return jnp.linalg.qr(y)[0]

        @functools.partial(jax.jit, static_argnames=("k",))
        def tail(c, q, *, k):
            ub, s, _ = jnp.linalg.svd(c.T, full_matrices=False)
            su = jnp.sqrt(jnp.maximum(s[:k], 0.0))
            return (q @ ub[:, :k]) * su

        _RSVD_STEP_JITS.update(apply=apply_m, apply_add=apply_add,
                               qr=qr_q, tail=tail)
    return _RSVD_STEP_JITS


def _rsvd_flat(layout, chunk, n, k, omega, power_iters, feature_dim,
               out=None):
    """Shared unfused-rsvd driver: subspace iteration over the flat COO
    ``layout`` (chunk-aligned, so spmm_inner never pads in-trace), sign
    canonicalization, finalize.  Used by both the host-counted and the
    device-counted PPMI factorizations — one place for the iteration
    order and the sign convention.

    ``layout`` may be a LIST of per-range triples (the multi-pass counted
    corpus): the operator applies as one dispatch per range with a donated
    running accumulator — row-disjoint ranges add exactly, and the peak
    stays at the resident ranges + ONE (n, r) panel + one chunk
    intermediate.  (Concatenating the ranges into one flat COO doubled
    transient HBM and the compiler REJECTED the concat program at 839M
    slots on the v5e — round 5, measured.)

    ``out`` streams the finalized embedding straight into one standard
    ``.npy`` in bounded row chunks instead of materializing (n, d) on the
    host — the production exit for large n behind a tunneled runtime
    (same rationale as ``parallel.state.write_memmap``); returns a
    read-only memmap."""
    steps = _rsvd_step_jits()
    layouts = layout if isinstance(layout, list) else [layout]

    def m_apply(x):
        y = steps["apply"](layouts[0], x, n_rows=n, chunk_edges=chunk)
        for lay in layouts[1:]:
            y = steps["apply_add"](lay, x, y, n_rows=n, chunk_edges=chunk)
        return y
    y = m_apply(omega)
    del omega
    for _ in range(power_iters):  # M symmetric
        y = m_apply(m_apply(steps["qr"](y)))
    q = steps["qr"](y)
    del y
    u_su_dev = steps["tail"](m_apply(q), q, k=k)
    return _finalize_factor(u_su_dev, feature_dim, out)


def _finalize_factor(u_su_dev, feature_dim: int, out):
    """Shared rsvd exit: sign canonicalization + finalize, either as a
    bounded-chunk host fetch or streamed into ``out`` (.npy).  One place
    for the sign convention across the single-device and mesh-sharded
    factorizations."""
    if out is not None:
        return _stream_finalize_npy(u_su_dev, feature_dim, out)
    # bounded-chunk fetch (the measured 418 s vs 135 s factorize spread
    # was this ~0.5 GB fetch hitting a slow tunnel window)
    u_su = _fetch_f64(u_su_dev)
    pick = np.argmax(np.abs(u_su), axis=0)
    sign = np.sign(u_su[pick, np.arange(u_su.shape[1])])
    sign[sign == 0] = 1.0
    return _finalize(u_su * sign, feature_dim)


def _stream_finalize_npy(dev, feature_dim: int, path: str):
    """Sign-canonicalize + ``_finalize`` a device (n, k) factor and stream
    it into ``path`` (one standard float32 ``.npy``) in bounded row
    chunks; the host never holds more than one chunk.  The sign rule (the
    largest-|u| entry of each column made positive, first row on ties) is
    computed ON device and matches the host path exactly — argmax
    tie-breaking is first-index in both numpy and XLA, and the f32→f64
    cast preserves comparisons.  Returns a read-only memmap."""
    import os

    import jax

    import jax.numpy as jnp

    from .parallel.state import _fetch_chunk_rows

    if "sign" not in _ALIGN_JIT:
        def _sign(u):
            pick = jnp.argmax(jnp.abs(u), axis=0)
            s = jnp.sign(u[pick, jnp.arange(u.shape[1])])
            return jnp.where(s == 0, 1.0, s)

        _ALIGN_JIT["sign"] = jax.jit(_sign)
    sign = np.asarray(_ALIGN_JIT["sign"](dev)).astype(np.float64)
    n, k = int(dev.shape[0]), int(dev.shape[1])
    tmp = path + ".tmp"
    mm = np.lib.format.open_memmap(
        tmp, mode="w+", dtype=np.float32, shape=(n, feature_dim))
    step = _fetch_chunk_rows(4 * k)
    for lo in range(0, n, step):
        block = np.asarray(dev[lo:lo + step]).astype(np.float64) * sign
        mm[lo:lo + block.shape[0]] = _finalize(block, feature_dim)
    mm.flush()
    del mm
    os.replace(tmp, path)
    return np.load(path, mmap_mode="r")


def _chunk_aligned_host(srow, scol, sval, n, chunk):
    """Host-side COO padding that always yields a chunk-compatible length
    (≤ chunk, or an exact chunk multiple) — a misaligned > chunk length
    would make spmm_inner pad in-trace, copying the multi-GB operands
    inside the compiled program.  Small inputs keep pad_coo's geometric
    buckets for compile reuse unless the bucket itself would cross the
    chunk boundary."""
    from .ops.spmm import pad_coo

    length = srow.shape[0]
    if length <= chunk:
        prow, pcol, pval = pad_coo(srow, scol, sval, n)
        if prow.shape[0] <= chunk:
            return prow, pcol, pval
        target = chunk
    else:
        target = -(-length // chunk) * chunk
    if target == length:
        return srow, scol, sval
    pad = target - length
    return (
        np.concatenate([srow, np.full(pad, max(n - 1, 0), np.int32)]),
        np.concatenate([scol, np.zeros(pad, np.int32)]),
        np.concatenate([sval, np.zeros(pad, np.float32)]),
    )


def _counts_to_embeddings(keys, counts, n: int, feature_dim: int,
                          factorization: str = "host", seed: int = 0,
                          oversample: int = 16, power_iters: int = 4):
    """Sparse positive-PMI factorization — numerically identical to the
    dense path (:func:`_walks_to_embeddings`) on the entries it keeps:
    entries with PMI ≤ 0 are exactly the dense matrix's zeros.

    ``factorization="device"`` replaces the host ARPACK ``svds`` (the
    dominant host stage at scale: hundreds of sequential sparse matvecs
    on a few cores) with a randomized SVD on the TPU — the PPMI matrix
    uses the FLAT chunk-aligned COO layout (walk-corpus densities defeat
    the ELL fusion and its slabs OOM — RESULTS.md round 4) driven by the
    unfused per-step dispatches (:func:`_rsvd_flat`).  Accuracy is the
    randomized-SVD guarantee (tunable via ``oversample``/``power_iters``);
    column signs are canonicalized the same way as the host path."""
    if keys.shape[0] == 0:
        return _finalize(np.zeros((n, 1), dtype=np.float64), feature_dim)
    rows = keys // n
    cols = keys % n
    counts = counts.astype(np.float64)
    total = counts.sum()
    row_sums = np.zeros(n)
    col_sums = np.zeros(n)
    np.add.at(row_sums, rows, counts)
    np.add.at(col_sums, cols, counts)
    rs = np.maximum(row_sums, 1e-10)
    cs = np.maximum(col_sums, 1e-10)
    pmi = np.log(
        np.maximum(counts * total / (rs[rows] * cs[cols]), 1e-15)
    )
    keep = pmi > 0
    k = min(feature_dim, n - 1)
    if k < 1 or not bool(keep.any()):
        return _finalize(np.zeros((n, 1), dtype=np.float64), feature_dim)

    if factorization == "device":
        krows = rows[keep].astype(np.int64)
        kcols = cols[keep].astype(np.int64)
        kvals = pmi[keep].astype(np.float32)
        order = np.argsort(krows, kind="stable")
        r = min(n, k + oversample)
        # the PPMI matrix is often far denser than the graph (every
        # windowed pair is a potential nonzero) — pre-check HBM like the
        # other device loops instead of failing in the XLA allocator;
        # same sketch-width margin convention as device HOPE
        from .ops.memory import check_device_fit

        try:
            check_device_fit(n, max(1, (3 * r) // 2), krows.shape[0])
        except ValueError as e:
            raise ValueError(
                f"{e} For the walk pipeline specifically: fewer walks, a "
                "smaller window, or factorization='host' (ARPACK) all "
                "shrink or avoid the device PPMI factorization."
            ) from None
        # flat chunked COO, NOT the ELL plan: at walk-corpus densities
        # (100M+ nnz) the rsvd's take-then-gather pattern defeats XLA's
        # gather+reduce fusion and the (slots, r) ELL slabs materialize —
        # observed OOM at 450M nnz with ~20 rematerialized 7 GiB slabs.
        # The flat path's scan keeps the intermediate at one bounded
        # (chunk, r) buffer, and the rsvd is seconds either way.  Padding
        # is chunk-ALIGNED on the host before upload, and the subspace
        # iteration runs as the UNFUSED per-step dispatches — the fused
        # whole-rsvd program fragments HBM and crashed the TPU worker at
        # 450M slots (see _rsvd_step_jits; same fixes as the
        # device-counted path).
        from .ops.spmm import _chunk_edges_for

        import jax.numpy as jnp

        chunk = _chunk_edges_for(n, r, edge_bytes=12 * krows.shape[0])
        prow, pcol, pval = _chunk_aligned_host(
            krows[order].astype(np.int32), kcols[order].astype(np.int32),
            kvals[order], n, chunk,
        )
        layout = tuple(jnp.asarray(a) for a in (prow, pcol, pval))
        rng = np.random.default_rng(seed)
        omega = jnp.asarray(rng.standard_normal((n, r)).astype(np.float32))
        return _rsvd_flat(layout, chunk, n, k, omega, power_iters,
                          feature_dim)
    if factorization != "host":
        raise ValueError(
            f"Unknown factorization '{factorization}'. Use 'host' or "
            "'device'."
        )

    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import svds

    M = coo_matrix(
        (pmi[keep], (rows[keep], cols[keep])), shape=(n, n)
    ).tocsr()
    if M.nnz == 0:
        return _finalize(np.zeros((n, 1), dtype=np.float64), feature_dim)
    u, s, _ = svds(M, k=k)
    order = np.argsort(-s)
    u = u[:, order]
    # canonical column signs (ARPACK's are run-dependent): largest-|u| entry
    # positive per column, ties broken by the first such row
    pick = np.argmax(np.abs(u), axis=0)
    sign = np.sign(u[pick, np.arange(u.shape[1])])
    sign[sign == 0] = 1.0
    emb = (u * sign) * np.sqrt(np.maximum(s[order], 0))
    return _finalize(emb, feature_dim)


def _validate_cooccurrence(cooccurrence: str, backend: str,
                           factorization) -> str:
    """Validate the walk-pipeline mode combination; resolve the
    factorization default (None → 'host').  cooccurrence='device' always
    factorizes on device, so an EXPLICIT factorization='host' alongside
    it is a contradiction, not a silently-ignored preference.
    factorization='sharded' (mesh-sharded rsvd, parallel/cooccur.py)
    consumes device-resident count ranges, so it exists only under
    device counting."""
    if cooccurrence not in ("host", "device"):
        raise ValueError(
            f"Unknown cooccurrence '{cooccurrence}'. Use 'host' or 'device'."
        )
    if factorization not in (None, "host", "device", "sharded"):
        raise ValueError(
            f"Unknown factorization '{factorization}'. Use 'host', "
            "'device' or 'sharded'."
        )
    if cooccurrence == "device":
        if backend != "device":
            raise ValueError(
                "cooccurrence='device' requires backend='device'")
        if factorization == "host":
            raise ValueError(
                "cooccurrence='device' runs the PPMI factorization on "
                "device; omit factorization or pass 'device'/'sharded'"
            )
        return factorization or "device"
    if factorization == "sharded":
        raise ValueError(
            "factorization='sharded' requires cooccurrence='device' (it "
            "factorizes the device-resident count ranges in place)"
        )
    return factorization or "host"


def _walk_fingerprint(graph, with_vals: bool, params: dict) -> str:
    """Content fingerprint of a walk-pipeline run: every byte of the CSR
    arrays the walk engine actually consumes (indptr/cols, plus weights
    for the second-order engine) + the walk/counting parameters.  Keyed
    the same way as ``parallel.state.content_digest`` — full-content, not
    sampled, so checkpoint resume can never silently reuse counts from a
    different graph.  The walk CSR is cached per graph, so the arrays are
    already materialized for the run itself."""
    import hashlib
    import json

    h = hashlib.blake2b(digest_size=16)
    arrs = _walk_csr(graph, with_vals=with_vals)
    indptr, cols = arrs[0], arrs[1]
    h.update(np.ascontiguousarray(indptr).data)
    h.update(np.ascontiguousarray(cols).data)
    if with_vals:
        h.update(np.ascontiguousarray(arrs[4]).data)
    h.update(json.dumps(params, sort_keys=True, default=str).encode())
    return h.hexdigest()


def _write_npy(emb: np.ndarray, path: str):
    """Persist a host-resident embedding as ``path`` (.npy, atomic) and
    return the read-only memmap — the host-path twin of the streamed
    device exit, so ``out=`` has one contract everywhere."""
    import os

    tmp = path + ".tmp"
    mm = np.lib.format.open_memmap(
        tmp, mode="w+", dtype=np.float32, shape=emb.shape)
    mm[:] = emb
    mm.flush()
    del mm
    os.replace(tmp, path)
    return np.load(path, mmap_mode="r")


def _validate_lifecycle(graph, backend: str, cooccurrence: str,
                        checkpoint_dir) -> None:
    """Lifecycle-argument validation for the walk pipeline.  Counting
    checkpoints exist only where counting runs on device (the host
    sort-reduce path has no pass structure to checkpoint); DiskGraph
    input needs the device walk engines (the host walker builds Python
    adjacency lists — materializing them defeats the streamed build)."""
    if checkpoint_dir is not None and cooccurrence != "device":
        raise ValueError(
            "checkpoint_dir requires cooccurrence='device' (the counting "
            "checkpoint is per device counting pass)"
        )
    if backend != "device" and not hasattr(graph, "to_sparse_csr"):
        raise ValueError(
            "DiskGraph input requires backend='device' (or materialize "
            "with graph.to_sparse_matrix() for the host walker)"
        )


def _walk_mesh(mesh, n_devices):
    if mesh is not None or n_devices is None:
        return mesh
    from .parallel.mesh import make_mesh

    return make_mesh(n_devices)


# a counting pass's sort-merge working set stays well under HBM when the
# pass sees at most this many (pre-dedup) pairs; the driver hash-partitions
# bigger corpora into ceil(pairs / this) passes over regenerated walks
_COOC_PASS_PAIRS = 200_000_000


def _cooc_passes(graph, num_walks: int, walk_length: int,
                 window_size: int) -> int:
    """Counting passes for :func:`ops.cooccur.device_pair_counts`, from the
    worst-case (all-unique) pair count of the walk corpus.  Walkable-start
    counting uses the walk engine's OWN degree table (self-loops removed —
    raw indptr degrees overcount on reflexive graphs and each phantom pass
    re-sweeps the whole corpus)."""
    deg = _walk_csr(graph)[2]
    starts = int((deg > 0).sum()) * num_walks
    w = min(window_size, walk_length - 1)
    per_walk = 2 * (w * walk_length - w * (w + 1) // 2)
    return max(1, -(-starts * per_walk // _COOC_PASS_PAIRS))


def _walks_ppmi_device(graph, feature_dim, window_size, seed, batches_fn,
                       passes=1, oversample=16, power_iters=4, mesh=None,
                       checkpoint_dir=None, checkpoint_every=1, out=None,
                       fp_params=None, factorization="device"):
    """Fully device-resident walks → co-occurrence → PPMI → randomized SVD.

    ``batches_fn()`` returns a fresh iterable of resident
    ``(device_walks, pad)`` pairs (either walk engine; deterministic per
    seed, so counting passes regenerate identical walks).  Pair counting,
    the PMI transform, and the factorization all stay on the device
    (ops/cooccur.py); only scalar unique counts and the final (n, k)
    embedding cross the host link — the right trade on tunneled runtimes
    where the host sort-reduce dominates the measured e2e (RESULTS.md).
    Counts are integer-exact vs the host sort-reduce; the factorization
    matches ``factorization="device"`` up to the RNG of the sketch
    (device PRNG here, host ``default_rng`` there).

    A multi-device ``mesh`` fans the counting passes out across its
    devices (disjoint hash partitions, no collectives —
    ops/cooccur.py:_pair_counts_pass_parallel); the factorization then
    runs on the first device, where its flat COO must fit regardless.

    Production lifecycle (the canonical loop has had this since round 3;
    the reference's DeepWalk is an unresumable host loop,
    /root/reference/pycleora/algorithms.py:248-369):

    * ``checkpoint_dir`` — per-pass durable counting
      (:class:`ops.cooccur.CountCheckpoint`, keyed by a full-content
      fingerprint of the walk CSR + parameters); a killed run resumes
      from the completed partitions, and a COMPLETED run (finished
      ``out`` + done marker) returns its memmap immediately.
    * ``checkpoint_every`` — persist every k-th pass (1 = all).
    * ``out`` — stream the final embedding into one ``.npy`` in bounded
      row chunks (no (n, d) host materialization, no multi-GB fetch);
      defaults to ``<checkpoint_dir>/embedding.npy`` when checkpointing.
    """
    from .ops.cooccur import CountCheckpoint, device_pair_counts

    checkpoint = None
    fact_params = dict(feature_dim=feature_dim, oversample=oversample,
                       power_iters=power_iters,
                       factorization=factorization)
    if checkpoint_dir is not None:
        fp = _walk_fingerprint(
            graph,
            bool(fp_params and fp_params.get("engine") == "walk2"),
            dict(fp_params or {}, window=window_size, passes=passes,
                 n=graph.num_entities, seed=seed),
        )
        checkpoint = CountCheckpoint(checkpoint_dir, fp,
                                     every=checkpoint_every)
        if out is None:
            import os

            out = os.path.join(checkpoint_dir, "embedding.npy")
        done = checkpoint.done_result(feature_dim, fact_params)
        if done is not None:
            return done

    devices = None
    if mesh is not None and mesh.devices.size > 1 and passes > 1:
        # pass-parallel counting drives each device from a host thread
        # with direct device_put — only THIS process's devices are
        # addressable, so on a multi-host mesh the fan-out is restricted
        # to the local devices (each process then computes all passes —
        # redundant across hosts but correct, exactly like the
        # sequential path under SPMD).  Fewer than 2 local devices falls
        # back to sequential counting.
        import jax

        me = jax.process_index()
        local = [d for d in mesh.devices.flat if d.process_index == me]
        if len(local) > 1:
            devices = local
    n = graph.num_entities
    ranges, m_total = device_pair_counts(batches_fn, n, window_size,
                                         passes=passes, devices=devices,
                                         checkpoint=checkpoint,
                                         gather_home=False)
    emb = _factorize_ranges(ranges, m_total, n, feature_dim, seed,
                            oversample=oversample, power_iters=power_iters,
                            out=out, factorization=factorization)
    if checkpoint is not None:
        checkpoint.mark_done(out, emb.shape, fact_params)
    return emb


def _factorize_ranges(ranges, m_total, n, feature_dim, seed,
                      oversample=16, power_iters=4, out=None,
                      factorization="device"):
    """Factorization-placement decision for counted ranges:
    ``factorization='sharded'`` keeps each partition on its counting
    device and runs the mesh rsvd (parallel/cooccur.py); ``'device'``
    (the default) homes the partitions onto one chip — unless they no
    longer FIT one chip, in which case the sharded path engages
    automatically (that capacity is exactly what it exists for).  Shared
    by the public pipeline and scripts/deepwalk_e2e.py so the runbook's
    auto-engage claim holds on both entry points."""
    from .parallel.cooccur import home_ranges, range_device

    if ranges and any(range_device(r) is None for r in ranges):
        # ranges counted from mesh-REPLICATED walk batches (sharded-table
        # walks + sequential counting) are replicated across the mesh —
        # collapse to one device before deciding placement
        ranges = home_ranges(ranges)
    use_sharded = factorization == "sharded"
    spread = len({range_device(r) for r in ranges}) > 1 \
        if ranges else False
    if not use_sharded and spread:
        from .ops.memory import check_device_fit

        r_ = min(n, min(feature_dim, n - 1) + oversample)
        slots = sum(int(c.shape[0]) for c, _, _, _ in ranges)
        try:
            check_device_fit(n, max(1, (3 * r_) // 2), slots)
        except ValueError:
            use_sharded = True
    if use_sharded:
        from .parallel.cooccur import sharded_counts_to_embeddings

        return sharded_counts_to_embeddings(
            ranges, m_total, n, feature_dim, seed, oversample=oversample,
            power_iters=power_iters, out=out,
        )
    if spread:
        ranges = home_ranges(ranges)
    return _device_counts_to_embeddings(ranges, m_total, n, feature_dim,
                                        seed, oversample=oversample,
                                        power_iters=power_iters, out=out)


def _device_counts_to_embeddings(ranges, m_total, n, feature_dim, seed,
                                 oversample=16, power_iters=4, out=None):
    """PPMI + randomized SVD over device-resident unique pair ranges.

    ``out`` streams the result into a ``.npy`` (see :func:`_rsvd_flat`)."""
    import jax

    import jax.numpy as jnp

    from ._util import maybe_enable_compile_cache
    from .ops.cooccur import ppmi_ranges
    from .ops.memory import check_device_fit

    maybe_enable_compile_cache()
    k = min(feature_dim, n - 1)
    if m_total == 0 or k < 1:
        empty = _finalize(np.zeros((n, 1), dtype=np.float64), feature_dim)
        return _write_npy(empty, out) if out is not None else empty
    r = min(n, k + oversample)
    slots = sum(int(c.shape[0]) for c, _, _, _ in ranges)
    try:
        check_device_fit(n, max(1, (3 * r) // 2), slots)
    except ValueError as e:
        raise ValueError(
            f"{e} For the walk pipeline specifically: fewer walks, a "
            "smaller window, or cooccurrence='host' with "
            "factorization='host' all shrink the device footprint."
        ) from None
    parts = list(ppmi_ranges(ranges, n))
    del ranges
    # Chunk-ALIGN each range on device, then hand the rsvd the PER-RANGE
    # layouts.  Alignment first: spmm_inner pads misaligned COO in-trace,
    # which copies the multi-GB operand arrays inside the compiled
    # program — at 450M slots those copies alone exceeded HBM at compile
    # time (measured 16.53G of 15.75G); aligned, reshape-into-chunks is a
    # free alias.  The ranges are NOT concatenated into one flat triple:
    # the concat transiently doubles the COO bytes (inputs + outputs
    # co-resident) and the compiler rejected that program outright at
    # 839M slots (round 5, num_walks=2 at 1M nodes) — the rsvd instead
    # applies one dispatch per range with a single donated accumulator
    # (row-disjoint ranges add exactly; see _rsvd_flat), keeping the
    # peak at the resident ranges + one (n, r) panel.
    from .ops.spmm import _chunk_edges_for

    chunk = _chunk_edges_for(n, r, edge_bytes=12 * sum(
        int(p[0].shape[0]) for p in parts))
    if "align" not in _ALIGN_JIT:
        def _align(rows, cols, vals, *, out_len, n_rows):
            pad = out_len - rows.shape[0]
            return (jnp.pad(rows, (0, pad), constant_values=n_rows - 1),
                    jnp.pad(cols, (0, pad)), jnp.pad(vals, (0, pad)))

        _ALIGN_JIT["align"] = jax.jit(
            _align, static_argnames=("out_len", "n_rows"))
    multi = len(parts) > 1
    aligned = []
    while parts:
        rows, cols, vals = parts.pop(0)
        length = int(rows.shape[0])
        if length > chunk and length % chunk:
            target = -(-length // chunk) * chunk
            rows, cols, vals = _ALIGN_JIT["align"](
                rows, cols, vals, out_len=target, n_rows=n)
        aligned.append((rows, cols, vals))
        del rows, cols, vals
    layout = aligned if multi else aligned[0]
    omega = jax.random.normal(
        jax.random.PRNGKey(seed ^ 0x5EED), (n, r), dtype=jnp.float32)
    return _rsvd_flat(layout, chunk, n, k, omega, power_iters, feature_dim,
                      out=out)


def _deepwalk_device(graph, feature_dim, num_walks, walk_length, window_size,
                     seed, factorization="host", mesh=None, n_devices=None,
                     cooccurrence="host", checkpoint_dir=None,
                     checkpoint_every=1, out=None, walk_tables="auto"):
    mesh = _walk_mesh(mesh, n_devices)
    if cooccurrence == "device":
        # half-size batches: the counting pass's sort working set shares
        # HBM with finished ranges, and walk generation stays saturated
        return _walks_ppmi_device(
            graph, feature_dim, window_size, seed,
            lambda: _device_walks(graph, num_walks, walk_length, seed,
                                  batch=_WALK_BATCH // 2, mesh=mesh,
                                  resident=True, walk_tables=walk_tables),
            passes=_cooc_passes(graph, num_walks, walk_length, window_size),
            mesh=mesh, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, out=out,
            fp_params=dict(engine="walk1", num_walks=num_walks,
                           walk_length=walk_length),
            factorization=factorization,
        )
    batches = _device_walks(graph, num_walks, walk_length, seed, mesh=mesh,
                            walk_tables=walk_tables)
    keys, counts = _walk_pair_counts(batches, graph.num_entities, window_size)
    emb = _counts_to_embeddings(keys, counts, graph.num_entities,
                                feature_dim, factorization=factorization,
                                seed=seed)
    return _write_npy(emb, out) if out is not None else emb


def _node2vec_device(graph, feature_dim, num_walks, walk_length, window_size,
                     p, q, seed, factorization="host", mesh=None,
                     n_devices=None, cooccurrence="host", checkpoint_dir=None,
                     checkpoint_every=1, out=None, walk_tables="auto"):
    mesh = _walk_mesh(mesh, n_devices)
    if cooccurrence == "device":
        return _walks_ppmi_device(
            graph, feature_dim, window_size, seed,
            lambda: _device_walks2(graph, num_walks, walk_length, p, q,
                                   seed, mesh=mesh, resident=True,
                                   walk_tables=walk_tables),
            passes=_cooc_passes(graph, num_walks, walk_length, window_size),
            mesh=mesh, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, out=out,
            fp_params=dict(engine="walk2", num_walks=num_walks,
                           walk_length=walk_length, p=p, q=q),
            factorization=factorization,
        )
    batches = _device_walks2(graph, num_walks, walk_length, p, q, seed,
                             mesh=mesh, walk_tables=walk_tables)
    keys, counts = _walk_pair_counts(batches, graph.num_entities, window_size)
    emb = _counts_to_embeddings(keys, counts, graph.num_entities,
                                feature_dim, factorization=factorization,
                                seed=seed)
    return _write_npy(emb, out) if out is not None else emb


# -------------------------------------------------------------- random walks
def _build_adj_list(graph):
    """Out-neighbor lists + weights, self-loops dropped
    (reference algorithms.py:248-259)."""
    rows, cols, vals, n, _ = graph.to_sparse_csr()
    adj = [[] for _ in range(n)]
    weights = [[] for _ in range(n)]
    for r, c, v in zip(rows, cols, vals):
        if r != c:
            adj[r].append(int(c))
            weights[r].append(float(v))
    return adj, weights, n


def _random_walks(adj, weights, n, num_walks, walk_length, p, q, seed):
    """p/q-biased second-order walks; identical RNG stream to the reference
    (algorithms.py:262-312): uniform first step, alpha-reweighted after."""
    rng = np.random.default_rng(seed)
    walks = []
    uniform = p == 1.0 and q == 1.0
    for _ in range(num_walks):
        for start in range(n):
            if not adj[start]:
                continue
            walk = [start]
            prev, curr = -1, start
            for _ in range(walk_length - 1):
                neighbors = adj[curr]
                if not neighbors:
                    break
                if prev == -1 or uniform:
                    nxt = neighbors[rng.integers(len(neighbors))]
                else:
                    w = np.array(weights[curr], dtype=np.float64)
                    alpha = np.ones(len(neighbors), dtype=np.float64)
                    prev_nb = set(adj[prev]) if adj[prev] else set()
                    for j, nb in enumerate(neighbors):
                        if nb == prev:
                            alpha[j] = 1.0 / p
                        elif nb not in prev_nb:
                            alpha[j] = 1.0 / q
                    probs = w * alpha
                    total = probs.sum()
                    if total < 1e-15:
                        break
                    nxt = neighbors[rng.choice(len(neighbors), p=probs / total)]
                walk.append(nxt)
                prev, curr = curr, nxt
            walks.append(walk)
    return walks


def _walks_to_embeddings(walks, n, feature_dim, window_size):
    """Windowed co-occurrence → positive PMI → SVD
    (reference algorithms.py:315-349)."""
    cooccur = np.zeros((n, n), dtype=np.float64)
    for walk in walks:
        arr = np.asarray(walk)
        L = len(arr)
        for offset in range(1, min(window_size, L - 1) + 1):
            np.add.at(cooccur, (arr[:-offset], arr[offset:]), 1.0)
            np.add.at(cooccur, (arr[offset:], arr[:-offset]), 1.0)

    row_sums = np.maximum(cooccur.sum(axis=1, keepdims=True), 1e-10)
    col_sums = np.maximum(cooccur.sum(axis=0, keepdims=True), 1e-10)
    total = cooccur.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(np.maximum(cooccur * total / (row_sums * col_sums), 1e-15))
    pmi = np.maximum(pmi, 0.0)
    return _finalize(_svd_sqrt(pmi, min(feature_dim, pmi.shape[1])), feature_dim)


def embed_deepwalk(
    graph,
    feature_dim: int = 256,
    num_walks: int = 10,
    walk_length: int = 80,
    window_size: int = 5,
    seed: int = 0,
    backend: str = "host",
    factorization: Optional[str] = None,
    mesh=None,
    n_devices: Optional[int] = None,
    cooccurrence: str = "host",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    out: Optional[str] = None,
    walk_tables: str = "auto",
) -> np.ndarray:
    """DeepWalk = uniform walks + PMI + SVD (reference algorithms.py:352-361).

    ``backend="device"`` generates the walks on the TPU (batched CSR-gather
    hops under lax.scan) and factorizes a SPARSE positive-PMI matrix, so
    neither the Python per-step walk loop nor the dense n×n co-occurrence
    matrix limits scale.  Same semantics, different (device) RNG stream.
    ``factorization="device"`` additionally runs the PPMI SVD as a
    randomized SVD on the TPU's production SpMM layout instead of host
    ARPACK — the right choice at 1M+ nodes, where the host ``svds`` is
    the dominant stage (randomized-SVD accuracy).  ``mesh=``/``n_devices=``
    shards each batch's walk lanes across the devices (tables replicated;
    value-identical outputs, N× walk throughput per dispatch).
    ``cooccurrence="device"`` keeps the walks device-resident and counts
    the windowed pairs on the TPU too (ops/cooccur.py — sort-reduce +
    tree merge), implying the device factorization; integer-exact counts,
    the right choice when the host's sort-reduce dominates e2e.

    Production lifecycle (device pipeline): ``checkpoint_dir=`` makes the
    counting stage durable per hash partition and resumes a killed run
    (byte-identical output — counts round-trip exactly and everything
    downstream is deterministic); ``checkpoint_every=k`` persists every
    k-th pass; ``out="path.npy"`` streams the final embedding to disk in
    bounded chunks and returns a read-only memmap (accepted by every
    backend; required plumbing for n where (n, d) exceeds host RAM or the
    fetch link).  ``graph`` may be a ``DiskGraph`` (streamed build) when
    ``backend="device"`` — the walk CSR is assembled from the on-disk
    arrays without materializing entity ids.  ``walk_tables`` places the
    walk engine's CSR: 'auto' (fit-checked), 'replicated', or 'sharded'
    (row-partitioned over the mesh with owner-routed hops,
    value-identical walks — the capacity mode for edge lists past one
    chip's HBM)."""
    factorization = _validate_cooccurrence(cooccurrence, backend,
                                           factorization)
    _validate_lifecycle(graph, backend, cooccurrence, checkpoint_dir)
    if backend == "device":
        return _deepwalk_device(
            graph, feature_dim, num_walks, walk_length, window_size, seed,
            factorization=factorization, mesh=mesh, n_devices=n_devices,
            cooccurrence=cooccurrence, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, out=out,
            walk_tables=walk_tables,
        )
    if factorization == "device":
        raise ValueError("factorization='device' requires backend='device'")
    adj, weights, n = _build_adj_list(graph)
    walks = _random_walks(adj, weights, n, num_walks, walk_length, 1.0, 1.0, seed)
    emb = _walks_to_embeddings(walks, n, feature_dim, window_size)
    return _write_npy(emb, out) if out is not None else emb


def embed_node2vec(
    graph,
    feature_dim: int = 256,
    num_walks: int = 10,
    walk_length: int = 80,
    window_size: int = 5,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
    backend: str = "host",
    factorization: Optional[str] = None,
    mesh=None,
    n_devices: Optional[int] = None,
    cooccurrence: str = "host",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    out: Optional[str] = None,
    walk_tables: str = "auto",
) -> np.ndarray:
    """Node2Vec = p/q-biased walks + PMI + SVD (reference algorithms.py:364-369).

    ``backend="device"`` runs on the TPU for ANY p, q: the uniform case
    (p == q == 1, the reference default) uses the first-order engine; the
    biased case uses composition + rejection sampling with an exact
    backtrack component and a binary-search common-neighbor test
    (:func:`_device_walk2_jit`) — correct Node2Vec transition
    probabilities up to a uniform-fallback mixing weight (1−a)^tries on
    proposal-budget exhaustion; acceptance is independent of p, so the
    residual regimes are only q ≫ 1 with rare common neighbors (budget
    scales with q) and heavily skewed edge weights.  Host-path semantics
    otherwise (incl. dead-row termination), different (device) RNG
    stream.  ``checkpoint_dir``/``checkpoint_every``/``out`` give the
    device pipeline the production lifecycle — see
    :func:`embed_deepwalk`; checkpointing pays off MOST here, where walk
    regeneration is the expensive stage (rejection sampling)."""
    if p <= 0.0 or q <= 0.0:
        raise ValueError("p and q must be positive")
    factorization = _validate_cooccurrence(cooccurrence, backend,
                                           factorization)
    _validate_lifecycle(graph, backend, cooccurrence, checkpoint_dir)
    if backend == "device":
        if p == 1.0 and q == 1.0:
            return _deepwalk_device(
                graph, feature_dim, num_walks, walk_length, window_size,
                seed, factorization=factorization, mesh=mesh,
                n_devices=n_devices, cooccurrence=cooccurrence,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every, out=out,
                walk_tables=walk_tables,
            )
        return _node2vec_device(
            graph, feature_dim, num_walks, walk_length, window_size, p, q,
            seed, factorization=factorization, mesh=mesh,
            n_devices=n_devices, cooccurrence=cooccurrence,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            out=out, walk_tables=walk_tables,
        )
    if factorization == "device":
        raise ValueError("factorization='device' requires backend='device'")
    adj, weights, n = _build_adj_list(graph)
    walks = _random_walks(adj, weights, n, num_walks, walk_length, p, q, seed)
    emb = _walks_to_embeddings(walks, n, feature_dim, window_size)
    return _write_npy(emb, out) if out is not None else emb


def list_algorithms() -> List[Dict]:
    """Registry (reference algorithms.py:372-389)."""
    return [
        {"name": "prone", "function": "embed_prone",
         "description": "ProNE: Spectral propagation with Chebyshev polynomials. "
                        "Fast and high quality."},
        {"name": "randne", "function": "embed_randne",
         "description": "RandNE: Random projection embedding. Extremely fast, "
                        "good for very large graphs."},
        {"name": "hope", "function": "embed_hope",
         "description": "HOPE: High-Order Proximity Embedding. Asymmetric, good "
                        "for directed graphs."},
        {"name": "netmf", "function": "embed_netmf",
         "description": "NetMF: Network Matrix Factorization. Theoretical "
                        "generalization of DeepWalk."},
        {"name": "grarep", "function": "embed_grarep",
         "description": "GraRep: Multi-scale matrix factorization with k-step "
                        "transitions."},
        {"name": "deepwalk", "function": "embed_deepwalk",
         "description": "DeepWalk: Random walk + SVD. The original graph "
                        "embedding algorithm."},
        {"name": "node2vec", "function": "embed_node2vec",
         "description": "Node2Vec: Biased random walk with p,q parameters "
                        "controlling BFS/DFS balance."},
    ]
