"""Device kernel tests (CPU backend): SpMM, normalize, whiten, fused loops."""

import numpy as np
import pytest

import jax.numpy as jnp

from cleora_tpu.ops import (
    embed_loop,
    embed_loop_convergence,
    l1_normalize,
    l2_normalize,
    pad_coo,
    spectral_normalize,
    spmm,
)
from cleora_tpu.ops.whiten import whiten as device_whiten


def random_coo(n, nnz, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.random(nnz).astype(np.float32)
    return rows, cols, vals


def dense_from_coo(rows, cols, vals, n):
    A = np.zeros((n, n), dtype=np.float64)
    np.add.at(A, (rows.astype(int), cols.astype(int)), vals.astype(np.float64))
    return A


def test_spmm_matches_dense():
    n, nnz, d = 50, 300, 16
    rows, cols, vals = random_coo(n, nnz)
    x = np.random.default_rng(1).standard_normal((n, d)).astype(np.float32)
    A = dense_from_coo(rows, cols, vals, n)
    out = np.asarray(spmm(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                          jnp.asarray(x), n))
    assert np.allclose(out, A @ x, rtol=1e-5, atol=1e-5)


def test_spmm_with_padding():
    n, nnz, d = 37, 150, 8
    rows, cols, vals = random_coo(n, nnz)
    x = np.random.default_rng(2).standard_normal((n, d)).astype(np.float32)
    A = dense_from_coo(rows, cols, vals, n)
    prow, pcol, pval = pad_coo(rows, cols, vals, n, multiple=256)
    assert prow.shape[0] == 256
    assert np.all(prow[nnz:] == n - 1)  # padding keeps row-sortedness
    out = np.asarray(spmm(jnp.asarray(prow), jnp.asarray(pcol), jnp.asarray(pval),
                          jnp.asarray(x), n))
    assert np.allclose(out, A @ x, rtol=1e-5, atol=1e-5)


def test_l2_normalize():
    x = np.random.default_rng(0).standard_normal((20, 8)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    expected = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-10)
    assert np.allclose(out, expected, rtol=1e-6)
    # zero row → stays zero (norm clamped to 1e-10)
    z = np.zeros((1, 8), dtype=np.float32)
    assert np.allclose(np.asarray(l2_normalize(jnp.asarray(z))), 0.0)


def test_l1_normalize():
    x = np.random.default_rng(0).standard_normal((20, 8)).astype(np.float32)
    out = np.asarray(l1_normalize(jnp.asarray(x)))
    expected = x / np.maximum(np.abs(x).sum(axis=1, keepdims=True), 1e-10)
    assert np.allclose(out, expected, rtol=1e-6)


def test_spectral_normalize_geometry():
    x = np.random.default_rng(0).standard_normal((30, 8)).astype(np.float32)
    out = np.asarray(spectral_normalize(jnp.asarray(x)))
    # u*s preserves the Gram matrix of the row-normalized input
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-10)
    assert np.allclose(out @ out.T, xn @ xn.T, atol=1e-4)


def test_whiten_identity_covariance():
    x = np.random.default_rng(3).standard_normal((400, 16)).astype(np.float32) * 3 + 1
    w = np.asarray(device_whiten(jnp.asarray(x)))
    cov = np.cov(w, rowvar=False)
    assert np.allclose(cov, np.eye(16), atol=1e-2)


def test_whiten_matches_host_up_to_sign():
    # well-separated eigenvalues → eigenvectors unique up to sign
    rng = np.random.default_rng(4)
    scales = np.linspace(1, 10, 8)
    x = (rng.standard_normal((600, 8)) * scales).astype(np.float32)
    import cleora_tpu as ct

    w_dev = np.asarray(device_whiten(jnp.asarray(x)))
    w_host = ct.whiten_embeddings(x)
    assert np.allclose(np.abs(w_dev), np.abs(w_host), rtol=1e-2, atol=1e-2)


def test_whiten_n_components():
    x = np.random.default_rng(5).standard_normal((100, 16)).astype(np.float32)
    w = np.asarray(device_whiten(jnp.asarray(x), n_components=4))
    assert w.shape == (100, 4)


def test_embed_loop_matches_manual():
    n, nnz, d, iters = 40, 200, 8, 5
    rows, cols, vals = random_coo(n, nnz)
    A = dense_from_coo(rows, cols, vals, n)
    x0 = np.random.default_rng(6).standard_normal((n, d)).astype(np.float32)

    out = np.asarray(
        embed_loop(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                   jnp.asarray(x0), n_rows=n, num_iterations=iters)
    )
    x = x0.astype(np.float64)
    for _ in range(iters):
        x = A @ x
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-10)
    assert np.allclose(out, x, rtol=1e-4, atol=1e-4)


def test_embed_loop_residual():
    n, nnz, d = 30, 100, 4
    rows, cols, vals = random_coo(n, nnz, seed=7)
    A = dense_from_coo(rows, cols, vals, n)
    x0 = np.random.default_rng(8).standard_normal((n, d)).astype(np.float32)
    rw = 0.3
    out = np.asarray(
        embed_loop(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                   jnp.asarray(x0), n_rows=n, num_iterations=3, residual_weight=rw)
    )
    x = x0.astype(np.float64)
    for _ in range(3):
        y = A @ x
        y = (1 - rw) * y + rw * x
        x = y / np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-10)
    assert np.allclose(out, x, rtol=1e-4, atol=1e-4)


def test_embed_loop_convergence_early_stop():
    # a graph whose propagation converges quickly: stochastic matrix
    n, d = 20, 4
    rng = np.random.default_rng(9)
    dense = rng.random((n, n))
    dense /= dense.sum(1, keepdims=True)
    rows, cols = np.nonzero(dense)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order].astype(np.int32), cols[order].astype(np.int32)
    vals = dense[rows, cols].astype(np.float32)
    x0 = rng.standard_normal((n, d)).astype(np.float32)
    out, iters = embed_loop_convergence(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(x0),
        n_rows=n, max_iterations=100, convergence_threshold=1e-4,
    )
    assert int(iters) < 100
    # result is converged: one more step changes little
    out2, _ = embed_loop_convergence(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), out,
        n_rows=n, max_iterations=2, convergence_threshold=1e-4,
    )
    assert np.allclose(np.asarray(out), np.asarray(out2), atol=1e-3)
