"""PCA whitening on device.

Reference semantics: ``whiten_embeddings`` (/root/reference/pycleora/__init__.py:130-164):
mean-center, D×D covariance with 1/(n-1), eigendecomposition sorted by
descending eigenvalue, scale columns by 1/sqrt(max(λ, 1e-10)), project
(PCA whitening — projection onto principal components, NOT rotated back).

TPU design: the covariance is ONE (D, n)×(n, D) matmul on the MXU — no
chunking needed on device.  ``eigh`` on the tiny D×D matrix is replicated.
Accumulation happens in float32 on TPU (the reference uses float64 on host);
parity is tolerance-based.  Column sign conventions of eigh may differ from
numpy — downstream inner products / distances are invariant to them.
"""

from __future__ import annotations

import jax.numpy as jnp


def whiten(x, n_components=None, eps: float = 1e-10, mask=None, count=None):
    """``mask``/``count`` (canonical-shape plans, ops/spmm_ell.py): rows
    where ``mask`` ((n, 1) f32) is 0 are padding — they are excluded from
    the mean/covariance statistics (``count`` is the traced true row
    count) and forced back to exactly zero in the output, so padded state
    rows never contaminate the whitening."""
    n = x.shape[0]
    if mask is None and n <= 1:
        return x
    compute_dtype = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    xf = x.astype(compute_dtype)
    if mask is not None:
        m = mask.astype(compute_dtype)
        cnt = jnp.asarray(count, compute_dtype)
        mean = jnp.sum(xf * m, axis=0) / cnt
        xc = (xf - mean) * m
        denom = jnp.maximum(cnt - 1.0, 1.0)
    else:
        mean = jnp.mean(xf, axis=0)
        xc = xf - mean
        denom = n - 1
    cov = jnp.dot(xc.T, xc, preferred_element_type=compute_dtype) / denom
    eigenvalues, eigenvectors = jnp.linalg.eigh(cov)
    # eigh returns ascending; reference sorts descending
    eigenvalues = eigenvalues[::-1]
    eigenvectors = eigenvectors[:, ::-1]
    if n_components is not None:
        eigenvalues = eigenvalues[:n_components]
        eigenvectors = eigenvectors[:, :n_components]
    scale = 1.0 / jnp.sqrt(jnp.maximum(eigenvalues, eps))
    transform = eigenvectors * scale
    out = jnp.dot(xc, transform, preferred_element_type=compute_dtype)
    if mask is not None:
        # parity with the unmasked n <= 1 early-return: a single real row
        # passes through unwhitened (count is traced, so select not branch)
        out = jnp.where(cnt > 1.5, out, xf * m)
    return out.astype(x.dtype)
