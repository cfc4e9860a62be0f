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


def whiten(x, n_components=None, eps: float = 1e-10):
    n = x.shape[0]
    if n <= 1:
        return x
    compute_dtype = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    xf = x.astype(compute_dtype)
    mean = jnp.mean(xf, axis=0)
    xc = xf - mean
    cov = jnp.dot(xc.T, xc, preferred_element_type=compute_dtype) / (n - 1)
    eigenvalues, eigenvectors = jnp.linalg.eigh(cov)
    # eigh returns ascending; reference sorts descending
    eigenvalues = eigenvalues[::-1]
    eigenvectors = eigenvectors[:, ::-1]
    if n_components is not None:
        eigenvalues = eigenvalues[:n_components]
        eigenvectors = eigenvectors[:, :n_components]
    scale = 1.0 / jnp.sqrt(jnp.maximum(eigenvalues, eps))
    transform = eigenvectors * scale
    return jnp.dot(xc, transform, preferred_element_type=compute_dtype).astype(x.dtype)
