"""Row normalization kernels.

Reference semantics: ``l2_normalize_inplace`` (/root/reference/src/embedding.rs:88-104)
uses ``max(norm, 1e-10)``; the Python layer's ``_normalize``
(/root/reference/pycleora/__init__.py:942-960) adds l1 / spectral / none modes.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-10


def l2_normalize(x):
    norms = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norms, EPS)


def l1_normalize(x):
    norms = jnp.sum(jnp.abs(x), axis=-1, keepdims=True)
    return x / jnp.maximum(norms, EPS)


def spectral_normalize(x):
    """L2-normalize rows then rescale by singular values: u * s of the SVD."""
    normalized = l2_normalize(x)
    u, s, _ = jnp.linalg.svd(normalized, full_matrices=False)
    return u * s


def normalize(x, method: str):
    if method == "l2":
        return l2_normalize(x)
    if method == "l1":
        return l1_normalize(x)
    if method == "spectral":
        return spectral_normalize(x)
    if method == "none":
        return x
    raise ValueError(
        f"Unknown normalization method: {method}. Use 'l2', 'l1', 'spectral', or 'none'."
    )
