"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def to_host(arr) -> np.ndarray:
    """Device array → WRITABLE host ndarray.

    np.asarray over a JAX array yields a read-only view; the reference's
    public API returns plain numpy that users mutate in place
    (e.g. the README's ``embeddings /= np.linalg.norm(...)``), so every
    user-facing return must be writable.
    """
    out = np.asarray(arr)
    if not out.flags.writeable:
        out = out.copy()
    return out
