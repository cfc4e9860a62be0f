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


_CACHE_CONFIGURED = False


def maybe_enable_compile_cache() -> None:
    """Enable JAX's persistent compilation cache once per process.

    Remote/tunneled TPU runtimes pay minutes per fresh XLA compile
    (RESULTS.md); the persistent cache makes every shape a one-time cost
    across PROCESSES — which matters for the checkpoint/resume lifecycle,
    where the resuming process would otherwise recompile the very program
    it is resuming.  Directory from ``CLEORA_TPU_COMPILE_CACHE`` (set
    empty to disable; default ``~/.cache/cleora_tpu/xla``).  Called by
    the embed entry points; safe and idempotent anywhere."""
    global _CACHE_CONFIGURED
    if _CACHE_CONFIGURED:
        return
    _CACHE_CONFIGURED = True
    import os

    d = os.environ.get(
        "CLEORA_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "cleora_tpu", "xla"),
    )
    if not d:
        return
    try:
        import jax

        # TPU backends only.  CPU compiles are fast, and loading a
        # persisted XLA:CPU AOT executable on a host whose CPU features
        # differ from the compiling host's SIGILLs/segfaults (observed:
        # intermittent full-suite crashes inside a cached pjit program,
        # with "Machine type used for XLA:CPU compilation doesn't match"
        # load warnings) — caching CPU programs is all risk, no reward.
        if jax.default_backend() not in ("tpu", "axon"):
            return
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache setup break an embed
        pass
