"""_util helpers: the persistent compile cache must stay TPU-only."""


def test_compile_cache_noop_on_cpu(monkeypatch):
    """On a CPU backend the persistent XLA cache must NOT be enabled:
    loading a persisted XLA:CPU AOT executable on a host with different
    CPU features SIGILLs (observed as intermittent full-suite segfaults
    inside a cached pjit program).  The cache exists for the minutes-long
    remote TPU compiles only."""
    import jax

    from cleora_tpu import _util

    monkeypatch.setattr(_util, "_CACHE_CONFIGURED", False)
    monkeypatch.delenv("CLEORA_TPU_COMPILE_CACHE", raising=False)
    before = jax.config.jax_compilation_cache_dir
    _util.maybe_enable_compile_cache()
    assert _util._CACHE_CONFIGURED  # idempotence latch still set
    assert jax.config.jax_compilation_cache_dir == before
    assert jax.default_backend() == "cpu"  # conftest forces it
