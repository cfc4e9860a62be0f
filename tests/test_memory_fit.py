"""HBM-fit pre-check: estimator math and the actionable error path."""

import numpy as np
import pytest

from cleora_tpu.ops import memory


def test_estimate_scales_with_shape():
    small = memory.estimate_embed_hbm_bytes(1000, 64, 10_000)
    big = memory.estimate_embed_hbm_bytes(4_000_000, 256, 60_000_000)
    assert small < (1 << 31)
    assert big > (16 << 30)  # the motivating case: over a v5e's HBM


def test_bf16_halves_state():
    f32 = memory.estimate_embed_hbm_bytes(2_000_000, 256, 10_000_000)
    bf16 = memory.estimate_embed_hbm_bytes(
        2_000_000, 256, 10_000_000, "bfloat16"
    )
    assert bf16 < f32
    # state term is 2·N·D·itemsize; halving it saves N·D·2 bytes
    assert f32 - bf16 == 2 * 2_000_000 * 256 * 2


def test_no_limit_on_cpu_backend():
    assert memory.device_hbm_limit() is None  # tests force the CPU backend
    # and therefore check_device_fit never raises
    memory.check_device_fit(10**9, 1024, 10**10)


def test_raises_actionable_error(monkeypatch):
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: 16 << 30)
    with pytest.raises(ValueError, match="bfloat16.*embed_sharded"):
        memory.check_device_fit(4_000_000, 256, 60_000_000)
    # bf16 at the same shape fits → no raise
    memory.check_device_fit(4_000_000, 256, 60_000_000, "bfloat16")


def test_skip_env(monkeypatch):
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: 16 << 30)
    monkeypatch.setenv("CLEORA_TPU_SKIP_FIT_CHECK", "1")
    memory.check_device_fit(10**8, 1024, 10**9)  # way over; bypassed


def test_embed_path_invokes_check(monkeypatch):
    """embed() surfaces the capacity error before any device dispatch."""
    import cleora_tpu
    from cleora_tpu.ops import memory as mem

    calls = []

    def fake_check(n, d, nnz, dtype="float32"):
        calls.append((n, d, nnz, dtype))

    monkeypatch.setattr(mem, "check_device_fit", fake_check)
    lines = ["a b", "b c", "c a"]
    g = cleora_tpu.SparseMatrix.from_iterator(
        iter(lines), "complex::reflexive::n"
    )
    cleora_tpu.embed(g, feature_dim=8, num_iterations=2, whiten=False)
    assert calls and calls[0][0] == g.num_entities and calls[0][1] == 8
