"""Blocked SpMM equals the flat segment-sum SpMM."""

import jax.numpy as jnp
import numpy as np
import pytest

from cleora_tpu.ops.spmm import pad_coo, spmm
from cleora_tpu.ops.spmm_blocked import (block_coo, device_blocked,
                                         spmm_blocked)


def _random_coo(n, nnz, seed=0, power_law=False):
    rng = np.random.default_rng(seed)
    if power_law:
        # a few hub rows with most of the edges
        hub = rng.integers(0, max(n // 100, 1), nnz // 2)
        tail = rng.integers(0, n, nnz - nnz // 2)
        rows = np.sort(np.concatenate([hub, tail]))
    else:
        rows = np.sort(rng.integers(0, n, nnz))
    cols = rng.integers(0, n, nnz)
    vals = rng.random(nnz).astype(np.float32)
    return rows, cols, vals


@pytest.mark.parametrize("n,nnz,R,E,power_law", [
    (100, 1000, 16, 64, False),
    (1000, 5000, 64, 128, False),
    (500, 20000, 32, 256, True),   # hub rows spanning many chunks
    (50, 40, 16, 32, False),       # sparser than one chunk per block
    (257, 999, 64, 128, False),    # non-multiple row count
])
def test_blocked_matches_flat(n, nnz, R, E, power_law):
    rows, cols, vals = _random_coo(n, nnz, power_law=power_law)
    x = np.random.default_rng(1).standard_normal((n, 32)).astype(np.float32)

    pr, pc, pv = pad_coo(rows.astype(np.int32), cols.astype(np.int32), vals, n)
    flat = np.asarray(
        spmm(jnp.asarray(pr), jnp.asarray(pc), jnp.asarray(pv),
             jnp.asarray(x), n)
    )

    blocked = block_coo(rows, cols, vals, n, R=R, E=E)
    out = np.asarray(
        spmm_blocked(
            *device_blocked(blocked), jnp.asarray(x),
            n_rows=n, n_rows_padded=blocked.n_rows_padded, R=blocked.R,
        )
    )
    assert np.allclose(out, flat, atol=1e-4)


def test_blocked_preserves_all_edges():
    rows, cols, vals = _random_coo(300, 4000, seed=3)
    blocked = block_coo(rows, cols, vals, 300, R=32, E=128)
    # padded value mass equals input value mass
    assert np.isclose(blocked.vals.sum(), vals.sum(), rtol=1e-5)
    assert blocked.local_rows.max() < blocked.R
    assert (blocked.r0 % blocked.R == 0).all()
