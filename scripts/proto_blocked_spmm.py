"""Prototype: blocked SpMM variants vs the gather+segment_sum baseline.

Chunk scheme: fixed row blocks of R rows; each block's edge range split into
ceil(cnt/E) chunks of E edges (padded).  Per chunk: gather (E,D) from full x,
scale, reduce into the block's R-row slice — via MXU one-hot matmul or an
in-VMEM segment_sum — accumulated with dynamic_update_slice inside a scan.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def chunk_graph(rows, cols, vals, n, R, E):
    nnz = len(rows)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    np.cumsum(indptr, out=indptr)

    nblocks = (n + R - 1) // R
    block_lo = indptr[np.minimum(np.arange(nblocks) * R, n)]
    block_hi = indptr[np.minimum((np.arange(nblocks) + 1) * R, n)]
    cnt = block_hi - block_lo
    k = np.ceil(cnt / E).astype(np.int64)
    keep = k > 0
    blocks = np.arange(nblocks)[keep]
    kk = k[keep]

    chunk_block = np.repeat(blocks, kk)
    within = np.arange(len(chunk_block)) - np.repeat(
        np.concatenate(([0], np.cumsum(kk)[:-1])), kk
    )
    chunk_start = block_lo[chunk_block] + within * E
    chunk_end = np.minimum(chunk_start + E, block_hi[chunk_block])
    chunk_len = chunk_end - chunk_start

    C = len(chunk_block)
    idx = chunk_start[:, None] + np.arange(E)[None, :]
    mask = np.arange(E)[None, :] < chunk_len[:, None]
    safe = np.clip(idx, 0, nnz - 1)
    cols_m = np.where(mask, cols[safe], 0).astype(np.int32)
    vals_m = np.where(mask, vals[safe], 0.0).astype(np.float32)
    lrow_m = np.where(mask, rows[safe] - chunk_block[:, None] * R, R - 1).astype(np.int32)
    r0 = (chunk_block * R).astype(np.int32)
    return cols_m, vals_m, lrow_m, r0, nblocks * R, C


def make_blocked(n_pad, R, E, d, mode, precision):
    @jax.jit
    def run(cols_m, vals_m, lrow_m, r0s, x):
        def body(out, chunk):
            c, v, lr, r0 = chunk
            g = jnp.take(x, c, axis=0) * v[:, None]
            if mode == "matmul":
                onehot = (
                    lr[None, :] == lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ).astype(jnp.float32)
                contrib = jnp.matmul(onehot, g, precision=precision)
            else:
                contrib = jax.ops.segment_sum(
                    g, lr, num_segments=R, indices_are_sorted=True
                )
            cur = lax.dynamic_slice(out, (r0, 0), (R, d))
            return lax.dynamic_update_slice(out, cur + contrib, (r0, 0)), None

        out0 = jnp.zeros((n_pad, d), jnp.float32)
        out, _ = lax.scan(body, out0, (cols_m, vals_m, lrow_m, r0s))
        return out

    return run


def main():
    n, nnz, d = 1_000_000, 11_000_000, 256
    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, n, nnz)).astype(np.int64)
    cols = rng.integers(0, n, nnz).astype(np.int64)
    vals = rng.random(nnz).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    dx = jnp.asarray(x)

    @jax.jit
    def baseline(r, c, v, x):
        g = jnp.take(x, c, axis=0) * v[:, None]
        return jax.ops.segment_sum(g, r, num_segments=n, indices_are_sorted=True)

    def timeit(f, *a):
        float(jnp.asarray(f(*a)).ravel()[0])
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            float(jnp.asarray(f(*a)).ravel()[0])
            best = min(best, time.perf_counter() - t)
        return best

    ref = np.asarray(baseline(jnp.asarray(rows.astype(np.int32)),
                              jnp.asarray(cols.astype(np.int32)),
                              jnp.asarray(vals), dx))
    t = timeit(baseline, jnp.asarray(rows.astype(np.int32)),
               jnp.asarray(cols.astype(np.int32)), jnp.asarray(vals), dx)
    print(f"baseline            {t*1e3:7.1f} ms  {nnz/t/1e6:6.1f} M edges/s")

    for R, E in [(256, 2048), (512, 4096), (128, 1024)]:
        cm, vm, lm, r0, n_pad, C = chunk_graph(rows, cols, vals, n, R, E)
        fill = nnz / (C * E)
        args = (jnp.asarray(cm), jnp.asarray(vm), jnp.asarray(lm),
                jnp.asarray(r0))
        for mode, prec in [("matmul", lax.Precision.HIGHEST),
                           ("matmul", lax.Precision.DEFAULT),
                           ("segsum", None)]:
            run = make_blocked(n_pad, R, E, d, mode, prec)
            try:
                out = np.asarray(run(*args, dx))[:n]
                err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
                t = timeit(run, *args, dx)
                print(f"R={R:4d} E={E:5d} fill={fill:.2f} {mode}/{prec}: "
                      f"{t*1e3:7.1f} ms  {nnz/t/1e6:6.1f} M edges/s  relerr={err:.2e}")
            except Exception as e:
                print(f"R={R:4d} E={E:5d} {mode}/{prec}: FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
