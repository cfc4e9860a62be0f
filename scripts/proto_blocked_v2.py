"""Blocked SpMM v2: scan emits per-chunk (R, D) contributions as stacked ys
(no large carry), then one sorted segment-scatter of (C·R, D) into out.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "scripts")
from proto_blocked_spmm import chunk_graph  # noqa: E402


def make_v2(n_pad, R, E, d, mode):
    @jax.jit
    def run(cols_m, vals_m, lrow_m, r0s, x):
        def body(_, chunk):
            c, v, lr = chunk
            g = jnp.take(x, c, axis=0) * v[:, None]
            if mode == "matmul":
                onehot = (
                    lr[None, :] == lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ).astype(jnp.float32)
                contrib = jnp.matmul(onehot, g, precision=lax.Precision.HIGHEST)
            else:
                contrib = jax.ops.segment_sum(
                    g, lr, num_segments=R, indices_are_sorted=True
                )
            return None, contrib

        _, contribs = lax.scan(body, None, (cols_m, vals_m, lrow_m))
        C = cols_m.shape[0]
        out_rows = (r0s[:, None] + jnp.arange(R)[None, :]).reshape(-1)
        return jax.ops.segment_sum(
            contribs.reshape(C * R, d), out_rows, num_segments=n_pad,
        )

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
        return jax.ops.segment_sum(g, r, num_segments=n,
                                   indices_are_sorted=True)

    dr = jnp.asarray(rows.astype(np.int32))
    dc = jnp.asarray(cols.astype(np.int32))
    dv = jnp.asarray(vals)
    t0 = time.perf_counter()
    ref = np.asarray(baseline(dr, dc, dv, dx))
    print(f"baseline compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(2):
        t = time.perf_counter()
        float(baseline(dr, dc, dv, dx)[0, 0])
        best = min(best, time.perf_counter() - t)
    print(f"baseline {best*1e3:.1f} ms  {nnz/best/1e6:.1f} M edges/s",
          flush=True)

    R, E = 256, 2048
    cm, vm, lm, r0, n_pad, C = chunk_graph(rows, cols, vals, n, R, E)
    print(f"C={C} fill={nnz/(C*E):.2f}", flush=True)
    args = (jnp.asarray(cm), jnp.asarray(vm), jnp.asarray(lm),
            jnp.asarray(r0.astype(np.int32)))
    for mode in ("segsum", "matmul"):
        run = make_v2(n_pad, R, E, d, mode)
        t0 = time.perf_counter()
        out = np.asarray(run(*args, dx))[:n]
        print(f"{mode} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
        best = 1e9
        for _ in range(2):
            t = time.perf_counter()
            float(run(*args, dx)[0, 0])
            best = min(best, time.perf_counter() - t)
        print(f"{mode}: {best*1e3:.1f} ms  {nnz/best/1e6:.1f} M edges/s  "
              f"relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
