"""Probe: fuse L2-normalize (+ whiten's mean) into the SpMM bucket epilogue.

The measured per-iteration decomposition at the bench shape
(scripts/epilogue_probe.py) is SpMM 107.4 ms (gather-issue ceiling) +
L2 normalize 7.7 ms (a separate read+write pass over the (N, 256) state) +
whiten 9.5 ms.  The normalize pass exists because ``l2_normalize`` consumes
the CONCATENATED SpMM output, and XLA does not fuse through the
concatenate.  Applying the row-normalize per ELL bucket BEFORE the concat
puts the reduce+scale inside each bucket's gather-sum fusion, so the state
is written already-normalized — the 4 GB normalize pass disappears.  The
row-sum of the normalized part (whiten's mean) is emitted from the same
fusion, letting whiten skip its own mean pass too.

Math is unchanged: identical formula per element, applied before instead of
after an array concat (reduction order inside jnp.sum differs at ULP level
only).

Variants (both 40 whitened iterations at the exact bench shape):
  A: production embed_loop (the exact bench program — compile-cache warm)
  B: fused normalize+mean variant

Usage: python scripts/fused_norm_probe.py [--cpu]   (--cpu: tiny parity check)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CPU = "--cpu" in sys.argv

import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
from jax import lax

from bench import synthetic_coo
from cleora_tpu.ops.loop import embed_loop
from cleora_tpu.ops.spmm_ell import _bucket_out, plan_ell
from cleora_tpu.ops.whiten import whiten

EPS = 1e-10


def spmm_ell_fused_l2(plan, x):
    """out = l2norm_rows(A @ x) with the normalize fused per bucket; also
    returns the column mean of the normalized output (for whiten)."""
    acc = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    parts, sums = [], []

    def norm_part(y):
        ss = jnp.sum(y * y, axis=-1, keepdims=True)
        yn = y / jnp.maximum(jnp.sqrt(ss), EPS)
        sums.append(jnp.sum(yn, axis=0, dtype=acc))
        return yn

    if plan.n_zero:
        parts.append(jnp.zeros((plan.n_zero, x.shape[1]), acc))
    for cols_b, vals_b in plan.buckets:
        parts.append(norm_part(_bucket_out(x, cols_b, vals_b, acc)))
    if plan.hub is not None:
        hc, hv, seg = plan.hub
        raw = _bucket_out(x, hc, hv, acc)
        parts.append(norm_part(jax.ops.segment_sum(
            raw, seg, num_segments=plan.n_hub, indices_are_sorted=True)))
    xn = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    mean = functools.reduce(jnp.add, sums) / plan.n_rows
    return xn, mean


def whiten_with_mean(x, mean):
    n = x.shape[0]
    xc = x - mean
    cov = jnp.dot(xc.T, xc, preferred_element_type=x.dtype) / (n - 1)
    eigenvalues, eigenvectors = jnp.linalg.eigh(cov)
    eigenvalues = eigenvalues[::-1]
    eigenvectors = eigenvectors[:, ::-1]
    scale = 1.0 / jnp.sqrt(jnp.maximum(eigenvalues, EPS))
    return jnp.dot(xc, eigenvectors * scale, preferred_element_type=x.dtype)


@functools.partial(jax.jit, static_argnames=("iters",))
def loop_fused(plan, x0, *, iters):
    def body(_, x):
        xn, mean = spmm_ell_fused_l2(plan, x)
        return whiten_with_mean(xn, mean).astype(x.dtype)

    return lax.fori_loop(0, iters, body, jnp.take(x0, plan.order, axis=0))


def fetch(v):
    return float(v[0, 0])  # scalar fetch: block_until_ready lies via tunnel


def main():
    if CPU:
        n_nodes, n_und, iters, dim = 3000, 9000, 8, 64
    else:
        n_nodes, n_und, iters, dim = 1_965_206, 5_533_214, 40, 256

    rows, cols, vals = synthetic_coo(n_nodes, n_und)
    nnz = rows.shape[0]
    plan = plan_ell(rows, cols, vals, n_nodes, d=dim)
    assert plan is not None
    dplan = plan.device()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n_nodes, dim)).astype(np.float32))

    if CPU:
        a = embed_loop(dplan, (), (), x0, n_rows=n_nodes,
                       num_iterations=iters, normalization="l2",
                       do_whiten=True)
        b_rel = loop_fused(dplan, x0, iters=iters)
        b = jnp.take(b_rel, dplan.rank, axis=0)
        # eigh column signs may flip run-to-run; compare |dot| geometry
        d = float(jnp.max(jnp.abs(jnp.abs(a) - jnp.abs(b))))
        cos = jnp.sum(a * b, axis=1) / (
            jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1) + 1e-12)
        print(f"parity max||a|-|b||={d:.3e}  min row cos={float(jnp.min(cos)):.6f}")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
        print("CPU parity OK")
        return

    for name, fn in [
        ("A_production", lambda: embed_loop(
            dplan, (), (), x0, n_rows=n_nodes, num_iterations=iters,
            normalization="l2", do_whiten=True)),
        ("B_fused_norm", lambda: loop_fused(dplan, x0, iters=iters)),
    ]:
        t = time.perf_counter()
        fetch(fn())
        warm = time.perf_counter() - t
        print(f"{name}: warmup {warm:.1f}s", flush=True)
        for rep in range(2):
            t = time.perf_counter()
            fetch(fn())
            dt = time.perf_counter() - t
            print(f"{name}: {dt:.3f}s  {nnz * iters / dt / 1e6:.1f} M edge-ops/s"
                  f"  ({dt / iters * 1e3:.1f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
