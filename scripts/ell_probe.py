"""TPU probe: sliced-ELL vs row-banded SpMM at the exact bench shape.

Times the canonical 40-iteration whitened loop (dim 256) on the roadNet-CA
shape for the ELL layout; the banded baseline is 49.2 M edge-ops/s
(RESULTS.md).  Run standalone; prints per-layout edge-ops/s.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import synthetic_coo
    from cleora_tpu.ops.loop import embed_loop
    from cleora_tpu.ops import spmm_ell as se

    form = sys.argv[1] if len(sys.argv) > 1 else "reduce"
    se.FORMULATION = form

    n_nodes, n_und = 1_965_206, 5_533_214
    iters = 40
    rows, cols, vals = synthetic_coo(n_nodes, n_und)
    nnz = rows.shape[0]

    t = time.perf_counter()
    plan = se.plan_ell(rows, cols, vals, n_nodes, d=256)
    print(f"plan {time.perf_counter()-t:.1f}s waste={plan.slots/nnz:.3f}",
          flush=True)
    plan = plan.device()

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n_nodes, 256)).astype(np.float32))

    def run():
        return embed_loop(plan, (), (), x0, n_rows=n_nodes,
                          num_iterations=iters, normalization="l2",
                          do_whiten=True)

    t = time.perf_counter()
    float(run()[0, 0])
    print(f"compile+first run {time.perf_counter()-t:.1f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        float(run()[0, 0])
        best = min(best, time.perf_counter() - t)
    eps = nnz * iters / best
    print(f"ELL[{form}] {best:.2f}s = {eps/1e6:.1f} M edge-ops/s "
          f"(banded baseline 49.2 M)", flush=True)


if __name__ == "__main__":
    main()
