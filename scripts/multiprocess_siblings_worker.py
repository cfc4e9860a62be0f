"""Worker for the multi-process sharded sibling-algorithms test
(VERDICT r4 #3): two jax.distributed processes × 2 virtual CPU devices
run ProNE/RandNE/HOPE over the 4-device global mesh with every host
holding the full graph, and ProNE/RandNE again from per-host
sharded-build PIECES (no merged graph on any host) via
plan_halo_distributed / allgather_degrees — the same piece machinery as
embed_sharded.

Usage: python multiprocess_siblings_worker.py <coord> <nprocs> <id> <out>
"""

import os
import sys

coord, num_procs, proc_id, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cleora_tpu import SparseMatrix  # noqa: E402
from cleora_tpu.parallel import init_distributed  # noqa: E402
from cleora_tpu.parallel.algorithms import (  # noqa: E402
    hope_sharded,
    netmf_sharded,
    prone_sharded,
    randne_sharded,
)

assert init_distributed(
    coordinator_address=coord, num_processes=num_procs, process_id=proc_id
)
assert jax.process_count() == num_procs

rng = np.random.default_rng(7)
lines = [f"n{rng.integers(0, 100)} n{rng.integers(0, 100)}"
         for _ in range(800)]
graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")

# ---- full graph on every host: all the transpose-needing algorithms too
results = {
    "prone": prone_sharded(graph, 16, mu=0.2, theta=0.5, seed=3),
    "randne": randne_sharded(graph, 16, weights=[1.0, 0.5, 0.25], seed=3),
    "hope": hope_sharded(graph, 16, beta=0.01, seed=3, oversample=8,
                         power_iters=2),
    "netmf": netmf_sharded(graph, 16, window_size=3, negative_samples=1.0,
                           seed=3, oversample=8, power_iters=2),
}
for name, v in results.items():
    assert v.shape[0] == graph.num_entities, name
    assert np.isfinite(v).all(), name

# ---- per-host PIECES (sharded ingest): ProNE/RandNE straight off them
import tempfile  # noqa: E402

from cleora_tpu.graph.stream import (  # noqa: E402
    build_graph_streaming,
    count_entities_streaming,
    host_piece_range,
)

cols = "complex::reflexive::node"
n_entities = count_entities_streaming(lines, cols)
n_devices = num_procs * 2
lo, hi = host_piece_range(n_entities, n_devices, 2, proc_id)
with tempfile.TemporaryDirectory() as tmp:
    piece = build_graph_streaming(iter(lines), cols, tmp + "/piece",
                                  row_range=(lo, hi))
    results["prone_piece"] = prone_sharded(piece, 16, mu=0.2, theta=0.5,
                                           seed=3)
    results["randne_piece"] = randne_sharded(
        piece, 16, weights=[1.0, 0.5, 0.25], seed=3)
    # the transpose-needing algorithms must refuse pieces loudly
    try:
        hope_sharded(piece, 16, beta=0.01, seed=3, oversample=8,
                     power_iters=2)
        raise AssertionError("hope_sharded accepted a piece")
    except ValueError as e:
        assert "TRANSPOSED" in str(e), e
assert results["prone_piece"].shape == (n_entities, 16)

if proc_id == 0:
    np.savez(out_path, **results)
print(f"proc {proc_id} ok", flush=True)
