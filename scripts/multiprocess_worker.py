"""Worker for the multi-process (multi-host simulation) sharded-embed test.

Drives the PUBLIC multi-host API exactly as a pod host would:
``init_distributed`` + ``embed_sharded`` (which auto-builds the hierarchical
("host", "chip") mesh over all processes and gathers the full result to
every host).

Launched N times by tests/test_multiprocess.py with a shared coordinator;
each process contributes 2 virtual CPU devices (DCN analog: collectives
cross the process boundary).

Usage: python multiprocess_worker.py <coord_addr> <num_procs> <proc_id> <out>
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
from cleora_tpu.parallel import embed_sharded, init_distributed  # noqa: E402

assert init_distributed(
    coordinator_address=coord, num_processes=num_procs, process_id=proc_id
)
assert jax.process_count() == num_procs

rng = np.random.default_rng(7)
lines = [f"n{rng.integers(0, 100)} n{rng.integers(0, 100)}" for _ in range(800)]
graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")

# public API: mesh auto-selected (hierarchical over all processes), full
# result returned on every process
results = {
    "allgather": embed_sharded(graph, feature_dim=16, num_iterations=4,
                               whiten=False, halo=False),
    "halo": embed_sharded(graph, feature_dim=16, num_iterations=4,
                          whiten=False, halo=True),
}
for v in results.values():
    assert v.shape == (graph.num_entities, 16)

# full multi-host pipeline off per-host PIECES: each process stream-builds
# only its own devices' row blocks (sharded ingest) and embeds directly —
# no merged graph exists on any host
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
    results["piece"] = embed_sharded(piece, feature_dim=16,
                                     num_iterations=4, whiten=False)
assert results["piece"].shape == (n_entities, 16)

if proc_id == 0:
    np.savez(out_path, **results)
print(f"proc {proc_id} ok", flush=True)
