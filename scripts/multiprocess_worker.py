"""Worker for the multi-process (multi-host simulation) sharded-embed test.

Launched N times by tests/test_multiprocess.py with a shared coordinator;
each process contributes 2 virtual CPU devices, forming a global 2N-device
mesh — the single-controller-per-host setup of a real pod (DCN analog).

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
jax.distributed.initialize(
    coordinator_address=coord, num_processes=num_procs, process_id=proc_id
)

import numpy as np  # noqa: E402

from cleora_tpu import SparseMatrix  # noqa: E402
from cleora_tpu.parallel.embed import build_sharded_embed  # noqa: E402
from cleora_tpu.parallel.mesh import make_mesh  # noqa: E402
from cleora_tpu.parallel.shard import pad_rows, plan_halo, shard_graph  # noqa: E402

devices = jax.devices()
assert len(devices) == 2 * num_procs, devices

rng = np.random.default_rng(7)
lines = [f"n{rng.integers(0, 100)} n{rng.integers(0, 100)}" for _ in range(800)]
graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")

mesh = make_mesh(devices=devices)
sharded = shard_graph(graph, "left", len(devices))
x0 = graph.initialize_deterministically(16, 0)

results = {}
for plan in (None, plan_halo(sharded)):
    fn, place = build_sharded_embed(
        mesh, sharded, 16, num_iterations=4, do_whiten=False, halo=plan,
    )
    out = fn(*place(pad_rows(x0, sharded.n_rows_padded)))
    # multihost arrays: gather addressable shards + allgather via process 0
    gathered = np.asarray(
        jax.experimental.multihost_utils.process_allgather(out, tiled=True)
    )
    results["halo" if plan is not None else "allgather"] = gathered[
        : graph.num_entities
    ]

if proc_id == 0:
    np.savez(out_path, **results)
print(f"proc {proc_id} ok", flush=True)
