"""Multi-host initialization for the production sharded embed path.

Usage on every host of a pod (or every process of a simulated pod):

    from cleora_tpu.parallel import init_distributed, embed_sharded

    init_distributed()            # env-driven, or pass explicit args
    graph = SparseMatrix.from_files([...], columns)   # same input everywhere
    emb = embed_sharded(graph, feature_dim=256)       # full result on every host

``embed_sharded`` detects the multi-process runtime, builds the hierarchical
("host", "chip") mesh over all devices (rows sharded host-major so the
boundary-row exchange is ICI-local within a host and crosses DCN once per
peer host), and gathers the final embeddings to every process.

Reference contrast: the reference is single-node only (SURVEY.md §2c); its
documented >RAM answer is manual dimension-sharding (README.md:359-361).
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize jax.distributed for a multi-host run.

    With no arguments, defers to JAX's environment autodetection (TPU pods
    populate everything; otherwise set COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, the standard JAX variables).  Returns True when a
    multi-process runtime is active after the call, False for single-process
    (already-initialized runtimes are left untouched).
    """
    import jax

    # NOTE: jax.process_count() would initialize the XLA backend, after
    # which jax.distributed.initialize() refuses to run — probe the
    # distributed service state directly instead.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older JAX
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    if already:
        return jax.process_count() > 1

    # explicit args > COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env vars
    # (forwarded as kwargs — jax.distributed.initialize does NOT read these
    # names itself) > JAX/cluster autodetection (TPU pod metadata, Slurm,
    # Open MPI)
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids

    autodetectable = any(
        v in os.environ
        for v in ("TPU_WORKER_HOSTNAMES", "JAX_COORDINATOR_ADDRESS",
                  "SLURM_JOB_ID", "OMPI_MCA_orte_hnp_uri")
    )
    if not kwargs and not autodetectable:
        return False  # nothing to initialize from — single-process run

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # double-init from a framework wrapper
        if "already initialized" not in str(e):
            raise
    return jax.process_count() > 1
