"""Worker for the 8-process memory-bounded lifecycle test (VERDICT r2 #1).

Each process stream-builds only ITS device's row block (sharded ingest
piece), embeds it with the device-side hash init, and retrieves only its
own row block (``out="shards"``) — asserting with tracemalloc that host
numpy peaks stay far below one full (N, D) matrix.  Also round-trips the
shared-filesystem ``.npy`` memmap writer and a crash/resume checkpoint
cycle across all processes.

Usage: python multiprocess_lifecycle_worker.py <coord> <nprocs> <pid> <dir>
"""

import os
import sys
import tempfile
import tracemalloc

coord, num_procs, proc_id, work_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cleora_tpu.graph.stream import (  # noqa: E402
    build_graph_streaming_pairs,
    host_piece_range,
)
from cleora_tpu.parallel import embed_sharded, init_distributed  # noqa: E402
from cleora_tpu.parallel import state as lifecycle  # noqa: E402

assert init_distributed(
    coordinator_address=coord, num_processes=num_procs, process_id=proc_id
)
assert jax.process_count() == num_procs

# dimension-dominant synthetic graph: host layout temps are O(nnz) and
# small, so an O(N·D) host materialization would trip the assertion
N, D = 20_000, 128
rng = np.random.default_rng(5)
# a covering ring first (registers every id, first-seen order = numeric),
# then random extra pairs
ring = np.arange(N, dtype=np.int64)
src = np.concatenate([ring, rng.integers(0, N, size=20_000)])
dst = np.concatenate(
    [(ring + 1) % N, rng.integers(0, N, size=20_000)]
)
full_bytes = N * D * 4

cols = "complex::reflexive::node"
n_entities = N  # every id in [0, N) appears: reflexive registry covers all
lo, hi = host_piece_range(n_entities, num_procs, 1, proc_id)
piece_dir = tempfile.mkdtemp(prefix=f"piece{proc_id}_")
piece = build_graph_streaming_pairs(
    [(src, dst)], cols, piece_dir, row_range=(lo, hi)
)
assert piece.num_entities == n_entities

# ---- per-process peak host memory around the embed, out="shards"
# (first call warms the jit cache so compile-time temporaries — host-side
# MLIR/lowering buffers — don't count against the lifecycle)
# flat layout for the measurement: the halo/ELL planners allocate
# edge-proportional (O(nnz + P^2 M)) temporaries that are part of graph
# layout, not the state lifecycle under test
embed_sharded(piece, feature_dim=D, num_iterations=3, whiten=False,
              halo=False, ell=False, out="shards")
tracemalloc.start()
sh = embed_sharded(piece, feature_dim=D, num_iterations=3, whiten=False,
                   halo=False, ell=False, out="shards")
_, peak = tracemalloc.get_traced_memory()
tracemalloc.stop()
assert peak < 0.35 * full_bytes, (
    f"proc {proc_id}: host peak {peak/1e6:.1f} MB vs full "
    f"{full_bytes/1e6:.1f} MB"
)
assert sh.lo == lo and sh.hi == min(hi, n_entities)
assert sh.rows.shape == (sh.hi - sh.lo, D)

# ---- shared-filesystem single-npy memmap output (same flat layout as
# ``sh`` so the comparison is bitwise; the ELL/halo layouts reorder the
# reduction and are checked by allclose below)
mm_path = os.path.join(work_dir, "emb.npy")
mm = embed_sharded(piece, feature_dim=D, num_iterations=3, whiten=False,
                   halo=False, ell=False, out=mm_path)
assert mm.shape == (n_entities, D)
assert np.array_equal(np.asarray(mm[sh.lo:sh.hi]), sh.rows)

# ---- checkpoint crash/resume across all processes (bitwise)
ck_plain = os.path.join(work_dir, "ck_plain")
plain = embed_sharded(piece, feature_dim=D, num_iterations=4, whiten=False,
                      checkpoint_dir=ck_plain, checkpoint_every=2,
                      out="shards")

ck_dir = os.path.join(work_dir, "ck_crash")
orig = lifecycle.ShardedCheckpoint.save
state = {"n": 0}


def crashing(self, arr, it):
    orig(self, arr, it)
    state["n"] += 1
    if state["n"] == 1:
        raise RuntimeError("simulated crash")


lifecycle.ShardedCheckpoint.save = crashing
try:
    embed_sharded(piece, feature_dim=D, num_iterations=4, whiten=False,
                  checkpoint_dir=ck_dir, checkpoint_every=2, out="shards")
    raise AssertionError("crash did not fire")
except RuntimeError:
    pass
lifecycle.ShardedCheckpoint.save = orig
resumed = embed_sharded(piece, feature_dim=D, num_iterations=4,
                        whiten=False, checkpoint_dir=ck_dir,
                        checkpoint_every=2, out="shards")
assert np.array_equal(resumed.rows, plain.rows)

# ---- cross-process consistency: full gather equals the shard blocks
full = embed_sharded(piece, feature_dim=D, num_iterations=3, whiten=False,
                     halo=False, ell=False)
assert np.array_equal(full[sh.lo:sh.hi], sh.rows)

# ---- piece-mode optimized exchanges: distributed halo planning and the
# sharded ELL layout from allgathered degree histograms — no process ever
# sees the global edge list (parallel/shard.py:plan_halo_distributed)
for kw in (dict(halo=True), dict(ell=True), dict(halo=True, ell=True)):
    opt = embed_sharded(piece, feature_dim=D, num_iterations=3,
                        whiten=False, out="shards", **kw)
    assert np.allclose(opt.rows, sh.rows, atol=2e-5), kw

with open(os.path.join(work_dir, f"ok_{proc_id}"), "w") as f:
    f.write(f"{peak}")
print(f"proc {proc_id} ok peak={peak/1e6:.1f}MB", flush=True)
