"""Multi-device sharded embed over a jax.sharding.Mesh.

Run on a pod slice, or simulate N devices on CPU:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sharded_embed.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import numpy as np

from cleora_tpu import SparseMatrix, embed
from cleora_tpu.parallel.embed import embed_sharded

rng = np.random.default_rng(0)
lines = [f"n{rng.integers(0, 2000)} n{rng.integers(0, 2000)}"
         for _ in range(20_000)]
graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
print(f"{graph!r} on {len(jax.devices())} devices")

sharded = embed_sharded(graph, feature_dim=64, num_iterations=10)
single = embed(graph, feature_dim=64, num_iterations=10)
print("sharded", sharded.shape, "max |Δ| vs single-device:",
      float(np.abs(sharded - single).max()))
