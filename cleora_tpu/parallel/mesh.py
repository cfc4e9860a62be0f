"""Device mesh helpers for multi-chip / multi-host runs.

The framework shards along ONE logical axis ("shard"): embedding rows and
their incident edges are partitioned across devices; collectives ride ICI
within a host and DCN across hosts (SURVEY.md §2c TPU-native equivalents).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

SHARD_AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None):
    """1D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (SHARD_AXIS,))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
