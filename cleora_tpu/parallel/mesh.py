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
HOST_AXIS = "host"
CHIP_AXIS = "chip"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None):
    """1D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (SHARD_AXIS,))


def make_hier_mesh(
    n_hosts: Optional[int] = None,
    chips_per_host: Optional[int] = None,
    devices: Optional[Sequence] = None,
):
    """Hierarchical ("host", "chip") mesh for multi-host runs.

    Rows shard over BOTH axes host-major (PartitionSpec uses the axis tuple),
    so each host owns a contiguous row block: the all_to_all/all_gather of
    embedding rows decomposes into an ICI-local phase within a host and a
    DCN phase across hosts, which XLA schedules hierarchically from the
    device order (SURVEY.md §2c).  Defaults: one mesh row per process
    (``jax.process_count()``), chips_per_host = local device count.
    """
    if devices is None:
        devices = jax.devices()
    if n_hosts is None:
        n_hosts = max(1, jax.process_count())
    if chips_per_host is None:
        chips_per_host = len(devices) // n_hosts
    devices = list(devices)[: n_hosts * chips_per_host]
    grid = np.asarray(devices).reshape(n_hosts, chips_per_host)
    return jax.sharding.Mesh(grid, (HOST_AXIS, CHIP_AXIS))


def shard_axes(mesh):
    """The logical shard axis of a mesh: the ("host", "chip") tuple for
    hierarchical meshes, else the flat SHARD_AXIS.  Valid anywhere JAX
    takes an axis name (collectives, axis_index, PartitionSpec entries)."""
    names = tuple(mesh.axis_names)
    if names == (HOST_AXIS, CHIP_AXIS):
        return names
    return SHARD_AXIS


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
