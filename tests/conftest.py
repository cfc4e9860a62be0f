"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised without TPU hardware via
xla_force_host_platform_device_count (SURVEY.md §4 test strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def karate():
    from cleora_tpu.datasets import load_dataset

    return load_dataset("karate_club")


@pytest.fixture
def small_graph():
    from cleora_tpu import SparseMatrix

    lines = ["a b", "b c", "c a", "a d", "d e", "e a", "b e"]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
