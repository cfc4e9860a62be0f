"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised without TPU hardware via
xla_force_host_platform_device_count (SURVEY.md §4 test strategy).
"""

import os

# The axon sitecustomize imports jax at interpreter start and force-selects
# the remote-TPU platform; steer back to the virtual 8-device CPU mesh
# before the first backend initialization.  CLEORA_TPU_TEST_DEVICE=tpu opts
# back into running the suite on the real chip.
if os.environ.get("CLEORA_TPU_TEST_DEVICE", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_TESTS_SINCE_CLEAR = {"n": 0}


@pytest.fixture(autouse=True)
def _bound_live_executables():
    """Clear JAX's executable caches every ~150 tests.

    Full-suite runs on the virtual 8-device CPU mesh accumulate hundreds
    of live XLA:CPU executables and, past a threshold, die
    NON-deterministically inside an allocation-heavy pjit — observed as a
    segfault, a silent SIGABRT, or a deadlock at the same test region
    across runs, with RSS at only ~3 GB (not memory exhaustion), with the
    native extension disabled, and never in any sub-suite run in
    isolation.  Periodically dropping compiled programs keeps the live
    set bounded; the recompiles cost a few seconds per cleared module and
    made the crash unreproducible in repeated full runs.
    """
    yield
    _TESTS_SINCE_CLEAR["n"] += 1
    if _TESTS_SINCE_CLEAR["n"] >= 150:
        _TESTS_SINCE_CLEAR["n"] = 0
        import jax

        jax.clear_caches()


@pytest.fixture
def karate():
    from cleora_tpu.datasets import load_dataset

    return load_dataset("karate_club")


@pytest.fixture
def small_graph():
    from cleora_tpu import SparseMatrix

    lines = ["a b", "b c", "c a", "a d", "d e", "e a", "b e"]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
