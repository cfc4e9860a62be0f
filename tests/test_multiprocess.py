"""Multi-process sharded embed (multi-host simulation, SURVEY §4).

Launches two jax.distributed processes, each with 2 virtual CPU devices,
forming a global 4-device mesh — the closest single-machine analog of the
multi-host pod setup (collectives cross the process boundary like DCN).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_embed(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out_path = str(tmp_path / "result.npz")
    worker = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multiprocess_worker.py"
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU plugin in workers
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i), out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-2000:]

    data = np.load(out_path)
    halo, allgather = data["halo"], data["allgather"]
    assert np.allclose(halo, allgather, atol=2e-5)
    # per-host sharded-ingest pieces (no merged graph on any host) match
    assert np.allclose(data["piece"], allgather, atol=2e-5)

    # single-process ground truth
    import jax

    from cleora_tpu import SparseMatrix, embed

    rng = np.random.default_rng(7)
    lines = [f"n{rng.integers(0, 100)} n{rng.integers(0, 100)}"
             for _ in range(800)]
    graph = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")
    single = embed(graph, feature_dim=16, num_iterations=4, whiten=False)
    assert np.allclose(single, allgather, atol=2e-5)


@pytest.mark.slow
def test_two_process_sharded_siblings(tmp_path):
    """Multi-process sharded sibling algorithms (VERDICT r4 #3): ProNE /
    RandNE / HOPE / NetMF over a 2-process 4-device mesh with the full
    graph on every host, plus ProNE/RandNE from per-host sharded-build
    PIECES — Gram-parity against the single-process run."""
    coord = f"127.0.0.1:{_free_port()}"
    out_path = str(tmp_path / "siblings.npz")
    worker = os.path.join(
        os.path.dirname(__file__), "..", "scripts",
        "multiprocess_siblings_worker.py",
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i), out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-3000:]

    data = np.load(out_path)

    # single-process ground truth over the same 4-shard cut
    from cleora_tpu import SparseMatrix
    from cleora_tpu.parallel.algorithms import (
        hope_sharded,
        netmf_sharded,
        prone_sharded,
        randne_sharded,
    )

    rng = np.random.default_rng(7)
    lines = [f"n{rng.integers(0, 100)} n{rng.integers(0, 100)}"
             for _ in range(800)]
    graph = SparseMatrix.from_iterator(iter(lines),
                                       "complex::reflexive::node")
    single = {
        "prone": prone_sharded(graph, 16, mu=0.2, theta=0.5, seed=3,
                               n_devices=4),
        "randne": randne_sharded(graph, 16, weights=[1.0, 0.5, 0.25],
                                 seed=3, n_devices=4),
        "hope": hope_sharded(graph, 16, beta=0.01, seed=3, oversample=8,
                             power_iters=2, n_devices=4),
        "netmf": netmf_sharded(graph, 16, window_size=3,
                               negative_samples=1.0, seed=3, oversample=8,
                               power_iters=2, n_devices=4),
    }
    for name, ref in single.items():
        got = data[name]
        # Gram parity (eigh/qr sign ambiguity-safe); collectives cross
        # the process boundary, so tolerance not bitwise
        assert np.allclose(ref @ ref.T, got @ got.T, atol=1e-3), name
    # pieces reproduce the full-graph multi-process run (same operator)
    for name in ("prone", "randne"):
        got = data[f"{name}_piece"]
        ref = single[name]
        assert np.allclose(ref @ ref.T, got @ got.T, atol=1e-3), name
    """8 jax.distributed processes (1 device each): per-host sharded-build
    pieces embed with device-side init, shard-granular output, a shared
    single-npy memmap write, and a crash/resume checkpoint cycle — each
    process asserting its host numpy peak stays far below one full (N, D)
    matrix (VERDICT r2 #1)."""
    coord = f"127.0.0.1:{_free_port()}"
    nprocs = 8
    worker = os.path.join(
        os.path.dirname(__file__), "..", "scripts",
        "multiprocess_lifecycle_worker.py",
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(nprocs), str(i),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nprocs)
    ]
    outputs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-3000:]
    for i in range(nprocs):
        assert (tmp_path / f"ok_{i}").exists()
    # the memmap written collectively is a complete, loadable npy
    emb = np.load(str(tmp_path / "emb.npy"))
    assert emb.shape[0] == 20_000 and np.isfinite(emb).all()
