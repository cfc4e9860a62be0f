"""Auxiliary subsystems: tracing and checkpoint/resume (SURVEY.md §5)."""

import numpy as np
import pytest

from cleora_tpu import SparseMatrix, embed
from cleora_tpu.checkpoint import (embed_with_checkpointing, has_checkpoint,
                                   load_checkpoint, save_checkpoint)
from cleora_tpu.tracing import EmbedTracer, device_memory_stats, log_every


@pytest.fixture(scope="module")
def graph():
    lines = ["a b", "b c", "c a", "a d", "d e", "e a", "b e"]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::node")


def test_checkpoint_roundtrip(graph, tmp_path):
    d = str(tmp_path / "ckpt")
    emb = embed(graph, feature_dim=8, num_iterations=3)
    assert not has_checkpoint(d)
    save_checkpoint(d, graph, emb, 3)
    assert has_checkpoint(d)
    g2, emb2, it = load_checkpoint(d)
    assert it == 3
    assert np.array_equal(emb, emb2)
    assert g2.entity_ids == graph.entity_ids


def test_embed_with_checkpointing_matches_plain(graph, tmp_path):
    d = str(tmp_path / "ckpt2")
    out = embed_with_checkpointing(
        graph, feature_dim=8, num_iterations=6, checkpoint_dir=d,
        checkpoint_every=2,
    )
    plain = embed(graph, feature_dim=8, num_iterations=6)
    assert np.allclose(out, plain, atol=1e-5)
    # resume from iteration 6 is a no-op returning the same result
    resumed = embed_with_checkpointing(
        graph, feature_dim=8, num_iterations=6, checkpoint_dir=d,
        checkpoint_every=2,
    )
    assert np.allclose(resumed, out)


def test_embed_with_checkpointing_resumes_partial(graph, tmp_path):
    d = str(tmp_path / "ckpt3")
    partial = embed(graph, feature_dim=8, num_iterations=2)
    save_checkpoint(d, graph, partial, 2)
    out = embed_with_checkpointing(
        graph, feature_dim=8, num_iterations=5, checkpoint_dir=d,
        checkpoint_every=100,
    )
    plain = embed(graph, feature_dim=8, num_iterations=5)
    assert np.allclose(out, plain, atol=1e-5)
    _, _, it = load_checkpoint(d)
    assert it == 5


def test_embed_with_checkpointing_zero_iterations(graph, tmp_path):
    # no checkpoint + num_iterations=0: returns the deterministic init,
    # same as embed() itself (not None)
    d = str(tmp_path / "ckpt0")
    out = embed_with_checkpointing(
        graph, feature_dim=8, num_iterations=0, checkpoint_dir=d,
    )
    plain = embed(graph, feature_dim=8, num_iterations=0)
    assert np.allclose(out, plain)


def test_checkpoint_dim_mismatch(graph, tmp_path):
    d = str(tmp_path / "ckpt4")
    save_checkpoint(d, graph, np.zeros((7, 4), np.float32), 1)
    with pytest.raises(ValueError, match="feature_dim"):
        embed_with_checkpointing(graph, feature_dim=8, checkpoint_dir=d)


def test_embed_tracer(graph):
    tracer = EmbedTracer(num_edges=graph.num_edges)
    embed(graph, feature_dim=8, num_iterations=4, callback=tracer)
    s = tracer.summary()
    # every iteration counted; the first interval runs from construction
    assert s["iterations"] == 4
    assert s["edges_per_s"] > 0


def test_embed_tracer_single_iteration(graph):
    tracer = EmbedTracer(num_edges=graph.num_edges)
    embed(graph, feature_dim=8, num_iterations=1, callback=tracer)
    s = tracer.summary()
    assert s["iterations"] == 1
    assert s["edges_per_s"] > 0


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) >= 1
    assert "device" in stats[0]


def test_log_every(caplog):
    import logging

    progress = log_every(2, "got {count:,}")
    with caplog.at_level(logging.INFO, logger="cleora_tpu"):
        for _ in range(5):
            progress()
    assert sum("got" in r.message for r in caplog.records) == 2


def test_orbax_checkpoint_roundtrip(graph, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    d = str(tmp_path / "ockpt")
    emb = embed(graph, feature_dim=8, num_iterations=2)
    save_checkpoint(d, graph, emb, 2, backend="orbax")
    assert has_checkpoint(d)
    g2, emb2, it = load_checkpoint(d)
    assert it == 2
    assert np.array_equal(emb, emb2)
    assert g2.entity_ids == graph.entity_ids
    # overwrite at a later iteration
    save_checkpoint(d, graph, emb * 2, 5, backend="orbax", save_graph=False)
    _, emb3, it3 = load_checkpoint(d)
    assert it3 == 5 and np.allclose(emb3, emb * 2)
    with pytest.raises(ValueError, match="Unknown backend"):
        save_checkpoint(d, graph, emb, 1, backend="bogus")


@pytest.mark.slow
def test_kill_resume_fault_tolerance(graph, tmp_path):
    """Fault injection: a worker process is killed mid-run; a fresh process
    resumes from the last checkpoint and produces the exact full-run result
    (deterministic restartability, SURVEY §5)."""
    import pickle
    import subprocess
    import sys
    import textwrap

    d = str(tmp_path / "ft")
    gpath = str(tmp_path / "g.pkl")
    with open(gpath, "wb") as f:
        pickle.dump(graph, f)

    prog = textwrap.dedent("""
        import pickle, sys
        import jax; jax.config.update("jax_platforms", "cpu")
        from cleora_tpu.checkpoint import embed_with_checkpointing, load_checkpoint
        graph = pickle.load(open(sys.argv[1], "rb"))
        kill_after = sys.argv[3] == "partial"

        def boom(k, e):
            raise SystemExit(137)  # simulate a crash after 2 chunks

        kw = dict(feature_dim=8, num_iterations=8, checkpoint_dir=sys.argv[2],
                  checkpoint_every=2, whiten=False)
        if kill_after:
            import cleora_tpu.checkpoint as cp
            orig = cp.save_checkpoint
            calls = []
            def counting(*a, **k):
                orig(*a, **k)
                calls.append(1)
                if len(calls) == 2:
                    raise SystemExit(137)
            cp.save_checkpoint = counting
        out = embed_with_checkpointing(graph, **kw)
        import numpy as np
        np.save(sys.argv[2] + "_out.npy", out)
    """)
    import os

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    r1 = subprocess.run([sys.executable, "-c", prog, gpath, d, "partial"],
                        env=env, capture_output=True)
    assert r1.returncode == 137, r1.stderr.decode()[-500:]
    _, _, it = load_checkpoint(d)
    assert it == 4  # crashed after the 2nd chunk of 2

    r2 = subprocess.run([sys.executable, "-c", prog, gpath, d, "full"],
                        env=env, capture_output=True)
    assert r2.returncode == 0, r2.stderr.decode()[-500:]
    resumed = np.load(d + "_out.npy")

    clean = embed(graph, feature_dim=8, num_iterations=8, whiten=False)
    assert np.allclose(resumed, clean, atol=1e-5)


def test_init_distributed_env_vars(tmp_path):
    """COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID (the documented env
    path) must be forwarded to jax.distributed.initialize — a 1-process
    'cluster' initializes and reports single-process."""
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    env.update(JAX_PLATFORMS="cpu", COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
               NUM_PROCESSES="1", PROCESS_ID="0")
    r = subprocess.run([sys.executable, "-c", """
import jax
jax.config.update("jax_platforms", "cpu")
from cleora_tpu.parallel import init_distributed
ok = init_distributed()
assert ok is False  # 1-process cluster: initialized but not multi-process
import jax
assert jax.process_count() == 1
print("env init ok")
"""], env=env, capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert b"env init ok" in r.stdout


def test_checkpoint_newest_backend_wins(graph, tmp_path):
    """A stale orbax save must not roll back newer npz progress (and vice
    versa): load_checkpoint picks the most recently written state."""
    import time

    d = str(tmp_path / "ckpt_mixed")
    a = np.full((7, 4), 1.0, np.float32)
    b = np.full((7, 4), 2.0, np.float32)
    save_checkpoint(d, graph, a, 5, backend="orbax")
    time.sleep(0.05)
    save_checkpoint(d, graph, b, 10, backend="npz")
    _, x, it = load_checkpoint(d)
    assert it == 10 and np.array_equal(x, b)
    time.sleep(0.05)
    save_checkpoint(d, graph, a, 15, backend="orbax")
    _, x, it = load_checkpoint(d)
    assert it == 15 and np.array_equal(x, a)
