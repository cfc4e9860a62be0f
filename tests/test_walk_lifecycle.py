"""Production lifecycle of the device walk pipeline (VERDICT r4 #1):
per-pass counting checkpoints + resume, streamed ``.npy`` output, and
DiskGraph input — the walk-pipeline twins of the `embed_sharded`
lifecycle (parallel/state.py), which the reference's host DeepWalk loop
has no analog of (/root/reference/pycleora/algorithms.py:248-369).
"""

import os
import shutil

import numpy as np
import pytest

from cleora_tpu import SparseMatrix
from cleora_tpu import algorithms as alg
from cleora_tpu.ops import cooccur

KW = dict(feature_dim=8, num_walks=2, walk_length=12, window_size=3,
          seed=7, backend="device", cooccurrence="device")


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(11)
    lines = [f"n{rng.integers(0, 150)} n{rng.integers(0, 150)}"
             for _ in range(900)]
    return SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")


@pytest.fixture(scope="module")
def ref(graph):
    return alg.embed_deepwalk(graph, **KW)


@pytest.fixture
def ckpt_dir(tmp_path):
    return str(tmp_path / "walk_ckpt")


def _counts_files(d):
    return sorted(f for f in os.listdir(d) if f.startswith("counts_pass_"))


def test_checkpointed_run_bitwise_and_streamed_out(graph, ref, ckpt_dir):
    """A checkpointed run streams its embedding to
    <checkpoint_dir>/embedding.npy, returns a read-only memmap, and is
    BITWISE identical to the unlifecycled run — the streamed finalize
    (device sign pick + per-chunk L2) is the exact host epilogue."""
    out = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    assert isinstance(out, np.memmap)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert os.path.exists(os.path.join(ckpt_dir, "embedding.npy"))
    assert len(_counts_files(ckpt_dir)) >= 1


def test_done_marker_short_circuits(graph, ref, ckpt_dir, monkeypatch):
    """A COMPLETED run resumes straight to its memmap: no walks, no
    counting, no factorization."""
    alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)

    def boom(*a, **k):
        raise AssertionError("walk engine must not run on a done resume")

    monkeypatch.setattr(alg, "_device_walks", boom)
    again = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    np.testing.assert_array_equal(np.asarray(again), ref)


def test_kill_after_counting_resumes_bitwise(graph, ref, ckpt_dir,
                                             monkeypatch):
    """The VERDICT done-criterion shape: counting completed + durable,
    run killed before the factorization finished → the resume regenerates
    NO walks and lands on a byte-identical embedding."""
    alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    # simulate the kill: finished output gone, counted passes remain
    os.remove(os.path.join(ckpt_dir, "embedding.npy"))
    os.remove(os.path.join(ckpt_dir, "embedding.json"))

    def boom(*a, **k):
        raise AssertionError("counting is durable — no walk regeneration")

    monkeypatch.setattr(alg, "_device_walks", boom)
    res = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    np.testing.assert_array_equal(np.asarray(res), ref)


def test_partial_counting_resume(graph, ref, ckpt_dir, monkeypatch):
    """A kill mid-counting: only the missing hash partitions are
    recounted (the cross-pass walk cache fills on the first COMPUTED
    pass, not pass 0), result bitwise-identical."""
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)  # force multi-pass
    passes = alg._cooc_passes(graph, KW["num_walks"], KW["walk_length"],
                              KW["window_size"])
    assert passes >= 3
    full = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    files = _counts_files(ckpt_dir)
    assert len(files) == passes
    os.remove(os.path.join(ckpt_dir, "embedding.npy"))
    os.remove(os.path.join(ckpt_dir, "embedding.json"))
    for f in files[passes // 2:]:
        os.remove(os.path.join(ckpt_dir, f))
    res = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(full))
    np.testing.assert_array_equal(np.asarray(res), ref)


def test_pass_parallel_checkpoint_and_resume(graph, ckpt_dir, monkeypatch):
    """Checkpointing composes with pass-parallel multi-device counting:
    per-device driver threads persist their passes, and a resumed run
    reloads them onto its devices."""
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    par = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, n_devices=4,
                             **KW)
    files = _counts_files(ckpt_dir)
    assert len(files) >= 3
    os.remove(os.path.join(ckpt_dir, "embedding.npy"))
    os.remove(os.path.join(ckpt_dir, "embedding.json"))
    os.remove(os.path.join(ckpt_dir, files[0]))
    res = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, n_devices=4,
                             **KW)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(par))


def test_checkpoint_every_thins_saves(graph, ref, ckpt_dir, monkeypatch):
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    passes = alg._cooc_passes(graph, KW["num_walks"], KW["walk_length"],
                              KW["window_size"])
    out = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir,
                             checkpoint_every=2, **KW)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert len(_counts_files(ckpt_dir)) == (passes + 1) // 2


def test_fingerprint_rejects_different_corpus(graph, ckpt_dir):
    """Counts from different walk parameters (or a different graph) must
    never be reused: the fingerprint embedded in each pass file differs,
    so the resume recounts from scratch."""
    alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    kw2 = dict(KW, seed=8)
    ref2 = alg.embed_deepwalk(graph, **kw2)
    out2 = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **kw2)
    np.testing.assert_array_equal(np.asarray(out2), ref2)


def test_count_checkpoint_unit(tmp_path):
    """CountCheckpoint mechanics: fingerprint validation, atomic pass
    files, every=k thinning, done marker round-trip."""
    import jax.numpy as jnp

    ck = cooccur.CountCheckpoint(str(tmp_path), "fp-a", every=2)
    r = (jnp.array([1, 2], jnp.int32), jnp.array([3, 4], jnp.int32),
         jnp.array([5, 6], jnp.int32), 2)
    ck.save_pass(0, r)
    ck.save_pass(1, r)  # thinned (1 % 2 != 0)
    assert ck.has_pass(0) and not ck.has_pass(1)
    cen, ctx, cnt, m = ck.load_pass(0)
    assert m == 2
    np.testing.assert_array_equal(np.asarray(cen), [1, 2])
    np.testing.assert_array_equal(np.asarray(cnt), [5, 6])
    # wrong fingerprint: invisible
    other = cooccur.CountCheckpoint(str(tmp_path), "fp-b")
    assert not other.has_pass(0)
    assert other.load_pass(0) is None
    # done marker
    p = str(tmp_path / "emb.npy")
    np.save(p, np.zeros((4, 3), np.float32))
    ck.mark_done(p, (4, 3))
    mm = ck.done_result(3)
    assert mm is not None and mm.shape == (4, 3)
    assert ck.done_result(5) is None  # dim mismatch
    assert other.done_result(3) is None  # fp mismatch


def test_node2vec_lifecycle(graph, ckpt_dir):
    """Second-order pipeline carries the same lifecycle (walk-cost
    regeneration is the expensive stage there)."""
    kw = dict(feature_dim=8, num_walks=1, walk_length=8, window_size=3,
              p=0.5, q=2.0, seed=4, backend="device",
              cooccurrence="device")
    ref = alg.embed_node2vec(graph, **kw)
    out = alg.embed_node2vec(graph, checkpoint_dir=ckpt_dir, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    again = alg.embed_node2vec(graph, checkpoint_dir=ckpt_dir, **kw)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(ref))


def test_out_without_checkpoint(graph, ref, tmp_path):
    """out= alone streams the device pipeline's embedding to disk."""
    p = str(tmp_path / "dw.npy")
    out = alg.embed_deepwalk(graph, out=p, **KW)
    assert isinstance(out, np.memmap)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_out_on_host_paths(graph, tmp_path):
    """out= is one contract across backends: host walker and
    host-counted device paths persist + return a memmap too."""
    p1 = str(tmp_path / "h.npy")
    a = alg.embed_deepwalk(graph, feature_dim=8, num_walks=1, walk_length=8,
                           window_size=3, seed=1)
    b = alg.embed_deepwalk(graph, feature_dim=8, num_walks=1, walk_length=8,
                           window_size=3, seed=1, out=p1)
    np.testing.assert_array_equal(a, np.asarray(b))
    p2 = str(tmp_path / "d.npy")
    c = alg.embed_deepwalk(graph, feature_dim=8, num_walks=1, walk_length=8,
                           window_size=3, seed=1, backend="device")
    d = alg.embed_deepwalk(graph, feature_dim=8, num_walks=1, walk_length=8,
                           window_size=3, seed=1, backend="device", out=p2)
    np.testing.assert_array_equal(c, np.asarray(d))


def test_lifecycle_validation(graph):
    with pytest.raises(ValueError, match="checkpoint_dir"):
        alg.embed_deepwalk(graph, feature_dim=8, checkpoint_dir="/tmp/x")
    with pytest.raises(ValueError, match="checkpoint_dir"):
        alg.embed_node2vec(graph, feature_dim=8, backend="device",
                           checkpoint_dir="/tmp/x")


# ------------------------------------------------------- DiskGraph input
@pytest.fixture(scope="module")
def disk_pair(tmp_path_factory):
    """(SparseMatrix, DiskGraph) built from the same lines (including
    self-loops, which the walk CSR must drop identically)."""
    pytest.importorskip("ctypes")
    from cleora_tpu.graph.stream import build_graph_streaming
    from cleora_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(3)
    lines = [f"n{rng.integers(0, 120)} n{rng.integers(0, 120)}"
             for _ in range(700)] + ["n5 n5", "n7 n7"]
    d = tmp_path_factory.mktemp("diskg")
    inp = str(d / "edges.tsv")
    with open(inp, "w") as f:
        f.write("\n".join(lines) + "\n")
    dg = build_graph_streaming([inp], "complex::reflexive::n",
                               str(d / "graph"), files=True)
    g = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")
    return g, dg


@pytest.mark.parametrize("with_vals", [False, True])
def test_disk_walk_csr_parity(disk_pair, with_vals):
    """The streamed walk-CSR build (bounded two-pass over the memmaps,
    forced multi-chunk) is identical to the in-RAM branch."""
    g, dg = disk_pair
    a = alg._walk_csr_build(g, with_vals)
    b = alg._walk_csr_build_disk(dg, with_vals, chunk_rows=17)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        if np.isscalar(x):
            assert x == y
        else:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_disk_graph_deepwalk_bitwise(disk_pair):
    g, dg = disk_pair
    kw = dict(feature_dim=8, num_walks=2, walk_length=12, window_size=3,
              seed=7, backend="device", cooccurrence="device")
    np.testing.assert_array_equal(
        np.asarray(alg.embed_deepwalk(dg, **kw)),
        np.asarray(alg.embed_deepwalk(g, **kw)),
    )


def test_disk_graph_node2vec_bitwise(disk_pair):
    g, dg = disk_pair
    kw = dict(feature_dim=8, num_walks=1, walk_length=8, p=0.5, q=2.0,
              backend="device", cooccurrence="device")
    np.testing.assert_array_equal(
        np.asarray(alg.embed_node2vec(dg, **kw)),
        np.asarray(alg.embed_node2vec(g, **kw)),
    )


def test_disk_graph_host_backend_error(disk_pair):
    _, dg = disk_pair
    with pytest.raises(ValueError, match="backend='device'"):
        alg.embed_deepwalk(dg, feature_dim=8)


def test_disk_graph_full_lifecycle(disk_pair, tmp_path):
    """The complete production shape: streamed build on disk → device
    walk pipeline with counting checkpoints → streamed npy output →
    killed-state resume, no graph materialization anywhere."""
    _, dg = disk_pair
    ck = str(tmp_path / "ck")
    kw = dict(feature_dim=8, num_walks=2, walk_length=10, window_size=3,
              seed=5, backend="device", cooccurrence="device")
    full = alg.embed_deepwalk(dg, checkpoint_dir=ck, **kw)
    os.remove(os.path.join(ck, "embedding.npy"))
    os.remove(os.path.join(ck, "embedding.json"))
    res = alg.embed_deepwalk(dg, checkpoint_dir=ck, **kw)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(full))


def test_done_marker_keys_on_factorization_params(graph, ckpt_dir,
                                                  monkeypatch):
    """Same counts, different factorization knobs: the done marker must
    NOT return the stale embedding — the counted passes are reused, the
    factorization reruns with the new parameters."""
    alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    ref_tuned = alg._walks_ppmi_device(
        graph, KW["feature_dim"], KW["window_size"], KW["seed"],
        lambda: alg._device_walks(graph, KW["num_walks"],
                                  KW["walk_length"], KW["seed"],
                                  batch=alg._WALK_BATCH // 2,
                                  resident=True),
        passes=alg._cooc_passes(graph, KW["num_walks"], KW["walk_length"],
                                KW["window_size"]),
        oversample=4,
    )

    def boom(*a, **k):
        raise AssertionError("counts are durable — no walk regeneration")

    monkeypatch.setattr(alg, "_device_walks", boom)
    tuned = alg._walks_ppmi_device(
        graph, KW["feature_dim"], KW["window_size"], KW["seed"], boom,
        passes=alg._cooc_passes(graph, KW["num_walks"], KW["walk_length"],
                                KW["window_size"]),
        oversample=4, checkpoint_dir=ckpt_dir,
        fp_params=dict(engine="walk1", num_walks=KW["num_walks"],
                       walk_length=KW["walk_length"]),
    )
    np.testing.assert_array_equal(np.asarray(tuned), np.asarray(ref_tuned))


def test_disk_piece_rejected_for_walks(tmp_path):
    """A sharded-build PIECE has edges only for its row range — the walk
    engines must refuse it (walks would silently dead-end everywhere
    else), pointing at merge_disk_graph_shards."""
    from cleora_tpu.graph.stream import (build_graph_streaming,
                                         count_entities_streaming)
    from cleora_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native builder unavailable")
    lines = [f"n{i} n{(i * 7) % 50}" for i in range(300)]
    n = count_entities_streaming(lines, "complex::reflexive::n")
    piece = build_graph_streaming(iter(lines), "complex::reflexive::n",
                                  str(tmp_path / "p"),
                                  row_range=(0, n // 2))
    with pytest.raises(ValueError, match="piece"):
        alg.embed_deepwalk(piece, feature_dim=8, num_walks=1,
                           walk_length=6, backend="device",
                           cooccurrence="device")


def test_corrupt_pass_file_recounts(graph, ref, ckpt_dir):
    """A truncated/corrupt pass file (e.g. a crash mid-hardlink or disk
    fault) must be treated as absent — recount, not crash (np.load
    raises BadZipFile there, not OSError)."""
    alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    os.remove(os.path.join(ckpt_dir, "embedding.npy"))
    os.remove(os.path.join(ckpt_dir, "embedding.json"))
    f = os.path.join(ckpt_dir, _counts_files(ckpt_dir)[0])
    with open(f, "r+b") as fh:
        fh.truncate(100)  # corrupt: valid path, unreadable zip
    res = alg.embed_deepwalk(graph, checkpoint_dir=ckpt_dir, **KW)
    np.testing.assert_array_equal(np.asarray(res), ref)


def test_disk_checkpoint_sharded_factorization_compose(disk_pair, tmp_path,
                                                       monkeypatch):
    """Triple compose: DiskGraph input × counting checkpoints ×
    mesh-sharded factorization — killed after counting, resumed with the
    partitions redistributed to the mesh, byte-identical output."""
    _, dg = disk_pair
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    ck = str(tmp_path / "ck")
    kw = dict(feature_dim=8, num_walks=2, walk_length=10, window_size=3,
              seed=5, backend="device", cooccurrence="device",
              n_devices=4, factorization="sharded")
    full = alg.embed_deepwalk(dg, checkpoint_dir=ck, **kw)
    os.remove(os.path.join(ck, "embedding.npy"))
    os.remove(os.path.join(ck, "embedding.json"))

    def boom(*a, **k):
        raise AssertionError("counting durable — no regeneration")

    monkeypatch.setattr(alg, "_device_walks", boom)
    res = alg.embed_deepwalk(dg, checkpoint_dir=ck, **kw)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(full))
