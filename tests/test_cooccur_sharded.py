"""Mesh-sharded PPMI factorization (parallel/cooccur.py, VERDICT r4 #2):
the walk pipeline's factorization with NO single-device HBM pin — count
ranges stay on their counting devices, the rsvd applies as a psum of
per-device local SpMMs."""

import numpy as np
import pytest

import jax

from cleora_tpu import SparseMatrix
from cleora_tpu import algorithms as alg
from cleora_tpu.ops import cooccur
from cleora_tpu.parallel import cooccur as pc

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


def _dist_ranges(graph, passes, ndev=4):
    """Pass-parallel counting with ranges LEFT on their devices."""
    n = graph.num_entities
    ranges, m = cooccur.device_pair_counts(
        lambda: alg._device_walks(graph, KW["num_walks"],
                                  KW["walk_length"], KW["seed"],
                                  resident=True),
        n, KW["window_size"], passes=passes,
        devices=jax.devices()[:ndev], gather_home=False,
    )
    return ranges, m


def test_ranges_stay_distributed(graph):
    ranges, _ = _dist_ranges(graph, passes=5, ndev=4)
    devs = {next(iter(r[0].devices())) for r in ranges}
    assert len(devs) == 4  # 5 passes over 4 devices → all 4 used


def test_sharded_factorization_matches_single(graph, ref, monkeypatch):
    """Forced factorization='sharded' through the public API: same
    counts, same sketch seed, row-disjoint partitions ⇒ the psum'd apply
    equals the sequential concat scan — parity to f32 tolerance (exact
    on the CPU mesh, where chunk layouts coincide)."""
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    sharded = alg.embed_deepwalk(graph, n_devices=4,
                                 factorization="sharded", **KW)
    np.testing.assert_allclose(np.asarray(sharded), ref,
                               rtol=2e-4, atol=2e-4)


def test_sharded_single_group_degenerate(graph, ref):
    """factorization='sharded' without a mesh (sequential counting, one
    device) runs the same program on a 1-device mesh."""
    sharded = alg.embed_deepwalk(graph, factorization="sharded", **KW)
    np.testing.assert_allclose(np.asarray(sharded), ref,
                               rtol=2e-4, atol=2e-4)


def test_capacity_beyond_one_device(graph, ref, monkeypatch):
    """THE capacity criterion: total unique pairs exceed one device's
    (simulated) HBM budget, the per-device partitions fit, the sharded
    path auto-engages, and the embedding still matches single-device.
    Also proves the single-device path would genuinely refuse."""
    from cleora_tpu.ops import memory

    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    passes = alg._cooc_passes(graph, KW["num_walks"], KW["walk_length"],
                              KW["window_size"])
    ranges, m = _dist_ranges(graph, passes, ndev=4)
    groups = pc.groups_by_device(ranges)
    slots = [sum(int(c.shape[0]) for c, _, _, _ in rs) for _, rs in groups]
    n = graph.num_entities
    d_eq = max(1, (3 * min(n, min(KW["feature_dim"], n - 1) + 16)) // 2)
    need_total = memory.estimate_embed_hbm_bytes(n, d_eq, sum(slots))
    need_dev = memory.estimate_embed_hbm_bytes(n, d_eq, max(slots))
    assert need_dev < need_total
    limit = (need_dev + need_total) // 2
    monkeypatch.setattr(memory, "device_hbm_limit", lambda: limit)

    # the single-device factorization refuses this corpus...
    with pytest.raises(ValueError, match="HBM"):
        alg._device_counts_to_embeddings(
            pc.home_ranges(ranges), m, n, KW["feature_dim"], KW["seed"])

    # ...while the public API auto-engages the sharded path and succeeds
    calls = {"n": 0}
    orig = pc.sharded_counts_to_embeddings

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pc, "sharded_counts_to_embeddings", spy)
    # pin the walk-table placement: its auto fit check would also trip on
    # the simulated limit, and this test is about the PPMI capacity
    out = alg.embed_deepwalk(graph, n_devices=4,
                             walk_tables="replicated", **KW)
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_sharded_with_checkpoint_resume(graph, tmp_path, monkeypatch):
    """Lifecycle composes: checkpointed pass-parallel counting + sharded
    factorization, resumed from disk with the per-device placement
    restored (pass s → device s % P)."""
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    ck = str(tmp_path / "ck")
    kw = dict(KW, n_devices=4, factorization="sharded")
    full = alg.embed_deepwalk(graph, checkpoint_dir=ck, **kw)
    import os

    os.remove(os.path.join(ck, "embedding.npy"))
    os.remove(os.path.join(ck, "embedding.json"))

    def boom(*a, **k):
        raise AssertionError("counting durable — no regeneration")

    monkeypatch.setattr(alg, "_device_walks", boom)
    res = alg.embed_deepwalk(graph, checkpoint_dir=ck, **kw)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(full))


def test_sharded_streamed_out(graph, ref, tmp_path, monkeypatch):
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    p = str(tmp_path / "emb.npy")
    out = alg.embed_deepwalk(graph, n_devices=4, factorization="sharded",
                             out=p, **KW)
    assert isinstance(out, np.memmap)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_sharded_node2vec(graph, monkeypatch):
    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    kw = dict(feature_dim=8, num_walks=1, walk_length=8, window_size=3,
              p=0.5, q=2.0, seed=4, backend="device",
              cooccurrence="device")
    single = alg.embed_node2vec(graph, **kw)
    sharded = alg.embed_node2vec(graph, n_devices=4,
                                 factorization="sharded", **kw)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-4, atol=2e-4)


def test_home_ranges_and_groups(graph):
    ranges, _ = _dist_ranges(graph, passes=5, ndev=4)
    homed = pc.home_ranges(ranges)
    devs = {d for r in homed for d in r[0].devices()}
    assert len(devs) == 1
    for a, b in zip(ranges, homed):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
        assert a[3] == b[3]
    groups = pc.groups_by_device(homed)
    assert len(groups) == 1 and len(groups[0][1]) == len(ranges)


def test_sharded_validation(graph):
    with pytest.raises(ValueError, match="sharded"):
        alg.embed_deepwalk(graph, feature_dim=8, backend="device",
                           factorization="sharded")  # host counting
    with pytest.raises(ValueError, match="factorization"):
        alg.embed_deepwalk(graph, feature_dim=8, backend="device",
                           cooccurrence="device", factorization="bogus")


def test_resume_across_device_counts(graph, tmp_path, monkeypatch):
    """The counting checkpoint is TOPOLOGY-FREE (unlike the embed
    checkpoint's process-count pin): passes counted on a 4-device mesh
    resume onto 2 devices or the sequential path with identical output —
    hash partitions carry no device identity."""
    import os

    monkeypatch.setattr(alg, "_COOC_PASS_PAIRS", 2_000)
    ck = str(tmp_path / "ck")
    full = alg.embed_deepwalk(graph, checkpoint_dir=ck, n_devices=4, **KW)

    def boom(*a, **k):
        raise AssertionError("counts are durable — no regeneration")

    for nd in (2, None):
        os.remove(os.path.join(ck, "embedding.npy"))
        os.remove(os.path.join(ck, "embedding.json"))
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(alg, "_device_walks", boom)
            if nd:
                res = alg.embed_deepwalk(graph, checkpoint_dir=ck,
                                         n_devices=nd, **KW)
            else:
                res = alg.embed_deepwalk(graph, checkpoint_dir=ck, **KW)
        np.testing.assert_array_equal(np.asarray(res), np.asarray(full))
