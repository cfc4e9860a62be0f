"""Sharded sibling algorithms (parallel/algorithms.py — VERDICT r3 #2):
ProNE / RandNE / HOPE on the multi-chip sharded-ELL substrate must match
their single-device device backends on the virtual CPU mesh.

Sign conventions: the distributed epilogues use Gram-eigh forms whose
columns match the single-device ``svd`` outputs up to per-column sign
flips (HOPE: joint source/target flips), so comparisons sign-align
columns first and also check the rotation-invariant Gram geometry.
Reference anchor: /root/reference/pycleora/algorithms.py:23-149 (host
scipy only — no distributed or accelerator path exists there).
"""

import numpy as np
import pytest

import cleora_tpu as ct
from cleora_tpu.algorithms import embed_hope, embed_prone, embed_randne


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 400, size=4000)
    dst = rng.integers(0, 400, size=4000)
    return ct.SparseMatrix.from_edge_arrays(src, dst)


def _sign_align(ref, got):
    s = np.sign(np.sum(ref * got, axis=0))
    s[s == 0] = 1.0
    return got * s


def _assert_matches(ref, got, label, atol=5e-3):
    assert got.shape == ref.shape, label
    assert np.isfinite(got).all(), label
    got = _sign_align(ref, got)
    # rotation-invariant geometry (robust to near-degenerate spectra)
    gr = ref @ ref.T
    gg = got @ got.T
    assert np.allclose(gr, gg, atol=1e-3), (
        f"{label}: Gram geometry diverges "
        f"(max {np.abs(gr - gg).max():.2e})"
    )
    # element-wise after sign alignment
    assert np.allclose(ref, got, atol=atol), (
        f"{label}: max delta {np.abs(ref - got).max():.2e}"
    )


@pytest.mark.parametrize("nd", [1, 2, 8])
def test_prone_sharded_matches_single_device(graph, nd):
    ref = embed_prone(graph, feature_dim=16, backend="device")
    got = embed_prone(graph, feature_dim=16, backend="device", n_devices=nd)
    _assert_matches(ref, got, f"prone nd={nd}")


@pytest.mark.parametrize("nd", [2, 8])
def test_randne_sharded_matches_single_device(graph, nd):
    ref = embed_randne(graph, feature_dim=16, num_iterations=6,
                       backend="device")
    got = embed_randne(graph, feature_dim=16, num_iterations=6,
                       backend="device", n_devices=nd)
    # RandNE has no SVD epilogue — outputs agree directly (no sign games)
    assert got.shape == ref.shape
    assert np.allclose(ref, got, atol=2e-4), np.abs(ref - got).max()


def test_randne_sharded_short_weights(graph):
    ref = embed_randne(graph, feature_dim=8, num_iterations=5,
                       weights=[1.0, 0.5], backend="device")
    got = embed_randne(graph, feature_dim=8, num_iterations=5,
                       weights=[1.0, 0.5], backend="device", n_devices=4)
    assert np.allclose(ref, got, atol=2e-4)


@pytest.mark.parametrize("nd", [1, 2, 8])
def test_hope_sharded_matches_single_device(graph, nd):
    ref = embed_hope(graph, feature_dim=16, backend="device")
    got = embed_hope(graph, feature_dim=16, backend="device", n_devices=nd)
    _assert_matches(ref, got, f"hope nd={nd}")


def test_hope_sharded_beta_check(graph):
    with pytest.raises(ValueError, match="Neumann"):
        embed_hope(graph, feature_dim=16, backend="device", n_devices=2,
                   beta=50.0)


def test_prone_sharded_tiny_graph():
    """kmax = min(10, n) < 10 path + heavy padding (n < shard multiple)."""
    rng = np.random.default_rng(3)
    g = ct.SparseMatrix.from_edge_arrays(
        rng.integers(0, 6, size=30), rng.integers(0, 6, size=30)
    )
    ref = embed_prone(g, feature_dim=4, backend="device")
    got = embed_prone(g, feature_dim=4, backend="device", n_devices=8)
    _assert_matches(ref, got, "prone tiny", atol=1e-2)


@pytest.mark.parametrize("nd", [2, 8])
def test_netmf_sharded_matches_single_device(graph, nd):
    """Sharded blocked NetMF = single-device device path up to f32
    summation order (same sketch draws, same math)."""
    from cleora_tpu.algorithms import embed_netmf

    kw = dict(feature_dim=16, oversample=24, power_iters=4, seed=3)
    dev = embed_netmf(graph, backend="device", **kw)
    sh = embed_netmf(graph, backend="device", n_devices=nd, block_rows=96,
                     **kw)
    assert sh.shape == dev.shape
    assert np.isfinite(sh).all()
    assert np.allclose(dev @ dev.T, sh @ sh.T, atol=1e-3), (
        np.abs(dev @ dev.T - sh @ sh.T).max()
    )


@pytest.mark.parametrize("nd", [2, 8])
def test_grarep_sharded_matches_single_device(graph, nd):
    from cleora_tpu.algorithms import embed_grarep

    kw = dict(feature_dim=16, max_step=2, oversample=24, power_iters=4,
              seed=3)
    dev = embed_grarep(graph, backend="device", **kw)
    sh = embed_grarep(graph, backend="device", n_devices=nd, block_rows=96,
                      **kw)
    assert sh.shape == dev.shape
    assert np.isfinite(sh).all()
    assert np.allclose(dev @ dev.T, sh @ sh.T, atol=1e-3), (
        np.abs(dev @ dev.T - sh @ sh.T).max()
    )


def test_netmf_sharded_tiny_graph_panels():
    """n < block_rows on an 8-way mesh: a single block spans every shard,
    so the guard-row scatter clamps at BOTH panel ends and most shards
    hold only padding — the panel path must still match the dense
    single-device backend."""
    from cleora_tpu.algorithms import embed_netmf

    rng = np.random.default_rng(5)
    g = ct.SparseMatrix.from_edge_arrays(
        rng.integers(0, 30, size=300), rng.integers(0, 30, size=300)
    )
    kw = dict(feature_dim=8, oversample=16, power_iters=4, seed=3)
    dev = embed_netmf(g, backend="device", **kw)
    sh = embed_netmf(g, backend="device", n_devices=8, block_rows=96, **kw)
    assert sh.shape == dev.shape
    assert np.isfinite(sh).all()
    assert np.allclose(dev @ dev.T, sh @ sh.T, atol=1e-3), (
        np.abs(dev @ dev.T - sh @ sh.T).max()
    )


def test_sharded_walks_indivisible_lanes(graph):
    """A sole short batch whose lane count doesn't divide the mesh size
    must pad rather than fail device_put's divisibility check (review
    finding: 149 lanes on a 4-device mesh raised ValueError)."""
    from cleora_tpu import SparseMatrix
    from cleora_tpu import algorithms as alg
    from cleora_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    lines = [f"n{rng.integers(0, 149)} n{rng.integers(0, 149)}"
             for _ in range(400)]
    g = SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")
    single = np.concatenate(
        list(alg._device_walks(g, 1, 8, seed=2)), axis=0)
    assert single.shape[0] % 4 != 0  # the regression precondition
    sharded = np.concatenate(
        list(alg._device_walks(g, 1, 8, seed=2, mesh=make_mesh(4))), axis=0)
    assert np.array_equal(single, sharded)
    s2 = np.concatenate(
        list(alg._device_walks2(g, 1, 6, 0.5, 2.0, seed=2)), axis=0)
    sh2 = np.concatenate(
        list(alg._device_walks2(g, 1, 6, 0.5, 2.0, seed=2,
                                mesh=make_mesh(4))), axis=0)
    assert np.array_equal(s2, sh2)


def test_sharded_walks_value_identical(graph):
    """Batch-sharding the walk lanes over the mesh (tables replicated)
    must produce BITWISE-identical walks — integer gathers and per-lane
    PRNG have no reassociation freedom under SPMD."""
    from cleora_tpu import algorithms as alg

    single = np.concatenate(
        list(alg._device_walks(graph, 2, 12, seed=5)), axis=0
    )
    from cleora_tpu.parallel.mesh import make_mesh

    for nd in (2, 8):
        sharded = np.concatenate(
            list(alg._device_walks(graph, 2, 12, seed=5,
                                   mesh=make_mesh(nd))), axis=0
        )
        assert np.array_equal(single, sharded), nd
    # second-order engine, same contract
    s2 = np.concatenate(
        list(alg._device_walks2(graph, 1, 8, 0.5, 2.0, seed=5)), axis=0
    )
    sh2 = np.concatenate(
        list(alg._device_walks2(graph, 1, 8, 0.5, 2.0, seed=5,
                                mesh=make_mesh(8))), axis=0
    )
    assert np.array_equal(s2, sh2)
    # public API accepts the mesh
    e = alg.embed_deepwalk(graph, feature_dim=8, num_walks=1,
                           walk_length=8, backend="device", n_devices=4)
    assert np.isfinite(e).all()


def test_sharded_mesh_object(graph):
    """Passing an explicit mesh works like n_devices."""
    from cleora_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    a = embed_randne(graph, feature_dim=8, num_iterations=4,
                     backend="device", mesh=mesh)
    b = embed_randne(graph, feature_dim=8, num_iterations=4,
                     backend="device", n_devices=4)
    assert np.array_equal(a, b)


def test_prone_sharded_from_full_disk_graph(tmp_path):
    """Sharded ProNE straight off a FULL streamed build (round 5): the
    operator is sharded from the DiskGraph memmaps and sym-normalized in
    sharded space — no host COO materialization — and must match the
    in-RAM graph."""
    pytest.importorskip("ctypes")
    from cleora_tpu.graph.stream import build_graph_streaming
    from cleora_tpu.native import get_lib
    from cleora_tpu.parallel.algorithms import prone_sharded, randne_sharded

    if get_lib() is None:
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(5)
    lines = [f"n{rng.integers(0, 150)} n{rng.integers(0, 150)}"
             for _ in range(1000)]
    g = ct.SparseMatrix.from_iterator(iter(lines), "complex::reflexive::n")
    dg = build_graph_streaming(iter(lines), "complex::reflexive::n",
                               str(tmp_path / "g"))
    for fn, kw in ((prone_sharded, dict(mu=0.2, theta=0.5, seed=3)),
                   (randne_sharded, dict(weights=[1.0, 0.5], seed=3))):
        ref = fn(g, 16, n_devices=4, **kw)
        got = fn(dg, 16, n_devices=4, **kw)
        assert np.allclose(ref @ ref.T, got @ got.T, atol=1e-3), fn
        assert np.allclose(ref, _sign_align(ref, got), atol=5e-3), fn


def test_piece_single_process_rejected(tmp_path):
    """A sharded-build piece in a single-process run gets the descriptive
    error (merged graph or multi-process), not a wrong answer."""
    pytest.importorskip("ctypes")
    from cleora_tpu.graph.stream import build_graph_streaming
    from cleora_tpu.native import get_lib
    from cleora_tpu.parallel.algorithms import hope_sharded, prone_sharded

    if get_lib() is None:
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(5)
    lines = [f"n{rng.integers(0, 100)} n{rng.integers(0, 100)}"
             for _ in range(500)]
    from cleora_tpu.graph.stream import count_entities_streaming
    n = count_entities_streaming(lines, "complex::reflexive::n")
    piece = build_graph_streaming(iter(lines), "complex::reflexive::n",
                                  str(tmp_path / "p"), row_range=(0, n // 2))
    with pytest.raises(ValueError, match="piece"):
        prone_sharded(piece, 16, mu=0.2, theta=0.5, seed=3, n_devices=4)
    with pytest.raises(ValueError, match="TRANSPOSED"):
        hope_sharded(piece, 16, beta=0.01, seed=3, oversample=8,
                     power_iters=2, n_devices=4)


def test_sharded_siblings_streamed_out(graph, tmp_path):
    """out= on the shard_map siblings streams a finalized .npy per shard
    block (state.write_memmap transform) — identical to the in-memory
    finalized result, without the allgathered (n, d) host copy."""
    for fn, kw in (
        (embed_prone, dict(mu=0.2, theta=0.5)),
        (embed_randne, dict(num_iterations=4)),
        (embed_hope, dict(beta=0.01, oversample=8, power_iters=2)),
    ):
        p = str(tmp_path / f"{fn.__name__}.npy")
        ref = fn(graph, feature_dim=16, backend="device", n_devices=4,
                 seed=3, **kw)
        got = fn(graph, feature_dim=16, backend="device", n_devices=4,
                 seed=3, out=p, **kw)
        assert isinstance(got, np.memmap), fn.__name__
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_single_device_siblings_out_persist(graph, tmp_path):
    """out= on the non-sharded backends persists the same embedding."""
    from cleora_tpu.algorithms import embed_grarep, embed_netmf

    for fn, kw in (
        (embed_prone, dict(backend="device")),
        (embed_netmf, dict(backend="device", window_size=2)),
        (embed_grarep, dict(max_step=2)),
    ):
        p = str(tmp_path / f"{fn.__name__}.npy")
        ref = fn(graph, feature_dim=16, seed=3, **kw)
        got = fn(graph, feature_dim=16, seed=3, out=p, **kw)
        np.testing.assert_array_equal(np.asarray(got), ref), fn.__name__


def test_blocked_sharded_streamed_out(graph, tmp_path):
    """out= on the device-resident blocked drivers (NetMF/GraRep): the
    sharded panels stream the finalized .npy per shard block, identical
    to the in-memory finalized result."""
    from cleora_tpu.algorithms import embed_grarep, embed_netmf

    for fn, kw in (
        (embed_netmf, dict(window_size=2, negative_samples=1.0,
                           oversample=6, power_iters=1)),
        (embed_grarep, dict(max_step=2, oversample=6, power_iters=1)),
    ):
        p = str(tmp_path / f"{fn.__name__}.npy")
        ref = fn(graph, feature_dim=16, backend="device", n_devices=4,
                 seed=3, **kw)
        got = fn(graph, feature_dim=16, backend="device", n_devices=4,
                 seed=3, out=p, **kw)
        assert isinstance(got, np.memmap), fn.__name__
        np.testing.assert_array_equal(np.asarray(got), ref)
