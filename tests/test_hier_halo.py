"""Explicit two-phase hierarchical halo exchange (VERDICT r3 #6):
``embed_sharded(halo="hier")`` on a ("host", "chip") mesh — chip-axis
all_to_all (ICI), host-axis all_to_all of per-host union slabs (each
boundary row crosses DCN once), intra-host fan-out all_gather — must be
numerically identical to the single-device loop and to the flat exchange.
Reference: the reference has no distributed mode at all (SURVEY.md §2c);
this is the pod runbook's A/B alternative to XLA's implicit decomposition
of the flat collective (parallel/shard.py:HierHaloPlan).
"""

import numpy as np
import pytest

import cleora_tpu as ct
from cleora_tpu.parallel import embed_sharded
from cleora_tpu.parallel.mesh import make_hier_mesh, make_mesh
from cleora_tpu.parallel.shard import plan_halo, plan_halo_hier, shard_graph


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(17)
    src = rng.integers(0, 500, size=5000)
    dst = rng.integers(0, 500, size=5000)
    return ct.SparseMatrix.from_edge_arrays(src, dst)


@pytest.mark.parametrize("hc", [(2, 4), (4, 2), (2, 2)])
def test_hier_matches_single_device(graph, hc):
    h, c = hc
    mesh = make_hier_mesh(n_hosts=h, chips_per_host=c)
    ref = ct.embed(graph, feature_dim=16, num_iterations=3, whiten=False)
    got = embed_sharded(graph, feature_dim=16, num_iterations=3,
                        whiten=False, mesh=mesh, halo="hier")
    assert np.allclose(ref, got, atol=2e-5), np.abs(ref - got).max()


def test_hier_whiten_and_convergence(graph):
    mesh = make_hier_mesh(n_hosts=2, chips_per_host=4)
    ref = ct.embed(graph, feature_dim=16, num_iterations=4, whiten=True)
    got = embed_sharded(graph, feature_dim=16, num_iterations=4,
                        whiten=True, mesh=mesh, halo="hier")
    # whitening: eigh sign ambiguity → Gram geometry
    assert np.allclose(ref @ ref.T, got @ got.T, atol=1e-3)

    a = embed_sharded(graph, feature_dim=16, num_iterations=40,
                      whiten=False, convergence_threshold=1e-2,
                      mesh=mesh, halo="hier")
    b = embed_sharded(graph, feature_dim=16, num_iterations=40,
                      whiten=False, convergence_threshold=1e-2,
                      n_devices=8)
    assert np.allclose(a, b, atol=1e-5)


def test_hier_matches_flat_halo_exactly_shaped(graph):
    """Same graph, same mesh size: hier and flat exchanges agree."""
    mesh = make_hier_mesh(n_hosts=2, chips_per_host=4)
    flat = embed_sharded(graph, feature_dim=8, num_iterations=3,
                         whiten=False, mesh=mesh)
    hier = embed_sharded(graph, feature_dim=8, num_iterations=3,
                         whiten=False, mesh=mesh, halo="hier")
    assert np.allclose(flat, hier, atol=2e-5)


def test_hier_checkpoint_resume(graph, tmp_path):
    mesh = make_hier_mesh(n_hosts=2, chips_per_host=2)
    kw = dict(feature_dim=8, num_iterations=4, whiten=False,
              halo="hier", checkpoint_every=2)
    plain = embed_sharded(graph, mesh=mesh, **kw)
    ck = embed_sharded(graph, mesh=mesh,
                       checkpoint_dir=str(tmp_path / "ck"), **kw)
    assert np.allclose(plain, ck, atol=1e-6)
    again = embed_sharded(graph, mesh=mesh,
                          checkpoint_dir=str(tmp_path / "ck"), **kw)
    assert np.array_equal(again, ck)


def test_hier_requires_hier_mesh(graph):
    with pytest.raises(ValueError, match="hier"):
        embed_sharded(graph, feature_dim=8, num_iterations=1,
                      mesh=make_mesh(8), halo="hier")


def test_hier_plan_dcn_dedup(graph):
    """The cross-host slab is the UNION over the destination host's chips:
    Mh never exceeds the sum of the flat plan's per-chip needs, and on
    shared-boundary graphs it is strictly smaller (the DCN win)."""
    sharded = shard_graph(graph, "left", 8)
    flat = plan_halo(sharded)
    hier = plan_halo_hier(sharded, 2, 4)
    P = 8
    C, H = 4, 2
    rps = sharded.rows_per_shard
    total_flat_cross = 0
    total_hier_cross = 0
    for k in range(P):
        for h in range(H):
            if k // C == h:
                continue
            # flat: k sends to each chip of host h separately
            flat_rows = 0
            for j in range(h * C, (h + 1) * C):
                flat_rows += int(np.count_nonzero(
                    np.diff(np.sort(flat.send_idx[k, j])) != 0
                )) + 1
            hier_rows = int(np.count_nonzero(
                np.diff(np.sort(hier.send_cross[k, h])) != 0
            )) + 1
            total_flat_cross += flat_rows
            total_hier_cross += hier_rows
            assert hier_rows <= flat_rows
    assert total_hier_cross < total_flat_cross  # dedup actually triggered
