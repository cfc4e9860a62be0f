"""Out-of-core (streaming) graph build: cleora_tpu/graph/stream.py +
native/stream.cpp.

The contract: for any input, the streamed DiskGraph holds the SAME arrays
the in-RAM native builder produces (first-seen order, running-occurrence
trimming and duplicate-merge numerics are all input-order-dependent and the
streaming core consumes chunks in order), while the pair stream stays under
the RAM cap by spilling sorted runs.
"""

import os

import numpy as np
import pytest

from cleora_tpu.graph.native import build_graph_native, native_available
from cleora_tpu.graph.stream import (
    DiskGraph,
    build_graph_streaming,
    build_graph_streaming_pairs,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native builder unavailable"
)


def _assert_matches(dg: DiskGraph, ref, check_ids=True):
    assert dg.num_entities == len(ref.entity_ids)
    assert dg.num_edges == len(ref.indices)
    assert np.array_equal(np.asarray(dg.indptr), ref.indptr)
    assert np.array_equal(np.asarray(dg.indices), ref.indices)
    np.testing.assert_allclose(np.asarray(dg.left_vals), ref.left_vals,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(dg.sym_vals), ref.sym_vals,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(dg.row_sums), ref.row_sums,
                               atol=1e-5)
    assert np.array_equal(np.asarray(dg.entity_hashes), ref.entity_hashes)
    assert np.array_equal(np.asarray(dg.column_ids), ref.column_ids)
    if check_ids:
        assert dg.entity_ids_range(0, dg.num_entities) == ref.entity_ids


def test_stream_matches_inram_pair_graph(tmp_path):
    rng = np.random.default_rng(1)
    lines = [f"n{rng.integers(0, 300)} n{rng.integers(0, 300)}"
             for _ in range(8000)]
    ref = build_graph_native(lines, "complex::reflexive::node", 16)
    dg = build_graph_streaming(iter(lines), "complex::reflexive::node",
                               str(tmp_path / "g"), ram_cap_bytes=64 << 20,
                               chunk_bytes=2048)
    _assert_matches(dg, ref)


def test_stream_matches_inram_trimming_hyperedges(tmp_path):
    """Hyperedges larger than trim_n: the running-occurrence trimming is
    order-dependent — chunked streaming must reproduce it exactly."""
    rng = np.random.default_rng(2)
    lines = []
    for _ in range(400):
        a = " ".join(f"u{rng.integers(0, 50)}"
                     for _ in range(rng.integers(1, 40)))
        b = " ".join(f"p{rng.integers(0, 80)}"
                     for _ in range(rng.integers(1, 40)))
        lines.append(f"{a}\t{b}")
    cols = "complex::user complex::product"
    ref = build_graph_native(lines, cols, 8)
    dg = build_graph_streaming(iter(lines), cols, str(tmp_path / "g"),
                               hyperedge_trim_n=8, ram_cap_bytes=64 << 20,
                               chunk_bytes=1024)
    _assert_matches(dg, ref)


def test_stream_many_runs_under_tiny_cap(tmp_path):
    """A tiny RAM cap forces many spilled runs; the k-way merge must still
    produce the exact in-RAM result.  (The native floor for the cap is
    64 MB; monkey the threshold by feeding many small chunks instead.)"""
    rng = np.random.default_rng(3)
    src = rng.integers(0, 1000, 60_000)
    dst = rng.integers(0, 1000, 60_000)
    lines = [f"{s} {t}" for s, t in zip(src, dst)]
    cols = "complex::reflexive::n"
    ref = build_graph_native(lines, cols, 16)
    chunks = [(src[i:i + 7000], dst[i:i + 7000])
              for i in range(0, 60_000, 7000)]
    dg = build_graph_streaming_pairs(chunks, cols, str(tmp_path / "g"),
                                     ram_cap_bytes=64 << 20)
    _assert_matches(dg, ref)
    # spill files are cleaned up after the merge
    assert not [f for f in os.listdir(dg.path) if f.startswith("run_")]


def test_stream_file_mode_skips_bad_lines(tmp_path):
    p = tmp_path / "in.tsv"
    p.write_bytes(b"a b\n\xed\xa0\x80 c\n\nbad\tline\there\nb c\n")
    dg = build_graph_streaming([str(p)], "complex::reflexive::n",
                               str(tmp_path / "g"), files=True)
    assert dg.num_entities == 3  # a, b, c
    assert dg.meta["skipped_lines"] == 2  # surrogate + 3-column line


def test_stream_file_chunk_boundary_mid_line(tmp_path):
    """Lines split across read chunks must reassemble (carry logic)."""
    rng = np.random.default_rng(4)
    lines = [f"x{rng.integers(0, 99)} x{rng.integers(0, 99)}"
             for _ in range(3000)]
    p = tmp_path / "in.txt"
    p.write_text("\n".join(lines))  # no trailing newline
    ref = build_graph_native(lines, "complex::reflexive::n", 16)
    dg = build_graph_streaming([str(p)], "complex::reflexive::n",
                               str(tmp_path / "g"), files=True,
                               chunk_bytes=97)  # pathological chunk size
    _assert_matches(dg, ref)


def test_stream_row_range_slices(tmp_path):
    rng = np.random.default_rng(5)
    lines = [f"n{rng.integers(0, 100)} n{rng.integers(0, 100)}"
             for _ in range(2000)]
    dg = build_graph_streaming(iter(lines), "complex::reflexive::n",
                               str(tmp_path / "g"))
    rows, cols, vals = dg.row_range(10, 30)
    assert (rows >= 10).all() and (rows < 30).all()
    assert rows.shape == cols.shape == vals.shape
    full = dg.row_range(0, dg.num_entities)
    assert full[0].shape[0] == dg.num_edges
    # reconstruct indptr from the slice
    assert np.array_equal(
        np.bincount(full[0], minlength=dg.num_entities),
        np.diff(dg.indptr),
    )


def test_stream_reopen_and_materialize(tmp_path):
    lines = ["u1\tapple banana", "u2\tbanana cherry", "u3\tapple cherry"]
    cols = "user complex::product"
    dg = build_graph_streaming(iter(lines), cols, str(tmp_path / "g"))
    re = DiskGraph(str(tmp_path / "g"))  # fresh open from disk
    assert re.num_entities == dg.num_entities
    sm = re.to_sparse_matrix()
    ref = build_graph_native(lines, cols, 16)
    assert sm.entity_ids == ref.entity_ids
    assert sm.num_edges == len(ref.indices)
    emb = __import__("cleora_tpu").embed(sm, feature_dim=8, num_iterations=3)
    assert np.isfinite(emb).all()


def test_stream_empty_input_raises(tmp_path):
    with pytest.raises(ValueError, match="No valid hyperedge lines"):
        build_graph_streaming(iter([]), "complex::reflexive::n",
                              str(tmp_path / "g"))


def test_stream_non_string_rejects(tmp_path):
    with pytest.raises(ValueError, match="Iterator must yield strings"):
        build_graph_streaming(iter([b"a b"]), "complex::reflexive::n",
                              str(tmp_path / "g"))


def test_stream_loser_tree_many_runs(tmp_path, monkeypatch):
    """Force many small spilled runs (CLEORA_STREAM_RUN_PAIRS) so the
    loser-tree k-way merge actually merges >2 runs, including hub keys that
    appear in every run."""
    monkeypatch.setenv("CLEORA_STREAM_RUN_PAIRS", "4096")
    rng = np.random.default_rng(11)
    n_pairs = 40_000
    src = np.concatenate([rng.integers(0, 800, n_pairs // 2),
                          np.zeros(n_pairs // 2, dtype=np.int64)])  # hub 0
    dst = rng.integers(0, 800, n_pairs)
    lines = [f"{s} {t}" for s, t in zip(src, dst)]
    cols = "complex::reflexive::n"
    ref = build_graph_native(lines, cols, 16)
    dg = build_graph_streaming_pairs([(src, dst)], cols, str(tmp_path / "g"))
    assert dg.meta["pairs_emitted"] >= 4096 * 4  # several runs spilled
    _assert_matches(dg, ref)


def test_stream_two_column_pair_feed(tmp_path):
    """feed_pairs with a two-column spec emits one directed pair per line
    (the roadNet-style ingest), matching text ingest of the same lines."""
    rng = np.random.default_rng(12)
    src = rng.integers(0, 400, 10_000)
    dst = rng.integers(0, 400, 10_000)
    lines = [f"{s}\t{t}" for s, t in zip(src, dst)]
    cols = "complex::a complex::b"
    ref = build_graph_native(lines, cols, 16)
    dg = build_graph_streaming_pairs([(src, dst)], cols, str(tmp_path / "g"))
    _assert_matches(dg, ref)


def test_embed_sharded_from_disk_graph(tmp_path):
    """The multi-device embed runs straight off a streamed build (DiskGraph
    never materialized into a SparseMatrix) and matches the in-RAM path."""
    from cleora_tpu.parallel import embed_sharded

    rng = np.random.default_rng(11)
    lines = [f"n{rng.integers(0, 80)} n{rng.integers(0, 80)}"
             for _ in range(900)]
    dg = build_graph_streaming(iter(lines), "complex::reflexive::n",
                               str(tmp_path / "g"))
    sm = dg.to_sparse_matrix()

    kw = dict(feature_dim=16, num_iterations=5, whiten=True)
    out_disk = embed_sharded(dg, **kw)
    out_ram = embed_sharded(sm, **kw)
    assert out_disk.shape == (dg.num_entities, 16)
    np.testing.assert_allclose(out_disk, out_ram, atol=2e-5)


def test_shard_disk_graph_layout(tmp_path):
    """shard_disk_graph packs the same ShardedCoo as shard_graph on the
    materialized twin (incl. empty trailing shards)."""
    from cleora_tpu.parallel.shard import shard_disk_graph, shard_graph

    lines = [f"a{i % 13} a{(i * 7) % 13}" for i in range(200)]
    dg = build_graph_streaming(iter(lines), "complex::reflexive::a",
                               str(tmp_path / "g"))
    sm = dg.to_sparse_matrix()
    for p in (2, 4, 8):
        sd = shard_disk_graph(dg, "left", p)
        sr = shard_graph(sm, "left", p)
        assert sd.n_rows == sr.n_rows
        assert sd.n_rows_padded == sr.n_rows_padded
        assert sd.rows_per_shard == sr.rows_per_shard
        assert np.array_equal(sd.local_rows, sr.local_rows)
        assert np.array_equal(sd.cols, sr.cols)
        np.testing.assert_allclose(sd.vals, sr.vals, atol=0)


def test_disk_graph_init_matches_sparse_matrix(tmp_path):
    lines = [f"x{i} x{i + 1}" for i in range(30)]
    dg = build_graph_streaming(iter(lines), "complex::reflexive::x",
                               str(tmp_path / "g"))
    sm = dg.to_sparse_matrix()
    np.testing.assert_array_equal(
        dg.initialize_deterministically(8, seed=3),
        sm.initialize_deterministically(8, seed=3),
    )


def test_embed_dim_sharded_from_disk_graph(tmp_path):
    """The dimension-sliced embed (the reference FAQ's beyond-HBM workflow,
    README.md:359-361) runs straight off a streamed build: each slice goes
    through the sharded loader, so one chip can combine the two scale axes
    (dim slices x out-of-core edges) without a full-dim state in HBM."""
    import cleora_tpu as ct

    rng = np.random.default_rng(13)
    lines = [f"n{rng.integers(0, 80)} n{rng.integers(0, 80)}"
             for _ in range(900)]
    dg = build_graph_streaming(iter(lines), "complex::reflexive::n",
                               str(tmp_path / "g"))
    sm = dg.to_sparse_matrix()

    kw = dict(feature_dim=16, slice_dim=8, num_iterations=4, whiten=False)
    out_disk = ct.embed_dim_sharded(dg, **kw)
    out_ram = ct.embed_dim_sharded(sm, **kw)
    assert out_disk.shape == (dg.num_entities, 16)
    np.testing.assert_allclose(out_disk, out_ram, atol=2e-5)


def test_embed_accepts_disk_graph(tmp_path):
    """embed() routes a DiskGraph through the sharded loader transparently."""
    import cleora_tpu as ct

    rng = np.random.default_rng(17)
    lines = [f"n{rng.integers(0, 60)} n{rng.integers(0, 60)}"
             for _ in range(600)]
    dg = build_graph_streaming(iter(lines), "complex::reflexive::n",
                               str(tmp_path / "g"))
    sm = dg.to_sparse_matrix()
    kw = dict(feature_dim=16, num_iterations=4, whiten=False)
    np.testing.assert_allclose(ct.embed(dg, **kw), ct.embed(sm, **kw),
                               atol=2e-5)


def test_count_entities_streaming(tmp_path):
    rng = np.random.default_rng(21)
    lines = [f"n{rng.integers(0, 150)} n{rng.integers(0, 150)}"
             for _ in range(3000)]
    from cleora_tpu.graph.stream import count_entities_streaming

    full = build_graph_streaming(iter(lines), "complex::reflexive::n",
                                 str(tmp_path / "g"))
    assert count_entities_streaming(lines, "complex::reflexive::n",
                                    chunk_bytes=512) == full.num_entities


def test_sharded_build_pieces_tile_full_build(tmp_path):
    """Per-host row-sharded build: each piece holds exactly its row block's
    edges with the GLOBAL entity table/row sums (symmetric Markov values need
    global column stats), and the merged pieces are bitwise-identical to the
    unsharded build — including order-dependent trimming."""
    from cleora_tpu.graph.stream import (
        build_graph_streaming_sharded,
        merge_disk_graph_shards,
        shard_row_bounds,
    )

    rng = np.random.default_rng(22)
    lines = []
    for _ in range(500):  # mix pair lines and trimming-heavy hyperedges
        if rng.random() < 0.2:
            a = " ".join(f"u{rng.integers(0, 40)}"
                         for _ in range(rng.integers(1, 30)))
            b = " ".join(f"p{rng.integers(0, 60)}"
                         for _ in range(rng.integers(1, 30)))
            lines.append(f"{a}\t{b}")
        else:
            lines.append(f"u{rng.integers(0, 40)}\tp{rng.integers(0, 60)}")
    cols = "complex::user complex::product"
    full = build_graph_streaming(iter(lines), cols, str(tmp_path / "full"),
                                 hyperedge_trim_n=8)

    num_shards = 3
    bounds = shard_row_bounds(full.num_entities, num_shards)
    pieces = []
    for k in range(num_shards):
        dg = build_graph_streaming_sharded(
            lines, cols, str(tmp_path / f"piece{k}"), k, num_shards,
            hyperedge_trim_n=8, chunk_bytes=777,
        )
        pieces.append(dg)
        lo, hi = dg.meta["row_range"]
        assert [lo, hi] == [bounds[k], bounds[k + 1]]
        # a piece's edges live only in its row block
        counts = np.diff(dg.indptr)
        assert counts[:lo].sum() == 0 and counts[hi:].sum() == 0
        assert np.array_equal(np.asarray(dg.indptr[lo:hi + 1]) -
                              int(dg.indptr[lo]),
                              np.asarray(full.indptr[lo:hi + 1]) -
                              int(full.indptr[lo]))
        # global entity table identical
        assert np.array_equal(np.asarray(dg.entity_hashes),
                              np.asarray(full.entity_hashes))
        np.testing.assert_allclose(np.asarray(dg.row_sums),
                                   np.asarray(full.row_sums), atol=0)
        # the piece's own slice matches the full build bitwise (sym values
        # prove the col stats are global)
        s, e = int(full.indptr[lo]), int(full.indptr[hi])
        assert np.array_equal(np.asarray(dg.indices), full.indices[s:e])
        assert np.array_equal(np.asarray(dg.left_vals), full.left_vals[s:e])
        assert np.array_equal(np.asarray(dg.sym_vals), full.sym_vals[s:e])

    merged = merge_disk_graph_shards([p.path for p in pieces],
                                     str(tmp_path / "merged"))
    _assert_matches(merged, full.to_sparse_matrix().data)


def test_sharded_build_n_entities_shortcut(tmp_path):
    """Passing n_entities (e.g. broadcast from host 0) skips pass 1."""
    from cleora_tpu.graph.stream import build_graph_streaming_sharded

    lines = [f"a{i % 9}\tb{(i * 3) % 11}" for i in range(300)]
    cols = "complex::a complex::b"
    full = build_graph_streaming(list(lines), cols, str(tmp_path / "full"))
    dg = build_graph_streaming_sharded(
        lines, cols, str(tmp_path / "p0"), 0, 2,
        n_entities=full.num_entities,
    )
    lo, hi = dg.meta["row_range"]
    s, e = int(full.indptr[lo]), int(full.indptr[hi])
    assert np.array_equal(np.asarray(dg.indices), full.indices[s:e])


def test_merge_rejects_gaps_and_overlap(tmp_path):
    from cleora_tpu.graph.stream import (
        build_graph_streaming_sharded,
        merge_disk_graph_shards,
    )

    lines = [f"n{i % 50} n{(i * 7) % 50}" for i in range(400)]
    cols = "complex::reflexive::n"
    p0 = build_graph_streaming_sharded(lines, cols, str(tmp_path / "p0"),
                                       0, 3)
    p2 = build_graph_streaming_sharded(lines, cols, str(tmp_path / "p2"),
                                       2, 3)
    with pytest.raises(ValueError, match="tile|uncovered"):
        merge_disk_graph_shards([p0.path, p2.path], str(tmp_path / "m"))
    with pytest.raises(ValueError, match="tile"):
        merge_disk_graph_shards([p0.path, p0.path], str(tmp_path / "m"))


def test_shard_row_bounds_matches_shard_disk_graph(tmp_path):
    """The build-side partition is the SAME cut the sharded embed uses, so a
    piece built for host k holds exactly shard k's edges."""
    from cleora_tpu.graph.stream import shard_row_bounds
    from cleora_tpu.parallel.shard import shard_disk_graph

    lines = [f"n{i % 37} n{(i * 5) % 37}" for i in range(300)]
    dg = build_graph_streaming(iter(lines), "complex::reflexive::n",
                               str(tmp_path / "g"))
    for p in (2, 4, 8):
        sd = shard_disk_graph(dg, "left", p)
        bounds = shard_row_bounds(dg.num_entities, p)
        assert bounds[-1] == dg.num_entities
        rps = sd.rows_per_shard
        assert all(bounds[k] == min(k * rps, dg.num_entities)
                   for k in range(p + 1))


def test_sharded_build_empty_trailing_shard(tmp_path):
    """More shards than the tail rows need: the last piece is empty (its
    row range is [n, n]) yet still merges cleanly."""
    from cleora_tpu.graph.stream import (
        build_graph_streaming_sharded,
        merge_disk_graph_shards,
        shard_row_bounds,
    )

    lines = [f"n{i % 20} n{(i * 3) % 20}" for i in range(200)]
    cols = "complex::reflexive::n"
    full = build_graph_streaming(iter(lines), cols, str(tmp_path / "full"))
    P = 8
    bounds = shard_row_bounds(full.num_entities, P)
    assert bounds[-1] == bounds[-2] == full.num_entities  # empty tail shard
    pieces = [
        build_graph_streaming_sharded(lines, cols, str(tmp_path / f"p{k}"),
                                      k, P, n_entities=full.num_entities)
        for k in range(P)
    ]
    assert pieces[-1].num_edges == 0
    merged = merge_disk_graph_shards([p.path for p in pieces],
                                     str(tmp_path / "m"))
    assert np.array_equal(np.asarray(merged.indices),
                          np.asarray(full.indices))
    assert np.array_equal(np.asarray(merged.indptr), np.asarray(full.indptr))


def test_empty_row_range_piece_direct(tmp_path):
    """host_piece_range can assign a host zero rows (small graph, many
    hosts); build_graph_streaming must accept the empty range and produce a
    valid, openable, mergeable empty piece."""
    from cleora_tpu.graph.stream import host_piece_range

    lines = [f"n{i % 20} n{(i * 3) % 20}" for i in range(100)]
    cols = "complex::reflexive::n"
    full = build_graph_streaming(iter(lines), cols, str(tmp_path / "full"))
    n = full.num_entities  # 20 entities, 8 devices over 4 hosts
    lo, hi = host_piece_range(n, 8, 2, 3)
    assert lo == hi == n
    piece = build_graph_streaming(iter(lines), cols, str(tmp_path / "p3"),
                                  row_range=(lo, hi))
    assert piece.num_edges == 0
    assert piece.num_entities == n  # global registry present
    re = DiskGraph(piece.path)  # reopens (zero-byte arrays)
    assert len(re.indices) == 0


def test_oversized_edge_fast_path_no_spin(tmp_path, monkeypatch):
    """A single hyperedge whose emission exceeds the whole pending buffer
    (fast path — no side over trim_n) must chunk through checked pushes,
    not spin forever retrying the slab planner."""
    monkeypatch.setenv("CLEORA_STREAM_RUN_PAIRS", "4096")
    # pend_cap = run_pairs + 1M slack ≈ 1.05M slots; a 750-token reflexive
    # clique emits 2·750² = 1.125M pairs — more than the WHOLE buffer, the
    # shape that spun forever pre-fix
    tokens = " ".join(f"t{i}" for i in range(750))
    lines = [tokens, "t1 t2"]
    cols = "complex::reflexive::n"
    ref = build_graph_native(lines, cols, hyperedge_trim_n=1000)
    dg = build_graph_streaming(iter(lines), cols, str(tmp_path / "g"),
                               hyperedge_trim_n=1000)
    _assert_matches(dg, ref)


def test_huge_trim_n_small_edge_overflow(tmp_path, monkeypatch):
    """Trim path with a huge trim_n: an untrimmed edge bigger than the
    buffer remainder previously overflowed the heap (SIGSEGV); it must now
    flush mid-edge and stay bitwise-correct."""
    monkeypatch.setenv("CLEORA_STREAM_RUN_PAIRS", "4096")
    big = " ".join(f"b{i}" for i in range(1100))  # > trim_n=1000: trim path
    small = " ".join(f"s{i}" for i in range(800))  # 800<=trim_n, 1.28M pairs
    lines = [big, small, "s1 s2"]
    cols = "complex::reflexive::n"
    ref = build_graph_native(lines, cols, hyperedge_trim_n=1000)
    dg = build_graph_streaming(iter(lines), cols, str(tmp_path / "g"),
                               hyperedge_trim_n=1000)
    _assert_matches(dg, ref)


def test_files_mode_rejects_bare_path_string(tmp_path):
    """A single path (not a list) would be iterated char-by-char as file
    names, warning per character and silently building an EMPTY graph."""
    p = tmp_path / "edges.tsv"
    p.write_text("a b\nb c\n")
    with pytest.raises(ValueError, match="LIST of paths"):
        build_graph_streaming(str(p), "complex::reflexive::node",
                              str(tmp_path / "g"), files=True)
