"""Capacity planner (cleora_tpu/plan.py): the report's verdicts must be
the SAME estimates the dispatch-time pre-checks apply — consistency with
ops/memory.py, ops/spmm_ell.py and algorithms._walk_table_mode is the
whole contract (no reference analog; the reference has no pre-flight
capacity signal at all)."""

import numpy as np
import pytest

import cleora_tpu as ct
from cleora_tpu.plan import _ell_slots, format_plan, plan_report


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    return ct.SparseMatrix.from_edge_arrays(
        rng.integers(0, 5000, 60000), rng.integers(0, 5000, 60000)
    )


def test_report_structure_and_fit(graph):
    rep = plan_report(graph, feature_dim=256, n_devices=8, walks=True)
    assert rep["graph"]["n"] == 5000
    assert rep["graph"]["nnz"] == graph.num_edges
    assert rep["layout"]["choice"].startswith("flat-1d")
    # 16 GiB default budget: this shape trivially fits at P=1 and P=8
    assert [r["devices"] for r in rep["embed"]] == [1, 8]
    assert all(r["fits"] and r["fits_bf16"] for r in rep["embed"])
    assert rep["embed_min_devices"] == 1
    wk = rep["walks"]
    assert wk["table_mode"] == "replicated"
    assert wk["counting_passes"] == 1
    # worst-case pairs: starts * 2*(w*L - w(w+1)/2), every degree > 0
    w, L = 5, 80
    assert wk["worst_case_pairs"] == 5000 * 10 * 2 * (w * L - w * (w + 1) // 2)
    assert wk["factorization"].startswith("device")
    assert rep["recommendations"] == []


def test_fit_consistency_with_runtime_check(graph):
    """'fits' here == check_device_fit does not raise there (same bytes)."""
    from cleora_tpu.ops.memory import estimate_embed_hbm_bytes

    rep = plan_report(graph, feature_dim=256, n_devices=1, hbm_gib=16.0)
    row = rep["embed"][0]
    need = estimate_embed_hbm_bytes(5000, 256, graph.num_edges, "float32")
    assert row["fits"] == (need <= 16 * (1 << 30))
    assert row["need_gib"] == round(need / (1 << 30), 2)


def test_tiny_budget_forces_sharding(graph):
    rep = plan_report(graph, feature_dim=256, n_devices=4, hbm_gib=0.01,
                      walks=True)
    assert not rep["embed"][-1]["fits"]
    assert rep["embed_min_devices"] > 4  # doubling search past the mesh
    assert rep["walks"]["table_mode"].startswith("host")
    assert rep["walks"]["factorization"].startswith("sharded")
    recs = " ".join(rep["recommendations"])
    assert "shard over" in recs and "auto-engages" in recs


def test_single_device_sharded_factorization_hint(graph):
    rep = plan_report(graph, feature_dim=256, n_devices=1, hbm_gib=0.5,
                      walks=True)
    assert "needs a mesh" in rep["walks"]["factorization"]


def test_bf16_recommendation():
    """A budget between the f32 and bf16 footprints recommends bfloat16."""
    rng = np.random.default_rng(1)
    g = ct.SparseMatrix.from_edge_arrays(
        rng.integers(0, 3000, 20000), rng.integers(0, 3000, 20000)
    )
    from cleora_tpu.ops.memory import estimate_embed_hbm_bytes

    f32 = estimate_embed_hbm_bytes(3000, 256, g.num_edges, "float32")
    bf16 = estimate_embed_hbm_bytes(3000, 256, g.num_edges, "bfloat16")
    assert bf16 < f32
    rep2 = plan_report(g, feature_dim=256, n_devices=1,
                       hbm_gib=((f32 + bf16) / 2) / (1 << 30))
    assert not rep2["embed"][0]["fits"] and rep2["embed"][0]["fits_bf16"]
    assert any("bfloat16" in r for r in rep2["recommendations"])


def test_ell_slots_matches_plan_ell():
    """The planner's slot budget must equal the layout the runtime builds
    (same _widths_for DP + hub split)."""
    from cleora_tpu.ops.spmm_ell import _K_MAX, plan_ell

    rng = np.random.default_rng(2)
    n = 800
    # zipf-ish skew incl. hub rows past _K_MAX
    deg = np.minimum((rng.zipf(1.3, n)).astype(np.int64), 4000)
    rows = np.repeat(np.arange(n, dtype=np.int32), deg)
    cols = rng.integers(0, n, rows.shape[0]).astype(np.int32)
    vals = np.ones(rows.shape[0], np.float32)
    plan = plan_ell(rows, cols, vals, n, d=64)
    assert plan is not None
    built = sum(int(np.asarray(c).shape[0]) * int(np.asarray(c).shape[1])
                for c, _ in plan.buckets)
    if plan.hub is not None:
        built += int(np.asarray(plan.hub[0]).shape[0]) * _K_MAX
    assert _ell_slots(deg) == built


def test_per_engine_batch_envelopes(graph):
    """The two engines budget different live sets: on a small graph the
    first-order engine's 4x-larger walk batch dominates, so a ~0.1 GiB
    budget rejects first-order tables while the second-order engine
    (smaller batches, bigger per-edge tables) still replicates — the
    planner must reproduce _walk_table_mode's per-engine envelope, not a
    single shared formula."""
    rep1 = plan_report(graph, n_devices=1, walks=True, hbm_gib=0.101,
                       second_order=False)
    rep2 = plan_report(graph, n_devices=1, walks=True, hbm_gib=0.101,
                       second_order=True)
    assert rep1["walks"]["table_mode"].startswith("host")
    assert rep2["walks"]["table_mode"] == "replicated"


def test_sibling_paths(graph):
    """The sibling section applies the runtime's own gates: dense fits
    this 5k graph at 16 GiB (6*n^2*4 = 0.6 GiB); a sub-dense budget
    switches NetMF/GraRep to the blocked driver with the runtime's
    auto block width."""
    from cleora_tpu.algorithms import _auto_block_rows, _dense_fits

    rep = plan_report(graph, feature_dim=64, n_devices=1, hbm_gib=16.0)
    assert rep["algorithms"]["prone/randne/hope"] == "device (single chip)"
    assert rep["algorithms"]["netmf/grarep"].startswith("dense device")
    assert _dense_fits(5000, limit=16 << 30)

    small = 0.3  # GiB: below the 0.9*limit dense gate for n=5000
    assert not _dense_fits(5000, limit=int(small * (1 << 30)))
    rep2 = plan_report(graph, feature_dim=64, n_devices=8, hbm_gib=small)
    b = _auto_block_rows(5000, 80, limit=int(small * (1 << 30)))
    assert rep2["algorithms"]["netmf/grarep"] == (
        f"blocked device (O(n*b) HBM, block_rows~{b}) "
        "with mesh-sharded panels"
    )


def test_bf16_dtype_plan(graph):
    """Planning with dtype='bfloat16' makes the primary estimate the
    bf16 one (same bytes as the need_bf16 column of an f32 plan)."""
    rep_f32 = plan_report(graph, feature_dim=256, n_devices=1)
    rep_bf = plan_report(graph, feature_dim=256, n_devices=1,
                         dtype="bfloat16")
    assert rep_bf["embed"][0]["need_gib"] == \
        rep_f32["embed"][0]["need_bf16_gib"]


def test_format_plan_renders(graph):
    txt = format_plan(plan_report(graph, n_devices=8, walks=True))
    for needle in ("Graph:", "HBM budget", "SpMM layout",
                   "Canonical embed", "Walk pipeline"):
        assert needle in txt


def test_plan_diskgraph_input(tmp_path):
    """plan_report reads degrees straight off a streamed build's memmap
    CSR (no materialization), and the CLI auto-detects the graph dir."""
    from cleora_tpu.cli import main as cli_main
    from cleora_tpu.graph.stream import build_graph_streaming

    rng = np.random.default_rng(4)
    lines = [f"n{a} n{b}" for a, b in
             zip(rng.integers(0, 80, 500), rng.integers(0, 80, 500))]
    dg = build_graph_streaming(lines, "complex::reflexive::n",
                               str(tmp_path / "g"))
    ref = ct.SparseMatrix.from_iterator(iter(lines),
                                        "complex::reflexive::n")
    rep = plan_report(dg, feature_dim=32, n_devices=2)
    rep_ref = plan_report(ref, feature_dim=32, n_devices=2)
    assert rep["graph"] == rep_ref["graph"]
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(["plan", "-i", str(tmp_path / "g"), "--dim", "32"])
    assert "SpMM layout" in buf.getvalue()


def test_cli_plan(tmp_path, capsys):
    from cleora_tpu.cli import main

    f = tmp_path / "edges.tsv"
    rng = np.random.default_rng(3)
    f.write_text("\n".join(
        f"a{rng.integers(0, 50)} a{rng.integers(0, 50)}"
        for _ in range(300)) + "\n")
    main(["plan", "-i", str(f), "--dim", "64", "--devices", "4",
          "--walks", "--hbm-gib", "16"])
    out = capsys.readouterr().out
    assert "SpMM layout" in out and "P=4" in out and "Walk pipeline" in out


def test_cli_plan_json(tmp_path, capsys):
    import json

    from cleora_tpu.cli import main

    f = tmp_path / "edges.tsv"
    f.write_text("a b\nb c\nc a\n")
    main(["plan", "-i", str(f), "--dim", "16", "--walks", "--json", "-"])
    rep = json.loads(capsys.readouterr().out)
    assert rep["graph"]["n"] == 3 and rep["walks"] is not None
    out_path = tmp_path / "plan.json"
    main(["plan", "-i", str(f), "--dim", "16", "--json", str(out_path)])
    assert "SpMM layout" in capsys.readouterr().out  # text still prints
    assert json.loads(out_path.read_text())["graph"]["n"] == 3
