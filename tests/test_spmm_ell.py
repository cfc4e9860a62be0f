"""Sliced-ELL SpMM layout: plan_ell + spmm_ell + the EllPlan dispatch in
spmm_inner and the relabel wrappers in ops.loop.

The layout makes the output dense per row (gather → scale → reduce, no
scatter, no (nnz, D) intermediate) with the state in degree-relabeled row
space for the whole loop; reference semantics: spmm_kernel,
/root/reference/src/embedding.rs:52-86.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from cleora_tpu.ops import spmm_ell as se
from cleora_tpu.ops.spmm import pad_coo, spmm
from cleora_tpu.ops.spmm_ell import EllPlan, plan_ell, spmm_ell


def _random_coo(n_rows, nnz, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        rows = np.concatenate([
            rng.integers(0, n_rows, nnz // 2),
            rng.integers(0, max(2, n_rows // 50), nnz - nnz // 2),
        ])
    else:
        rows = rng.integers(0, n_rows, nnz)
    rows = np.sort(rows).astype(np.int32)
    cols = rng.integers(0, n_rows, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return rows, cols, vals


def _oracle(rows, cols, vals, x, n_rows):
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n_rows, x.shape[0]))
    return np.asarray(a @ x, dtype=np.float32)


def _ell_out(plan, x):
    """Run spmm_ell in relabeled space, return output in original space."""
    rel = spmm_ell(plan.device(), jnp.asarray(x)[jnp.asarray(plan.order)])
    return np.asarray(rel)[plan.rank]


@pytest.mark.parametrize("n_rows,nnz,skew", [
    (100, 1000, False), (97, 531, False), (257, 3000, True), (40, 3000, True),
])
def test_ell_matches_oracle(n_rows, nnz, skew):
    rows, cols, vals = _random_coo(n_rows, nnz, seed=n_rows, skew=skew)
    x = np.random.default_rng(1).standard_normal((n_rows, 16)).astype(np.float32)
    plan = plan_ell(rows, cols, vals, n_rows, d=16)
    assert plan is not None
    # hub rows sum in a different (split) order → slightly looser atol
    np.testing.assert_allclose(_ell_out(plan, x),
                               _oracle(rows, cols, vals, x, n_rows),
                               rtol=2e-5, atol=1e-4)


def test_ell_hub_rows_split():
    """Rows above _K_MAX edges become virtual rows + a sorted combine."""
    n_rows, nnz = 64, 4000
    rows, cols, vals = _random_coo(n_rows, nnz, seed=5, skew=True)
    plan = plan_ell(rows, cols, vals, n_rows, d=8)
    assert plan is not None and plan.hub is not None
    x = np.random.default_rng(2).standard_normal((n_rows, 8)).astype(np.float32)
    np.testing.assert_allclose(_ell_out(plan, x),
                               _oracle(rows, cols, vals, x, n_rows),
                               rtol=2e-5, atol=2e-5)


def test_ell_empty_rows_zero():
    """Degree-0 rows produce exact zeros (leading n_zero block)."""
    n_rows = 50
    rows = np.sort(np.random.default_rng(3).integers(20, 40, 200)).astype(np.int32)
    cols = np.random.default_rng(4).integers(0, n_rows, 200).astype(np.int32)
    vals = np.ones(200, dtype=np.float32)
    plan = plan_ell(rows, cols, vals, n_rows, d=8)
    assert plan.n_zero >= 30
    x = np.random.default_rng(5).standard_normal((n_rows, 8)).astype(np.float32)
    out = _ell_out(plan, x)
    empty = np.setdiff1d(np.arange(n_rows), rows)
    assert (out[empty] == 0).all()
    np.testing.assert_allclose(out, _oracle(rows, cols, vals, x, n_rows),
                               rtol=2e-5, atol=2e-5)


def test_ell_unroll_formulation(monkeypatch):
    monkeypatch.setattr(se, "FORMULATION", "unroll")
    rows, cols, vals = _random_coo(80, 800, seed=7)
    x = np.random.default_rng(6).standard_normal((80, 8)).astype(np.float32)
    plan = plan_ell(rows, cols, vals, 80, d=8)
    np.testing.assert_allclose(_ell_out(plan, x),
                               _oracle(rows, cols, vals, x, 80),
                               rtol=2e-5, atol=2e-5)


def test_ell_waste_bound_declines():
    """A layout whose padding would exceed max_waste returns None."""
    # one row of degree 33 (pads to 40) + many degree-1 rows → fine;
    # force decline with an artificial max_waste below 1
    rows, cols, vals = _random_coo(60, 600, seed=9)
    assert plan_ell(rows, cols, vals, 60, d=8, max_waste=0.5) is None


def test_ell_bf16_storage():
    rows, cols, vals = _random_coo(64, 512, seed=11)
    x = np.random.default_rng(7).standard_normal((64, 8)).astype(np.float32)
    plan = plan_ell(rows, cols, vals, 64, d=8).device()
    rel = spmm_ell(plan, jnp.asarray(x).astype(jnp.bfloat16)[plan.order])
    assert rel.dtype == jnp.float32  # accumulation promoted
    out = np.asarray(rel, dtype=np.float32)[np.asarray(plan.rank)]
    np.testing.assert_allclose(out, _oracle(rows, cols, vals, x, 64),
                               rtol=0.05, atol=0.05)


def test_spmm_inner_dispatch():
    """spmm() accepts an EllPlan (x already relabeled by the caller)."""
    rows, cols, vals = _random_coo(90, 900, seed=13)
    x = np.random.default_rng(8).standard_normal((90, 8)).astype(np.float32)
    plan = plan_ell(rows, cols, vals, 90, d=8).device()
    out_rel = spmm(plan, (), (), jnp.asarray(x)[plan.order], n_rows=90)
    out = np.asarray(out_rel)[np.asarray(plan.rank)]
    np.testing.assert_allclose(out, _oracle(rows, cols, vals, x, 90),
                               rtol=2e-5, atol=2e-5)


def test_embed_loop_accepts_ell():
    """The fused loops permute once at entry/exit; parity with flat 1-D."""
    from cleora_tpu.ops.loop import (
        embed_loop,
        embed_loop_convergence,
        embed_step,
    )

    rng = np.random.default_rng(15)
    n_rows, nnz = 150, 3000
    rows = np.sort(rng.integers(0, n_rows, nnz)).astype(np.int32)
    cols = rng.integers(0, n_rows, nnz).astype(np.int32)
    deg = np.bincount(rows, minlength=n_rows).astype(np.float64)
    vals = (1.0 / np.maximum(deg, 1.0))[rows].astype(np.float32)
    x0 = rng.standard_normal((n_rows, 8)).astype(np.float32)

    plan = plan_ell(rows, cols, vals, n_rows, d=8).device()
    flat = pad_coo(rows, cols, vals, n_rows)
    out_e = np.asarray(embed_loop(
        plan, (), (), jnp.asarray(x0),
        n_rows=n_rows, num_iterations=4, normalization="l2", do_whiten=True,
    ))
    out_f = np.asarray(embed_loop(
        *(jnp.asarray(a) for a in flat), jnp.asarray(x0),
        n_rows=n_rows, num_iterations=4, normalization="l2", do_whiten=True,
    ))
    np.testing.assert_allclose(out_e @ out_e.T, out_f @ out_f.T, atol=1e-3)

    ce, ie = embed_loop_convergence(
        plan, (), (), jnp.asarray(x0), n_rows=n_rows, max_iterations=10,
        convergence_threshold=1e-3,
    )
    cf, if_ = embed_loop_convergence(
        *(jnp.asarray(a) for a in flat), jnp.asarray(x0), n_rows=n_rows,
        max_iterations=10, convergence_threshold=1e-3,
    )
    assert int(ie) == int(if_)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(cf),
                               rtol=2e-4, atol=2e-4)

    se_out = np.asarray(embed_step(plan, (), (), jnp.asarray(x0), n_rows=n_rows))
    sf_out = np.asarray(embed_step(*(jnp.asarray(a) for a in flat),
                                   jnp.asarray(x0), n_rows=n_rows))
    np.testing.assert_allclose(se_out, sf_out, rtol=2e-5, atol=2e-5)


def test_ell_plan_shapes_and_slots():
    rows, cols, vals = _random_coo(500, 5000, seed=17)
    plan = plan_ell(rows, cols, vals, 500, d=16)
    # every edge is represented exactly once
    total = sum(int((v != 0).sum()) for _, v in plan.buckets)
    if plan.hub is not None:
        total += int((plan.hub[1] != 0).sum())
    nonzero_vals = int((vals != 0).sum())
    assert total == nonzero_vals
    assert plan.slots >= nonzero_vals
    # order/rank are inverse permutations
    assert (plan.order[plan.rank] == np.arange(500)).all()


def test_widths_dp_optimal_vs_bruteforce():
    """_widths_for is an exact slot-minimizing partition: compare against a
    brute-force search over all contiguous partitions on small histograms."""
    from itertools import combinations

    from cleora_tpu.ops.spmm_ell import _widths_for

    rng = np.random.default_rng(5)
    for _ in range(20):
        n_deg = rng.integers(3, 9)
        degs = np.sort(rng.choice(np.arange(1, 30), size=n_deg,
                                  replace=False))
        counts = rng.integers(1, 1000, size=n_deg)
        degrees = np.repeat(degs, counts)
        max_b = int(rng.integers(1, n_deg))

        def slots_of(widths):
            total, lo = 0, 0
            for w in widths:
                m = (degrees > lo) & (degrees <= w)
                total += int(m.sum()) * w
                lo = w
            assert lo >= degs[-1]
            return total

        best = None
        for b in range(1, max_b + 1):
            for cut in combinations(range(n_deg - 1), b - 1):
                widths = [int(degs[i]) for i in cut] + [int(degs[-1])]
                s = slots_of(widths)
                best = s if best is None else min(best, s)
        got = _widths_for(degrees, max_buckets=max_b)
        assert slots_of(got) == best, (degs, counts, max_b, got)


def test_widths_dp_few_degrees_exact():
    from cleora_tpu.ops.spmm_ell import _widths_for

    assert _widths_for(np.array([3, 3, 7, 7, 7])) == [3, 7]
    assert _widths_for(np.array([], dtype=np.int64)) == []
    assert _widths_for(np.zeros(5, dtype=np.int64)) == []
