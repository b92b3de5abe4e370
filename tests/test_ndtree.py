"""Multilevel nested-dissection LDLᵀ (ops/ndtree.py) — contract +
golden-rule tests.

Mirrors the reference's linear-solver contract (factorize/solve/inertia,
lib/MadNLPTests/src/MadNLPTests.jl:24-51) and the iteration-count golden
rule used throughout the suite (the multifrontal path must reproduce the
dense-LDL reference trajectory exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu import KKTSystem, LinearSolver, MadNLPSolver, Status
from madnlp_tpu.kkt.sparse import _sorted_scatter_map
from madnlp_tpu.models.instances import opf, sparse_qp
from madnlp_tpu.ops.ndtree import (
    NDStructure,
    nd_factorize,
    nd_inertia,
    nd_solve,
)


def _grid_laplacian(g):
    """2D grid Laplacian + 4I — the canonical nested-dissection win."""
    rows, cols = [], []
    for i in range(g):
        for j in range(g):
            v = i * g + j
            rows.append(v)
            cols.append(v)
            if i + 1 < g:
                rows.append((i + 1) * g + j)
                cols.append(v)
            if j + 1 < g:
                rows.append(i * g + j + 1)
                cols.append(v)
    rows, cols = np.asarray(rows), np.asarray(cols)
    vals = np.where(rows == cols, 8.0, -1.0)
    return rows, cols, vals


def _random_indef(N=180, seed=0):
    rng = np.random.default_rng(seed)
    ne = 3 * N
    er = rng.integers(0, N, ne)
    ec = rng.integers(0, N, ne)
    keep = er > ec
    er, ec = er[keep], ec[keep]
    rows = np.concatenate([np.arange(N), er])
    cols = np.concatenate([np.arange(N), ec])
    dv = np.where(np.arange(N) % 4 == 0, -3.0, 7.0) + rng.random(N)
    vals = np.concatenate([dv, 0.3 * rng.standard_normal(len(er))])
    return rows, cols, vals


def _dense_of(rows, cols, vals, N):
    K = np.zeros((N, N))
    np.add.at(K, (rows, cols), vals)
    off = rows != cols
    np.add.at(K, (cols[off], rows[off]), vals[off])
    return K


def _factor(struct, rows, cols, vals):
    fidx = struct.map(rows, cols)
    order, idx_sorted = _sorted_scatter_map(fidx)
    bufs = struct.assemble(
        jnp.asarray(idx_sorted), jnp.asarray(vals)[order], sorted_indices=True
    )
    return nd_factorize(struct, bufs)


@pytest.mark.parametrize("case", ["grid", "indef"])
@pytest.mark.parametrize("leaf", [24, 64])
def test_nd_solve_and_inertia(case, leaf):
    if case == "grid":
        rows, cols, vals = _grid_laplacian(14)
        N = 14 * 14
    else:
        rows, cols, vals = _random_indef()
        N = 180
    K = _dense_of(rows, cols, vals, N)
    struct = NDStructure(rows, cols, N, leaf_size=leaf, ldl_block=16)
    assert struct.L >= 1
    f = _factor(struct, rows, cols, vals)

    rng = np.random.default_rng(1)
    b = rng.standard_normal(N)
    x = np.asarray(nd_solve(struct, f, jnp.asarray(b)))
    assert np.linalg.norm(K @ x - b) / np.linalg.norm(b) < 1e-12

    B = rng.standard_normal((N, 4))
    X = np.asarray(nd_solve(struct, f, jnp.asarray(B)))
    assert np.linalg.norm(K @ X - B) / np.linalg.norm(B) < 1e-12

    ev = np.linalg.eigvalsh(K)
    pos, zero, neg = (int(v) for v in nd_inertia(struct, f))
    assert (pos, zero, neg) == (int((ev > 0).sum()), 0, int((ev < 0).sum()))


def test_nd_jittable():
    rows, cols, vals = _grid_laplacian(10)
    N = 100
    K = _dense_of(rows, cols, vals, N)
    struct = NDStructure(rows, cols, N, leaf_size=24, ldl_block=8)
    fidx = struct.map(rows, cols)
    order, idx_sorted = _sorted_scatter_map(fidx)

    @jax.jit
    def solve(v, b):
        bufs = struct.assemble(
            jnp.asarray(idx_sorted), v[order], sorted_indices=True
        )
        f = nd_factorize(struct, bufs)
        return nd_solve(struct, f, b)

    b = np.random.default_rng(2).standard_normal(N)
    x = np.asarray(solve(jnp.asarray(vals), jnp.asarray(b)))
    assert np.linalg.norm(K @ x - b) / np.linalg.norm(b) < 1e-12


@pytest.mark.parametrize(
    "model_fn",
    [
        lambda: sparse_qp.build(n=80, m=30, seed=1),
        lambda: opf.build_sparse(nb=30, seed=0),
    ],
)
def test_nd_golden_iteration_counts(model_fn):
    """MULTIFRONTAL must reproduce the dense-LDL reference trajectory."""
    ref = MadNLPSolver(
        model_fn(), kkt_system=KKTSystem.SPARSE, linear_solver=LinearSolver.LDL
    ).solve()
    mf = MadNLPSolver(
        model_fn(),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.MULTIFRONTAL,
        nd_leaf_size=48,
    ).solve()
    assert ref.status == mf.status == Status.SOLVE_SUCCEEDED
    assert ref.iter == mf.iter
    np.testing.assert_allclose(ref.solution, mf.solution, atol=1e-7)


def test_nd_f32_condensed_and_unreduced():
    model = opf.build_sparse(nb=30, seed=0)
    ref = MadNLPSolver(
        model, kkt_system=KKTSystem.SPARSE, linear_solver=LinearSolver.LDL
    ).solve()
    f32 = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.MULTIFRONTAL,
        dtype="float32",
        nd_leaf_size=48,
    ).solve()
    assert f32.status == Status.SOLVE_SUCCEEDED
    assert f32.iter == ref.iter
    unr = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SPARSE_UNREDUCED,
        linear_solver=LinearSolver.MULTIFRONTAL,
        nd_leaf_size=48,
    ).solve()
    assert unr.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(unr.solution, ref.solution, atol=1e-7)
    cnd = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SPARSE_CONDENSED,
        linear_solver=LinearSolver.MULTIFRONTAL,
        nd_leaf_size=48,
    ).solve()
    assert cnd.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(cnd.solution, ref.solution, atol=1e-5)


def test_condensed_duplicate_jacobian_diagonal_pairs():
    """Edge-local AD jacobians emit duplicate COO records; pairs of distinct
    records sharing a column land on the condensed diagonal and must be
    counted twice in the one-sided band/ND pair map (regression: the
    sparse-direct condensed assembly dropped one order and diverged on OPF
    at tol=1e-8 while dense CHOLESKY converged)."""
    model = opf.build_sparse(nb=30, seed=0)
    for lin in (LinearSolver.BANDED, LinearSolver.MULTIFRONTAL):
        st = MadNLPSolver(
            model, kkt_system=KKTSystem.SPARSE_CONDENSED, linear_solver=lin
        ).solve()
        assert st.status == Status.SOLVE_SUCCEEDED, lin
