"""Sparse-callback path: scatter-assembled KKT systems must match the dense
reference *exactly in iteration count* (the reference's sparse-vs-dense
golden rule, test/madnlp_dense.jl:8-53)."""

import numpy as np
import pytest

from madnlp_tpu import KKTSystem, MadNLPSolver, Status, madnlp
from madnlp_tpu.kkt.sparse import SparseCondensedKKT, SparseKKT
from madnlp_tpu.models.instances import hs15, sparse_qp


def test_sparse_hs15_matches_dense():
    ref = madnlp(hs15.build(), kkt_system=KKTSystem.DENSE)
    s = madnlp(hs15.build_sparse(), kkt_system=KKTSystem.SPARSE)
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-8)


def test_sparse_uses_sparse_kkt():
    solver = MadNLPSolver(hs15.build_sparse())
    assert isinstance(solver.kernel.kkt, SparseKKT)
    assert solver.prob.is_sparse


def test_sparse_banded_qp():
    model = sparse_qp.build(n=200, m=50)
    ref = madnlp(model.to_dense(), kkt_system=KKTSystem.DENSE)
    s = madnlp(sparse_qp.build(n=200, m=50), kkt_system=KKTSystem.SPARSE)
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-7)


def test_sparse_qp_with_equalities():
    s = madnlp(sparse_qp.build(n=100, m=25, n_eq=5), kkt_system=KKTSystem.SPARSE)
    assert s.status == Status.SOLVE_SUCCEEDED
    assert np.abs(s.constraints[:5]).max() < 1e-8


def test_sparse_condensed_lifted():
    """Lifted-KKT with pair-map JᵀDJ assembly (all rows relaxed to
    inequalities, pure Cholesky on the n×n condensed matrix)."""
    ref = madnlp(sparse_qp.build(n=150, m=40, n_eq=5), kkt_system=KKTSystem.SPARSE)
    solver = MadNLPSolver(
        sparse_qp.build(n=150, m=40, n_eq=5),
        kkt_system=KKTSystem.SPARSE_CONDENSED,
        tol=1e-6,
    )
    assert isinstance(solver.kernel.kkt, SparseCondensedKKT)
    s = solver.solve()
    assert s.status == Status.SOLVE_SUCCEEDED
    # lifted equality relaxation at tol=1e-6 -> sqrt(tol)-scale deviation
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-3)
    assert np.abs(s.constraints[:5]).max() < 1e-6


def test_sparse_opf_derivatives_match_dense_ad():
    """Edge-local AD sparse derivatives == dense AD to machine precision."""
    import jax.numpy as jnp
    from madnlp_tpu.models.instances import opf

    dm = opf.build(nb=24, seed=5)
    sm = opf.build_sparse(nb=24, seed=5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(dm.x0 + 0.05 * rng.standard_normal(dm.n))
    y = jnp.asarray(rng.standard_normal(dm.m))
    assert float(jnp.max(jnp.abs(dm.cons(x) - sm.cons(x)))) < 1e-12
    assert float(jnp.max(jnp.abs(dm.jac(x) - sm.jac_dense(x)))) < 1e-12
    assert float(
        jnp.max(jnp.abs(dm.lag_hess(x, y, 1.3) - sm.lag_hess_dense(x, y, 1.3)))
    ) < 1e-12


def test_sparse_opf_solves_identically():
    from madnlp_tpu.models.instances import opf

    ref = madnlp(opf.build(nb=40, seed=2))
    s = madnlp(opf.build_sparse(nb=40, seed=2), kkt_system=KKTSystem.SPARSE)
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-10)


def test_sparse_fixed_variables():
    # fix x[3] via equal bounds; MakeParameter masking on sparse entries
    model = sparse_qp.build(n=50, m=10)
    model.lvar[3] = model.uvar[3] = 0.7
    s = madnlp(model, kkt_system=KKTSystem.SPARSE)
    assert s.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(s.solution[3], 0.7, atol=1e-9)
