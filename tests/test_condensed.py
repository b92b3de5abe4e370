"""Condensed-KKT golden rule (reference: test/madnlp_dense.jl:8-53): the
condensed formulation must match the reduced-augmented reference *exactly in
iteration count* and to tight tolerance in the solution — both solve the
same Newton system by different algebra."""

import numpy as np
import pytest

from madnlp_tpu import KKTSystem, LinearSolver, MadNLPSolver, Status, madnlp
from madnlp_tpu.models.instances import dummy_qp, hs15


def solve_with(model_fn, kkt, **kw):
    return madnlp(model_fn(), kkt_system=kkt, **kw)


@pytest.mark.parametrize(
    "model_fn",
    [
        hs15.build,
        lambda: dummy_qp.build(25, 6),
        lambda: dummy_qp.build(25, 6, equality_cons=[0, 3]),
        lambda: dummy_qp.build(25, 6, fixed_variables=[1, 9]),
    ],
)
def test_condensed_matches_dense(model_fn):
    ref = solve_with(model_fn, KKTSystem.DENSE)
    cond = solve_with(model_fn, KKTSystem.DENSE_CONDENSED)
    assert ref.status == Status.SOLVE_SUCCEEDED
    assert cond.status == Status.SOLVE_SUCCEEDED
    assert cond.iter == ref.iter, "golden rule: identical iteration counts"
    np.testing.assert_allclose(cond.solution, ref.solution, rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(cond.multipliers, ref.multipliers, rtol=1e-6, atol=1e-6)


def test_condensed_uses_cholesky_when_no_equalities():
    solver = MadNLPSolver(hs15.build(), kkt_system=KKTSystem.DENSE_CONDENSED)
    assert solver.opts.linear_solver == LinearSolver.CHOLESKY
    stats = solver.solve()
    assert stats.status == Status.SOLVE_SUCCEEDED


def test_condensed_uses_ldl_with_equalities():
    solver = MadNLPSolver(
        dummy_qp.build(20, 5, equality_cons=[2]),
        kkt_system=KKTSystem.DENSE_CONDENSED,
    )
    assert solver.opts.linear_solver == LinearSolver.LDL
    stats = solver.solve()
    assert stats.status == Status.SOLVE_SUCCEEDED


def test_lifted_kkt_path():
    """SPARSE_CONDENSED preset = Lifted-KKT: equalities relaxed, all rows get
    slacks, pure Cholesky (cuda.jl:5-22 analogue)."""
    solver = MadNLPSolver(
        dummy_qp.build(20, 5, equality_cons=[1, 3]),
        kkt_system=KKTSystem.SPARSE_CONDENSED,
        tol=1e-6,  # relaxed tolerance, matching the reference GPU preset
    )
    assert solver.prob.n_eq == 0  # equalities relaxed into inequalities
    assert solver.opts.linear_solver == LinearSolver.CHOLESKY
    stats = solver.solve()
    assert stats.status == Status.SOLVE_SUCCEEDED
    # equality rows satisfied within the relaxation tolerance
    assert np.abs(stats.constraints[[1, 3]]).max() < 1e-5
