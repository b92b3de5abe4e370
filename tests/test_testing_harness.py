"""The shipped test harness (madnlp_tpu.testing) — analogue of the
reference's MadNLPTests package (lib/MadNLPTests/src/MadNLPTests.jl) —
must itself work across solver/KKT combinations."""

import pytest

import madnlp_tpu.testing as mt
from madnlp_tpu import KKTSystem, LinearSolver
from madnlp_tpu.models.instances import dummy_qp


@pytest.mark.parametrize(
    "solver",
    [LinearSolver.LDL, LinearSolver.CHOLESKY, LinearSolver.LU,
     LinearSolver.QR, LinearSolver.EVD, LinearSolver.BLOCK_CHOLESKY,
     LinearSolver.HYKKT],
)
def test_linear_solver_contract(solver):
    assert mt.test_linear_solver(solver)


@pytest.mark.parametrize(
    "kkt,lin",
    [
        (KKTSystem.DENSE, LinearSolver.LDL),
        (KKTSystem.DENSE, LinearSolver.EVD),
        (KKTSystem.SPARSE_UNREDUCED, LinearSolver.LDL),
    ],
)
def test_kkt_contract(kkt, lin):
    assert mt.test_kkt_system(kkt_system=kkt, linear_solver=lin)


def test_kkt_contract_custom_model():
    assert mt.test_kkt_system(model=dummy_qp.build(16, 4))


def test_behavior_suite_default():
    results = mt.run_behavior_suite(exclude=("eigmina",))  # eigmina is slow
    assert set(results) == {"hs15", "lootsma", "infeasible", "unbounded",
                            "lp_issue75", "bound_qp", "cops_chain",
                            "cops_elec"}
