"""End-to-end solver behavior tests — the analogue of the reference's
``test_madnlp`` behavior suite (lib/MadNLPTests/src/MadNLPTests.jl:112-456)
and ``test/madnlp_test.jl``."""

import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu import (
    MadNLPOptions,
    MadNLPSolver,
    Status,
    create_model,
    madnlp,
)
from madnlp_tpu.models.instances import dummy_qp, hs15
from madnlp_tpu.utils.options import InertiaCorrection, LinearSolver


def test_hs15_from_zero():
    stats = madnlp(hs15.build())
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert abs(stats.objective - hs15.SOLUTION_OBJ_FROM_ZERO) < 1e-5
    # local solution at bottom-left (quickstart.md:212-215)
    np.testing.assert_allclose(stats.solution, [-0.79212, -1.26243], atol=1e-4)
    # only the first constraint active
    assert abs(stats.multipliers[1]) < 1e-6


def test_hs15_from_ones():
    stats = madnlp(hs15.build(x0=(1.0, 1.0)))
    assert stats.status == Status.SOLVE_SUCCEEDED
    # deviation ~2.5e-5 comes from the 1e-8 bound relaxation scaled by the
    # active bound multiplier (~1750) — same behavior as the reference
    assert abs(stats.objective - hs15.SOLUTION_OBJ_FROM_ONES) < 1e-4
    np.testing.assert_allclose(stats.solution, [0.5, 2.0], atol=1e-6)


def test_dense_qp():
    stats = madnlp(dummy_qp.build(30, 8))
    assert stats.status == Status.SOLVE_SUCCEEDED
    # verify the KKT conditions independently with numpy
    assert stats.primal_feas < 1e-8
    assert stats.dual_feas < 1e-6


def test_qp_with_equalities():
    stats = madnlp(dummy_qp.build(30, 8, equality_cons=[1, 4]))
    assert stats.status == Status.SOLVE_SUCCEEDED
    A_eq_resid = np.abs(stats.constraints[[1, 4]])
    assert A_eq_resid.max() < 1e-8


def test_qp_with_fixed_variables():
    stats = madnlp(dummy_qp.build(30, 8, fixed_variables=[3, 7]))
    assert stats.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(stats.solution[[3, 7]], [1.0, 1.0], atol=1e-8)


def test_maximization():
    # max -(x-1)^2 with x in [-10, 10] -> x* = 1
    model = create_model(
        obj=lambda x: -((x[0] - 1.0) ** 2),
        n=1,
        x0=[5.0],
        lvar=[-10.0],
        uvar=[10.0],
        minimize=False,
    )
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(stats.solution, [1.0], atol=1e-6)
    np.testing.assert_allclose(stats.objective, 0.0, atol=1e-8)


def test_unconstrained_rosenbrock():
    model = create_model(
        obj=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2,
        n=2,
        x0=[-1.2, 1.0],
    )
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(stats.solution, [1.0, 1.0], atol=1e-6)


def test_infeasible_detection():
    # reference behavior test `infeasible` (MadNLPTests.jl:155+):
    # x >= 1 (bound), x <= -1 (constraint) -> infeasible
    model = create_model(
        obj=lambda x: (x[0] - 2.0) ** 2,
        n=1,
        x0=[0.0],
        cons=lambda x: x[0:1],
        m=1,
        lvar=[1.0],
        uvar=[np.inf],
        lcon=[-np.inf],
        ucon=[-1.0],
    )
    stats = madnlp(model)
    assert stats.status == Status.INFEASIBLE_PROBLEM_DETECTED


def test_unbounded_detection():
    # reference behavior test `unbounded`: max x^2 free -> diverging
    model = create_model(
        obj=lambda x: x[0] ** 2,
        n=1,
        x0=[1.0],
        minimize=False,
    )
    stats = madnlp(model)
    assert stats.status == Status.DIVERGING_ITERATES


def test_eval_counters():
    solver = MadNLPSolver(hs15.build())
    stats = solver.solve()
    c = stats.counters
    assert c["k"] == stats.iter
    assert c["obj_cnt"] >= stats.iter  # at least one trial eval per iteration
    assert c["factorization_cnt"] >= stats.iter
    assert c["grad_cnt"] >= stats.iter


@pytest.mark.parametrize(
    "solver", [LinearSolver.LDL, LinearSolver.EVD]
)
def test_solver_backends_agree(solver):
    stats = madnlp(dummy_qp.build(20, 5), linear_solver=solver)
    assert stats.status == Status.SOLVE_SUCCEEDED
    ref = madnlp(dummy_qp.build(20, 5))
    np.testing.assert_allclose(stats.solution, ref.solution, atol=1e-7)
    # differential testing discipline: identical iteration counts
    assert stats.iter == ref.iter


def test_inertia_free():
    stats = madnlp(
        hs15.build(), inertia_correction_method=InertiaCorrection.FREE
    )
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert abs(stats.objective - hs15.SOLUTION_OBJ_FROM_ZERO) < 1e-4


def test_inertia_ignore():
    stats = madnlp(
        dummy_qp.build(20, 5), inertia_correction_method=InertiaCorrection.IGNORE
    )
    assert stats.status == Status.SOLVE_SUCCEEDED


def test_jitted_solve_matches_hosted():
    solver1 = MadNLPSolver(hs15.build())
    s1 = solver1.solve()
    solver2 = MadNLPSolver(hs15.build())
    s2 = solver2.solve_jitted()
    assert s2.status == s1.status
    assert s2.iter == s1.iter
    np.testing.assert_allclose(s2.solution, s1.solution, atol=1e-10)


def test_scaling_invariance():
    # reference regression test: huge constants are scaled away
    # (MadNLPTests.jl:334-361)
    big = 1e6
    model = create_model(
        obj=lambda x: big * (x[0] - 1.0) ** 2 + big * x[1] ** 2,
        n=2,
        x0=[0.0, 0.0],
        cons=lambda x: big * (x[0] + x[1])[None],
        m=1,
        lcon=[big * 0.5],
        ucon=[big * 0.5],
    )
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    # solution of min (x-1)^2 + y^2 s.t. x + y = 0.5
    np.testing.assert_allclose(stats.solution, [0.75, -0.25], atol=1e-6)
