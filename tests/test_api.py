"""API-surface tests: warm start, user callback, timing helpers — mirrors
test/madnlp_test.jl:190-202 (warm start) and :286-303 (user callback)."""

import numpy as np

from madnlp_tpu import MadNLPSolver, Status
from madnlp_tpu.models.instances import dummy_qp, hs15
from madnlp_tpu.utils.timing import timing_linear_solver, timing_madnlp


def test_warm_start_resolve():
    solver = MadNLPSolver(hs15.build(x0=(1.0, 1.0)))
    s1 = solver.solve()
    assert s1.status == Status.SOLVE_SUCCEEDED
    # re-solve! keeps duals; must converge again (fewer or equal iterations
    # is typical but not guaranteed -- just assert success + same optimum)
    s2 = solver.solve()
    assert s2.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(s2.solution, s1.solution, atol=1e-7)


def test_user_callback_abort():
    calls = []

    def cb(info):
        calls.append(info["iter"])
        return info["iter"] < 3

    stats = MadNLPSolver(dummy_qp.build(20, 5)).solve(intermediate_callback=cb)
    assert stats.status == Status.USER_REQUESTED_STOP
    assert max(calls) == 3


def test_user_callback_observes_progress():
    infos = []
    stats = MadNLPSolver(dummy_qp.build(20, 5)).solve(
        intermediate_callback=lambda i: (infos.append(i), True)[1]
    )
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert len(infos) == stats.iter + 1
    assert "inf_pr" in infos[0] and "mu" in infos[0]


def test_timing_api():
    solver = MadNLPSolver(dummy_qp.build(20, 5))
    solver.solve()
    t = timing_madnlp(solver, ntrials=3)
    for key in ("t_obj", "t_grad", "t_jac", "t_hess", "t_build_factorize",
                "t_backsolve", "t_ipm_step"):
        assert key in t and t[key] >= 0.0
