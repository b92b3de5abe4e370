"""API-surface tests: warm start, user callback, timing helpers — mirrors
test/madnlp_test.jl:190-202 (warm start) and :286-303 (user callback)."""

import numpy as np

from madnlp_tpu import MadNLPSolver, Status, madnlp
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


def test_timing_api_schur():
    """timing_linear_solver must work for two-stage/Schur contexts too —
    their SchurFactor has no ``.d`` field (ADVICE r3 regression)."""
    from madnlp_tpu import KKTSystem
    from madnlp_tpu.models.instances import twostage

    model, ts = twostage.build(N=4, nv=4, nd=2, ms=2, n_eq=1)
    solver = MadNLPSolver(model, kkt_system=KKTSystem.SCHUR, schur_structure=ts)
    solver.solve()
    t = timing_linear_solver(solver, ntrials=2)
    assert t["t_build_factorize"] >= 0.0 and t["t_backsolve"] >= 0.0


def test_unknown_option_warns_and_ignores():
    """Reference behavior: unknown option keys warn and are ignored
    (src/IPM/options.jl:243-299; test/madnlp_test.jl:305-312)."""
    import warnings

    from madnlp_tpu.models.instances import hs15

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st = madnlp(hs15.build(), totally_bogus_option=1)
    assert any("totally_bogus_option" in str(x.message) for x in w)
    assert st.status == Status.SOLVE_SUCCEEDED


def test_string_enum_options():
    """Enum options accept their string names (reference parses strings to
    enums, options.jl:3-5)."""
    from madnlp_tpu.models.instances import hs15
    from madnlp_tpu.utils.options import BarrierUpdate, KKTSystem

    s = MadNLPSolver(
        hs15.build(), kkt_system="dense", barrier="monotone",
        hessian_approximation="exact",
    )
    assert s.opts.kkt_system == KKTSystem.DENSE
    assert s.opts.barrier == BarrierUpdate.MONOTONE
    assert s.solve().status == Status.SOLVE_SUCCEEDED
