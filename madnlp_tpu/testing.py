"""Public test harness — the analogue of the reference's shipped
``lib/MadNLPTests`` package (``lib/MadNLPTests/src/MadNLPTests.jl:16,24-110``):
contract checks users run against *their own* linear solvers, KKT systems,
and option combinations, plus the behavior suite of pathological models
with reference solutions.

Usage (e.g. in a downstream package's test suite)::

    import madnlp_tpu.testing as mt

    mt.test_linear_solver(LinearSolver.CHOLESKY)
    mt.test_kkt_system(kkt_system=KKTSystem.SPARSE_CONDENSED,
                       linear_solver=LinearSolver.BANDED)
    mt.run_behavior_suite(kkt_system=KKTSystem.DENSE)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .ipm.problem import Scaling, build_problem
from .ipm import kernels as _K
from .ipm.solver import MadNLPSolver, madnlp
from .kkt.vec import KKTVec, norm_inf
from .models.instances import dummy_qp, hs15, suite
from .utils.options import KKTSystem, LinearSolver, MadNLPOptions
from .utils.status import Status


def test_linear_solver(linear_solver: LinearSolver, dtype=jnp.float64,
                       rtol: float = 1e-8):
    """Contract check for a dense factorization backend: factorize/solve a
    fixed 2×2 SPD system and verify the solution and (if supported) the
    inertia — mirror of ``MadNLPTests.test_linear_solver``
    (lib/MadNLPTests/src/MadNLPTests.jl:24-51)."""
    from .ops import dense_solvers as ds

    if linear_solver in (LinearSolver.BLOCK_CHOLESKY, LinearSolver.HYKKT):
        # range-space solvers factorize the 2x2 saddle structure: use a
        # fixed quasidefinite [W Aᵀ; A -δ] system (split=2) instead
        A = jnp.asarray(
            [[1.0, 0.1, 1.0], [0.1, 2.0, -1.0], [1.0, -1.0, -1e-8]],
            dtype=dtype,
        )
        b = jnp.asarray([1.0, 3.0, 0.5], dtype=dtype)
        x_ref = np.linalg.solve(np.asarray(A, dtype=np.float64),
                                np.asarray(b, dtype=np.float64))
        factor = ds.factorize(A, linear_solver, split=2)
        x = ds.solve(factor, b)
        np.testing.assert_allclose(
            np.asarray(x), x_ref, rtol=max(rtol, 1e-6), atol=1e-6
        )
        pos, zero, neg = ds.inertia(factor)
        assert (int(pos), int(zero), int(neg)) == (2, 0, 1), (
            f"{linear_solver}: wrong inertia for quasidefinite system"
        )
        return True
    A = jnp.asarray([[1.0, 0.1], [0.1, 2.0]], dtype=dtype)
    b = jnp.asarray([1.0, 3.0], dtype=dtype)
    x_ref = np.linalg.solve(np.asarray(A, dtype=np.float64),
                            np.asarray(b, dtype=np.float64))
    factor = ds.factorize(A, linear_solver)
    x = ds.solve(factor, b)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=max(rtol, 1e-6))
    if ds.has_inertia(linear_solver):
        pos, zero, neg = ds.inertia(factor)
        assert (int(pos), int(zero), int(neg)) == (2, 0, 0), (
            f"{linear_solver}: wrong inertia for SPD system"
        )
    return True


def test_kkt_system(
    model=None,
    kkt_system: Optional[KKTSystem] = None,
    linear_solver: Optional[LinearSolver] = None,
    rtol: float = 1e-8,
    check_inertia: bool = True,
    **options,
):
    """KKT-interface contract check (``MadNLPTests.test_kkt_system``,
    lib/MadNLPTests/src/MadNLPTests.jl:53-110): evaluate derivatives at an
    interior point, ``build_and_factorize``, ``solve`` on an all-ones RHS,
    then verify the round trip ``mul(kkt, x) ≈ 1`` through the *unreduced*
    operator, plus inertia correctness under unit regularization.

    Works for any model/KKT/linear-solver combination accepted by
    :class:`MadNLPSolver`; pass your own ``model`` to exercise a custom
    callback implementation."""
    if model is None:
        # convex QP fixture (reference uses DenseDummyQP here,
        # lib/MadNLPTests/src/Instances/dummy_qp.jl) so the saddle inertia
        # (nw, 0, m) is guaranteed under unit regularization
        model = dummy_qp.build(20, 5)
    if kkt_system is not None:
        options["kkt_system"] = kkt_system
    if linear_solver is not None:
        options["linear_solver"] = linear_solver
    solver = MadNLPSolver(model, **options)
    prob, kkt = solver.prob, solver.kernel.kkt

    # interior point: midpoint of bounds where two-sided, else 1 inside
    xl, xu = prob.xl0.copy(), prob.xu0.copy()
    with np.errstate(invalid="ignore"):
        w0 = np.where(
            prob.lb_mask & prob.ub_mask, 0.5 * (xl + xu),
            np.where(prob.lb_mask, xl + 1.0,
                     np.where(prob.ub_mask, xu - 1.0, 0.3)),
        )
    scal = Scaling(jnp.ones(()), jnp.ones((prob.m,)))
    y = jnp.asarray(np.random.default_rng(0).standard_normal(prob.m))
    jac = prob.eval_jac(scal, jnp.asarray(w0))
    hess = prob.eval_lag_hess(scal, jnp.asarray(w0), y)
    dl, du_ = _K.slacks(
        jnp.asarray(w0), jnp.asarray(xl), jnp.asarray(xu),
        jnp.asarray(prob.lb_mask), jnp.asarray(prob.ub_mask),
    )
    zl = jnp.where(jnp.asarray(prob.lb_mask), 1.0, 0.0)
    zu = jnp.where(jnp.asarray(prob.ub_mask), 1.0, 0.0)
    reg = jnp.full((prob.nw,), 1.0)
    ctx = kkt.build_and_factorize(
        hess, jac, reg, jnp.zeros((prob.m,)), dl, du_, zl, zu
    )

    ones = KKTVec(
        xp=jnp.ones((prob.nw,)), y=jnp.ones((prob.m,)), zl=zl, zu=zu
    )
    x = kkt.solve(ctx, ones)
    back = kkt.mul(ctx, x)
    err = max(
        float(jnp.max(jnp.abs(back.xp - ones.xp))),
        float(jnp.max(jnp.abs(back.y - ones.y))) if prob.m else 0.0,
        float(jnp.max(jnp.abs(back.zl - ones.zl))),
        float(jnp.max(jnp.abs(back.zu - ones.zu))),
    )
    assert err < max(rtol, 10 * float(jnp.finfo(ctx_dtype(kkt, ctx)).eps)), (
        f"KKT round-trip error {err:.3e} for {type(kkt).__name__}"
    )
    if check_inertia and kkt.has_inertia():
        pos, zero, neg = kkt.inertia(ctx)
        assert bool(kkt.is_inertia_correct(pos, zero, neg)), (
            f"{type(kkt).__name__}: inertia "
            f"({int(pos)},{int(zero)},{int(neg)}) not correct under unit "
            "regularization (pass check_inertia=False for nonconvex fixtures)"
        )
    return True


def ctx_dtype(kkt, ctx):
    """Factorization dtype of a KKT context (first floating leaf)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(ctx):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float64


# behavior-suite registry: name -> (model factory, checker)
def _check_lootsma(stats):
    tol = np.sqrt(1e-8)
    assert stats.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(
        stats.solution[1:], suite.LOOTSMA_SOLUTION, atol=tol, rtol=tol
    )
    np.testing.assert_allclose(
        stats.multipliers, suite.LOOTSMA_MULTIPLIERS, atol=tol, rtol=tol
    )


def _check_eigmina(stats):
    assert stats.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(stats.objective, 1.0, atol=1e-6)


def _check_hs15(stats):
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert abs(stats.objective - hs15.SOLUTION_OBJ_FROM_ZERO) < 1e-4


def _check_infeasible(stats):
    assert stats.status == Status.INFEASIBLE_PROBLEM_DETECTED


def _check_unbounded(stats):
    assert stats.status == Status.DIVERGING_ITERATES


def _check_lp_issue75(stats):
    assert stats.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(stats.solution, suite.LP_ISSUE75_SOLUTION,
                               atol=1e-6)


def _check_bound_qp(stats):
    assert stats.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(stats.solution, [1.0, 1.0], atol=1e-6)


def _check_chain(stats):
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert abs(stats.objective - 5.0685) < 2e-2  # COPS reference optimum


def _check_elec(stats):
    # Thomson N=15: global minimum ~ 80.6702 (local minima nearby)
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert 80.0 < stats.objective < 82.0


BEHAVIOR_SUITE = {
    "hs15": (hs15.build, _check_hs15),
    "lootsma": (suite.lootsma, _check_lootsma),
    "eigmina": (suite.eigmina, _check_eigmina),
    "infeasible": (suite.infeasible, _check_infeasible),
    "unbounded": (suite.unbounded, _check_unbounded),
    "lp_issue75": (suite.lp_issue75, _check_lp_issue75),
    "bound_qp": (suite.bound_qp, _check_bound_qp),
    # COPS-family structural variety (collocation chain, many small
    # equalities); see models/instances/cops.py
    "cops_chain": (lambda: _cops().chain(nh=50), _check_chain),
    "cops_elec": (lambda: _cops().elec(np_=15, seed=0), _check_elec),
}


def _cops():
    from .models.instances import cops

    return cops


def run_behavior_suite(exclude=(), **options):
    """Run the pathological-model behavior suite under the given options —
    mirror of ``MadNLPTests.test_madnlp(name, optimizer, exclude)``
    (lib/MadNLPTests/src/MadNLPTests.jl:112-456).  Raises on the first
    mismatch; returns ``{name: ExecutionStats}`` on success."""
    options.setdefault("print_level", "ERROR")
    results = {}
    for name, (factory, check) in BEHAVIOR_SUITE.items():
        if name in exclude:
            continue
        stats = madnlp(factory(), **options)
        try:
            check(stats)
        except AssertionError as e:
            raise AssertionError(f"behavior suite '{name}' failed: {e}") from e
        results[name] = stats
    return results


__all__ = [
    "test_linear_solver", "test_kkt_system", "run_behavior_suite",
    "BEHAVIOR_SUITE", "dummy_qp", "hs15", "suite",
]
