"""Quasi-Newton tests — analogue of test/madnlp_quasi_newton.jl: each
approximation converges to the exact-Hessian objective, without ever
evaluating the Lagrangian Hessian."""

import numpy as np
import pytest

from madnlp_tpu import (
    HessianApproximation,
    MadNLPSolver,
    Status,
    madnlp,
)
from madnlp_tpu.models.instances import dummy_qp, hs15


@pytest.mark.parametrize(
    "approx",
    [
        HessianApproximation.BFGS,
        HessianApproximation.DAMPED_BFGS,
        HessianApproximation.COMPACT_LBFGS,
    ],
)
def test_qn_converges_to_exact_objective(approx):
    ref = madnlp(hs15.build(x0=(1.0, 1.0)))
    stats = madnlp(
        hs15.build(x0=(1.0, 1.0)),
        hessian_approximation=approx,
        max_iter=300,
    )
    assert stats.status in (
        Status.SOLVE_SUCCEEDED,
        Status.SOLVED_TO_ACCEPTABLE_LEVEL,
    ), stats
    assert abs(stats.objective - ref.objective) < 1e-5
    # Hessian never evaluated (madnlp_quasi_newton.jl asserts lag_hess_cnt==0)
    assert stats.counters["hess_cnt"] == 0


@pytest.mark.parametrize(
    "approx",
    [HessianApproximation.BFGS, HessianApproximation.COMPACT_LBFGS],
)
def test_qn_on_qp(approx):
    ref = madnlp(dummy_qp.build(20, 5))
    stats = madnlp(
        dummy_qp.build(20, 5), hessian_approximation=approx, max_iter=500
    )
    assert stats.status in (
        Status.SOLVE_SUCCEEDED,
        Status.SOLVED_TO_ACCEPTABLE_LEVEL,
    ), stats
    np.testing.assert_allclose(stats.solution, ref.solution, atol=1e-5)


def test_lbfgs_unconstrained_rosenbrock():
    from madnlp_tpu import create_model
    import jax.numpy as jnp

    model = create_model(
        obj=lambda x: jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2),
        n=10,
        x0=np.full(10, -1.2),
    )
    stats = madnlp(
        model,
        hessian_approximation=HessianApproximation.COMPACT_LBFGS,
        max_iter=1000,
    )
    assert stats.status in (
        Status.SOLVE_SUCCEEDED,
        Status.SOLVED_TO_ACCEPTABLE_LEVEL,
    ), stats
    np.testing.assert_allclose(stats.solution, np.ones(10), atol=1e-5)


def test_lbfgs_sparse_smw_matches_dense():
    """Compact L-BFGS over the SPARSE KKT (σ-diagonal assembled, low-rank by
    Sherman–Morrison–Woodbury at solve time, reference:
    src/IPM/factorization.jl:76-140) must reproduce the dense-KKT L-BFGS
    trajectory exactly."""
    from madnlp_tpu import KKTSystem
    from madnlp_tpu.models.instances import sparse_qp

    ref = madnlp(
        sparse_qp.build(n=60, m=15).to_dense(),
        kkt_system=KKTSystem.DENSE,
        hessian_approximation=HessianApproximation.COMPACT_LBFGS,
    )
    s = madnlp(
        sparse_qp.build(n=60, m=15),
        kkt_system=KKTSystem.SPARSE,
        hessian_approximation=HessianApproximation.COMPACT_LBFGS,
    )
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    assert s.counters["hess_cnt"] == 0
    np.testing.assert_allclose(s.objective, ref.objective, rtol=1e-8)
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-6)


def test_lbfgs_sparse_smw_banded():
    """SMW low-rank correction composes with the block-banded backend."""
    from madnlp_tpu import KKTSystem, LinearSolver
    from madnlp_tpu.models.instances import sparse_qp

    s = madnlp(
        sparse_qp.build(n=60, m=15),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BANDED,
        hessian_approximation=HessianApproximation.COMPACT_LBFGS,
    )
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.counters["hess_cnt"] == 0
