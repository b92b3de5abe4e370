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
