"""Front ends (models/frontends.py) — scipy-vocabulary ingestion (the MOI
analogue) and host-callback wrapper models (SparseWrapperModel analogue,
reference: src/Callbacks/wrappers.jl)."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import Bounds, LinearConstraint, NonlinearConstraint

from madnlp_tpu import (
    HessianApproximation,
    Status,
    from_scipy,
    host_model,
    madnlp,
)
from madnlp_tpu.utils.options import KKTSystem


def test_from_scipy_nonlinear_constraint():
    # HS15 in scipy vocabulary
    model = from_scipy(
        fun=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
        x0=np.zeros(2),
        bounds=Bounds(lb=[-np.inf, -np.inf], ub=[0.5, np.inf]),
        constraints=[
            NonlinearConstraint(
                lambda x: jnp.array([x[0] * x[1], x[0] + x[1] ** 2]),
                lb=[1.0, 0.0], ub=[np.inf, np.inf],
            )
        ],
    )
    st = madnlp(model)
    assert st.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(st.objective, 360.379767, rtol=1e-6)


def test_from_scipy_dict_and_linear():
    model = from_scipy(
        fun=lambda x: jnp.sum((x - 1.0) ** 2),
        x0=np.zeros(3),
        constraints=[
            {"type": "eq", "fun": lambda x: x[0] + x[1] + x[2] - 1.0},
            LinearConstraint(np.array([[1.0, -1.0, 0.0]]), lb=-1.0, ub=np.inf),
        ],
    )
    st = madnlp(model)
    assert st.status == Status.SOLVE_SUCCEEDED
    # KKT: x0 = x1 (from symmetry+inequality inactive), sum = 1
    np.testing.assert_allclose(np.sum(st.solution), 1.0, atol=1e-8)

    from scipy.optimize import minimize

    ref = minimize(
        lambda x: np.sum((x - 1.0) ** 2), np.zeros(3), method="SLSQP",
        constraints=[
            {"type": "eq", "fun": lambda x: x[0] + x[1] + x[2] - 1.0},
            {"type": "ineq", "fun": lambda x: x[0] - x[1] + 1.0},
        ],
    )
    np.testing.assert_allclose(st.solution, ref.x, atol=1e-6)


def test_host_model_opaque_numpy():
    """Opaque NumPy callbacks (not JAX-traceable) through pure_callback."""
    P = np.diag([1.0, 2.0, 3.0])

    def obj(x):
        x = np.asarray(x)
        return 0.5 * x @ P @ x - np.sum(x)  # pure numpy

    def grad(x):
        return P @ np.asarray(x) - 1.0

    def cons(x):
        return np.array([np.sum(np.asarray(x))])

    def jac(x):
        return np.ones((1, 3))

    def lag_hess(x, y, ow):
        return np.asarray(ow) * P

    model = host_model(
        obj, np.zeros(3), grad, m=1, cons=cons, jac=jac, lag_hess=lag_hess,
        lcon=[1.0], ucon=[1.0],
    )
    st = madnlp(model)
    assert st.status == Status.SOLVE_SUCCEEDED
    # analytic: minimize 1/2 x'Px - 1'x s.t. 1'x = 1
    lam = (1.0 - np.sum(np.linalg.solve(P, np.ones(3)))) / np.sum(
        np.linalg.solve(P, np.ones(3)) * 0 + np.linalg.solve(P, np.ones(3)) / 1
    )
    x_ref = np.linalg.solve(P, 1.0 + lam * np.ones(3))
    np.testing.assert_allclose(st.solution, x_ref, atol=1e-7)


def test_host_model_lbfgs_no_hessian():
    """Host model without a Hessian callback pairs with compact L-BFGS."""

    def obj(x):
        x = np.asarray(x)
        return float(np.sum((x - 2.0) ** 2))

    def grad(x):
        return 2.0 * (np.asarray(x) - 2.0)

    model = host_model(obj, np.zeros(4), grad, uvar=np.full(4, 1.5))
    st = madnlp(
        model, hessian_approximation=HessianApproximation.COMPACT_LBFGS
    )
    assert st.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(st.solution, np.full(4, 1.5), atol=1e-7)
