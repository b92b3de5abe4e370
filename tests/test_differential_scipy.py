"""External differential testing: random NLPs cross-checked against
scipy.optimize (SLSQP) — an independent implementation, playing the role
the CPU reference plays in the reference's GPU differential tests
(SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import NonlinearConstraint, minimize

from madnlp_tpu import Status, create_model, madnlp


def random_problem(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 8))
    m = int(rng.integers(1, n))
    P = rng.standard_normal((n, n))
    P = P @ P.T + n * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m) * 0.1
    # nonlinear constraints: quadratic rows  a_i·x + 0.5 x'C_i x
    Cs = [rng.standard_normal((n, n)) * 0.2 for _ in range(m)]
    Cs = [C + C.T for C in Cs]
    lcon = np.full(m, -0.5)
    ucon = np.full(m, 0.5)
    lvar = np.full(n, -2.0)
    uvar = np.full(n, 2.0)

    Pj, qj, Aj = jnp.asarray(P), jnp.asarray(q), jnp.asarray(A)
    Cj = jnp.asarray(np.stack(Cs))
    bj = jnp.asarray(b)

    def obj(x):
        return 0.5 * x @ (Pj @ x) + qj @ x

    def cons(x):
        quad = 0.5 * jnp.einsum("i,kij,j->k", x, Cj, x)
        return Aj @ x + quad + bj

    model = create_model(
        obj=obj, cons=cons, n=n, m=m, x0=np.zeros(n),
        lvar=lvar, uvar=uvar, lcon=lcon, ucon=ucon,
    )

    def np_obj(x):
        return 0.5 * x @ P @ x + q @ x

    def np_cons(x):
        quad = 0.5 * np.einsum("i,kij,j->k", x, np.stack(Cs), x)
        return A @ x + quad + b

    return model, np_obj, np_cons, (lvar, uvar, lcon, ucon)


@pytest.mark.parametrize("seed", range(12))
def test_against_slsqp(seed):
    model, np_obj, np_cons, (lvar, uvar, lcon, ucon) = random_problem(seed)
    stats = madnlp(model)
    assert stats.status in (
        Status.SOLVE_SUCCEEDED,
        Status.SOLVED_TO_ACCEPTABLE_LEVEL,
    ), stats

    res = minimize(
        np_obj,
        np.zeros(model.n),
        method="SLSQP",
        bounds=list(zip(lvar, uvar)),
        constraints=[NonlinearConstraint(np_cons, lcon, ucon)],
        options={"maxiter": 500, "ftol": 1e-12},
    )
    if not res.success:
        pytest.skip("SLSQP failed on this instance")
    # convex-ish instances: objectives must agree tightly
    assert stats.objective <= res.fun + 1e-5, (
        f"madnlp {stats.objective} worse than SLSQP {res.fun}"
    )
    # and feasibility holds
    c = np_cons(stats.solution)
    assert (c >= lcon - 1e-7).all() and (c <= ucon + 1e-7).all()
