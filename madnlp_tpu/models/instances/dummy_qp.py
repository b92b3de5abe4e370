"""Random dense QP fixture — analogue of the reference's ``DenseDummyQP``
(``/root/reference/lib/MadNLPTests/src/Instances/dummy_qp.jl``):

    min 0.5 xᵀ P x + qᵀ x   s.t.  0 <= A x <= 1,  0 <= x <= 1

with P SPD, A banded (+1/-1 diagonals), optional fixed variables and
equality rows.  Deterministic via a fixed numpy seed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model import DenseNLPModel


def build(n=100, m=10, fixed_variables=(), equality_cons=(), seed=1) -> DenseNLPModel:
    assert m < n
    rng = np.random.default_rng(seed)
    q = rng.standard_normal(n)
    P = rng.standard_normal((n, n))
    P = P @ P.T + 100.0 * np.eye(n)

    xl = np.zeros(n)
    xu = np.ones(n)
    gl = np.zeros(m)
    gu = np.ones(m)
    gu[list(equality_cons)] = 0.0
    xl[list(fixed_variables)] = xu[list(fixed_variables)]

    A = np.zeros((m, n))
    for i in range(m):
        A[i, i] = 1.0
        A[i, i + 1] = -1.0

    Pj = jnp.asarray(P)
    qj = jnp.asarray(q)
    Aj = jnp.asarray(A)

    return DenseNLPModel(
        n=n,
        m=m,
        obj=lambda x: 0.5 * x @ (Pj @ x) + qj @ x,
        cons=lambda x: Aj @ x,
        grad=lambda x: Pj @ x + qj,
        jac=lambda x: Aj,
        lag_hess=lambda x, y, ow: ow * Pj,
        x0=np.zeros(n),
        lvar=xl,
        uvar=xu,
        lcon=gl,
        ucon=gu,
        name="dense_dummy_qp",
    )


def build_parametric(n=100, m=10, seed=1) -> DenseNLPModel:
    """Parametric variant: the linear objective term ``q`` is the instance
    parameter, enabling ``vmap``/sharded batches of perturbed instances
    (SIMD-abstraction-of-NLPs pattern)."""
    assert m < n
    rng = np.random.default_rng(seed)
    P = rng.standard_normal((n, n))
    P = P @ P.T + 100.0 * np.eye(n)
    A = np.zeros((m, n))
    for i in range(m):
        A[i, i] = 1.0
        A[i, i + 1] = -1.0
    Pj, Aj = jnp.asarray(P), jnp.asarray(A)

    return DenseNLPModel(
        n=n,
        m=m,
        obj=lambda x, q: 0.5 * x @ (Pj @ x) + q @ x,
        cons=lambda x, q: Aj @ x,
        grad=lambda x, q: Pj @ x + q,
        jac=lambda x, q: Aj,
        lag_hess=lambda x, y, ow, q: ow * Pj,
        x0=np.zeros(n),
        lvar=np.zeros(n),
        uvar=np.ones(n),
        lcon=np.zeros(m),
        ucon=np.ones(m),
        params=np.zeros(n),  # example parameter pytree
        name="dense_dummy_qp_parametric",
    )
