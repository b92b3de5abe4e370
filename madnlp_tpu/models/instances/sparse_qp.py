"""Scalable banded sparse QP — a fixture for the sparse-callback path:
tridiagonal Hessian, banded Jacobian, analytic COO derivatives.

    min ½ Σ a_i x_i² + Σ b_i x_i x_{i+1} + qᵀx
    s.t. 0 <= x_i - x_{i+1} <= 1  (m rows),  0 <= x <= 1
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model import SparseNLPModel


def build(n=1000, m=None, n_eq=0, seed=0) -> SparseNLPModel:
    if m is None:
        m = n // 4
    assert m < n
    rng = np.random.default_rng(seed)
    a = rng.uniform(2.0, 4.0, n)          # diagonal (dominant -> convex)
    b = rng.uniform(-0.5, 0.5, n - 1)     # off-diagonal
    q = rng.standard_normal(n)

    aj, bj, qj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(q)

    def obj(x):
        return 0.5 * jnp.sum(aj * x**2) + jnp.sum(bj * x[:-1] * x[1:]) + qj @ x

    def grad(x):
        g = aj * x + qj
        g = g.at[:-1].add(bj * x[1:])
        g = g.at[1:].add(bj * x[:-1])
        return g

    def cons(x):
        return x[:m] - x[1 : m + 1]

    # Jacobian: rows i -> cols i (+1), i+1 (-1)
    jac_rows = np.repeat(np.arange(m), 2)
    jac_cols = np.stack([np.arange(m), np.arange(1, m + 1)], axis=1).reshape(-1)

    def jac_coords(x):
        return jnp.tile(jnp.array([1.0, -1.0]), m)

    # Hessian (lower triangle): diag + subdiagonal
    hess_rows = np.concatenate([np.arange(n), np.arange(1, n)])
    hess_cols = np.concatenate([np.arange(n), np.arange(n - 1)])

    def hess_coords(x, y, obj_weight):
        return jnp.concatenate([obj_weight * aj, obj_weight * bj])

    lcon = np.zeros(m)
    ucon = np.ones(m)
    ucon[:n_eq] = 0.0

    return SparseNLPModel(
        n=n,
        m=m,
        obj=obj,
        grad=grad,
        cons=cons,
        x0=np.full(n, 0.5),
        jac_rows=jac_rows,
        jac_cols=jac_cols,
        jac_coords=jac_coords,
        hess_rows=hess_rows,
        hess_cols=hess_cols,
        hess_coords=hess_coords,
        lvar=np.zeros(n),
        uvar=np.ones(n),
        lcon=lcon,
        ucon=ucon,
        name=f"banded_sparse_qp_n{n}",
    )
