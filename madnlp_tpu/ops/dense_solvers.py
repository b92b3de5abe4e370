"""Uniform functional interface over the dense factorization backends.

TPU-native equivalent of the reference's ``AbstractLinearSolver`` interface
(``/root/reference/src/LinearSolvers/linearsolvers.jl:13-110``):
``factorize! / solve_linear_system! / inertia / is_inertia``.  The backend is
a *static* configuration choice, so dispatch happens at trace time — each
jitted solver contains exactly one factorization code path.

Backends (reference: src/LinearSolvers/lapack_common.jl:47-109):

* ``LDL``       — blocked unpivoted LDLᵀ (ops/ldlt.py); inertia from pivots.
* ``CHOLESKY``  — XLA ``cholesky``; inertia = success ? (n,0,0) : (0,n,0)
                  (reference: lapack_common.jl:100-102).
* ``LU``        — XLA LU; no inertia (pair with inertia-free/ignore).
* ``EVD``       — XLA ``eigh``; exact inertia; most robust, most expensive.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..utils.options import LinearSolver
from . import ldlt as _ldlt


class DenseFactor:
    """Backend-specific factor payload.

    Registered as a pytree with ``kind``/``n`` as static aux data so factors
    can ride through ``lax.while_loop`` carries (the inertia-correction and
    SOC loops re-use the current factorization)."""

    __slots__ = ("kind", "a", "b", "n")

    def __init__(self, kind: str, a, b, n: int):
        self.kind = kind
        self.a = a
        self.b = b
        self.n = n


jax.tree_util.register_pytree_node(
    DenseFactor,
    lambda f: ((f.a, f.b), (f.kind, f.n)),
    lambda aux, children: DenseFactor(aux[0], children[0], children[1], aux[1]),
)


def zero_factor(solver: LinearSolver, n: int, dtype, block: int = 64) -> DenseFactor:
    """Structurally-correct zero factor (for pytree templates)."""
    if solver == LinearSolver.LDL:
        np_ = max(1, -(-n // block)) * block
        return DenseFactor("ldl", jnp.zeros((np_, np_), dtype), jnp.zeros((np_,), dtype), n)
    if solver == LinearSolver.CHOLESKY:
        return DenseFactor("cholesky", jnp.zeros((n, n), dtype), jnp.zeros((0,), dtype), n)
    if solver == LinearSolver.LU:
        return DenseFactor("lu", jnp.zeros((n, n), dtype), jnp.zeros((n,), jnp.int32), n)
    if solver == LinearSolver.EVD:
        return DenseFactor("evd", jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype), n)
    if solver == LinearSolver.QR:
        return DenseFactor("qr", jnp.zeros((n, n), dtype), jnp.zeros((n, n), dtype), n)
    raise ValueError(solver)


def factorize(K: jax.Array, solver: LinearSolver, block: int = 64) -> DenseFactor:
    n = K.shape[0]
    if solver == LinearSolver.LDL:
        f = _ldlt.ldlt_factorize(K, block=block)
        return DenseFactor("ldl", f.L, f.d, n)
    if solver == LinearSolver.CHOLESKY:
        L = jnp.linalg.cholesky(K)
        return DenseFactor("cholesky", L, jnp.zeros((0,), K.dtype), n)
    if solver == LinearSolver.LU:
        lu, piv = jax.scipy.linalg.lu_factor(K)
        return DenseFactor("lu", lu, piv, n)
    if solver == LinearSolver.EVD:
        w, V = jnp.linalg.eigh(K)
        return DenseFactor("evd", V, w, n)
    if solver == LinearSolver.QR:
        q, r = jnp.linalg.qr(K)
        return DenseFactor("qr", q, r, n)
    raise ValueError(f"unsupported dense solver {solver}")


def solve(factor: DenseFactor, rhs: jax.Array) -> jax.Array:
    """Backsolve; rhs is (n,) or (n, k)."""
    kind = factor.kind
    squeeze = rhs.ndim == 1
    b = rhs[:, None] if squeeze else rhs
    if kind == "ldl":
        x = _ldlt.ldlt_solve(_ldlt.LDLFactor(factor.a, factor.b, factor.n), b)
    elif kind == "cholesky":
        L = factor.a
        z = solve_triangular(L, b, lower=True)
        x = solve_triangular(L.T, z, lower=False)
    elif kind == "lu":
        x = jax.scipy.linalg.lu_solve((factor.a, factor.b), b)
    elif kind == "evd":
        V, w = factor.a, factor.b
        w_div = jnp.where(jnp.abs(w) <= _ldlt.ZERO_PIVOT_TOL, jnp.inf, w)
        x = V @ ((V.T @ b) / w_div[:, None])
    elif kind == "qr":
        q, r = factor.a, factor.b
        x = solve_triangular(r, q.T @ b, lower=False)
    else:
        raise ValueError(kind)
    return x[:, 0] if squeeze else x


def has_inertia(solver: LinearSolver) -> bool:
    return solver in (LinearSolver.LDL, LinearSolver.CHOLESKY, LinearSolver.EVD)


def inertia(factor: DenseFactor) -> Tuple[jax.Array, jax.Array, jax.Array]:
    kind = factor.kind
    n = factor.n
    if kind == "ldl":
        return _ldlt.ldlt_inertia(_ldlt.LDLFactor(factor.a, factor.b, n))
    if kind == "cholesky":
        ok = jnp.all(jnp.isfinite(factor.a))
        zero = jnp.int32(0)
        return (
            jnp.where(ok, n, 0),
            jnp.where(ok, 0, n),
            zero,
        )
    if kind == "evd":
        # Absolute tiny threshold, consistent with the LDLᵀ backend: IPM KKT
        # spectra legitimately span ~1e-8..1e8 near convergence, so a
        # relative eps*max|λ| cutoff misclassifies valid small eigenvalues.
        w = factor.b
        tol = _ldlt.ZERO_PIVOT_TOL
        pos = jnp.sum(w > tol)
        neg = jnp.sum(w < -tol)
        return pos, n - pos - neg, neg
    raise ValueError(f"solver kind {kind} does not expose inertia")
