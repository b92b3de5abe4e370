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

from typing import Tuple

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


def factorize(
    K: jax.Array, solver: LinearSolver, block: int = 64,
    solve_mode: str = "trisolve",
) -> DenseFactor:
    """``solve_mode="inverse"`` additionally inverts the triangular factor
    at factorization time (one matrix triangular-solve — GEMM-shaped), so
    every subsequent backsolve is two mat-vecs on the MXU instead of two
    sequential triangular solves — the right trade on TPU where triangular
    solves are latency-bound and the IPM performs many backsolves per
    factorization (refinement × SOC × probing).  The extra inverse error
    (~cond(L)·eps) is absorbed by the f64 iterative refinement."""
    n = K.shape[0]
    if solver == LinearSolver.LDL:
        f = _ldlt.ldlt_factorize(K, block=block)
        if solve_mode == "inverse":
            Linv = solve_triangular(
                f.L, jnp.eye(f.L.shape[0], dtype=K.dtype), lower=True,
                unit_diagonal=True,
            )
            return DenseFactor("ldl_inv", Linv, f.d, n)
        return DenseFactor("ldl", f.L, f.d, n)
    if solver == LinearSolver.CHOLESKY:
        L = jnp.linalg.cholesky(K)
        if solve_mode == "inverse":
            Linv = solve_triangular(L, jnp.eye(n, dtype=K.dtype), lower=True)
            return DenseFactor("chol_inv", Linv, L, n)
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
    elif kind == "ldl_inv":
        Linv, d, n = factor.a, factor.b, factor.n
        np_ = Linv.shape[0]
        if np_ != n:
            b = jnp.concatenate([b, jnp.zeros((np_ - n, b.shape[1]), b.dtype)])
        z = Linv @ b
        d_div = jnp.where(jnp.abs(d) <= _ldlt.ZERO_PIVOT_TOL, jnp.inf, d)
        x = (Linv.T @ (z / d_div[:, None]))[:n]
    elif kind == "cholesky":
        L = factor.a
        z = solve_triangular(L, b, lower=True)
        x = solve_triangular(L.T, z, lower=False)
    elif kind == "chol_inv":
        Linv = factor.a
        x = Linv.T @ (Linv @ b)
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
    return solver in (
        LinearSolver.LDL,
        LinearSolver.CHOLESKY,
        LinearSolver.EVD,
        LinearSolver.BANDED,
        LinearSolver.BLOCK_ARROW,
        LinearSolver.MULTIFRONTAL,
    )


def inertia(factor: DenseFactor) -> Tuple[jax.Array, jax.Array, jax.Array]:
    kind = factor.kind
    n = factor.n
    if kind in ("ldl", "ldl_inv"):
        return _ldlt.ldlt_inertia(_ldlt.LDLFactor(factor.a, factor.b, n))
    if kind in ("cholesky", "chol_inv"):
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
