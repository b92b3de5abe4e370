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

    Registered as a pytree with ``kind``/``n``/``meta`` as static aux data
    so factors can ride through ``lax.while_loop`` carries (the inertia-
    correction and SOC loops re-use the current factorization).  ``meta``
    holds static per-backend scalars (HyKKT CG controls)."""

    __slots__ = ("kind", "a", "b", "n", "meta")

    def __init__(self, kind: str, a, b, n: int, meta: tuple = ()):
        self.kind = kind
        self.a = a
        self.b = b
        self.n = n
        self.meta = meta


jax.tree_util.register_pytree_node(
    DenseFactor,
    lambda f: ((f.a, f.b), (f.kind, f.n, f.meta)),
    lambda aux, children: DenseFactor(
        aux[0], children[0], children[1], aux[1], aux[2]
    ),
)


def zero_factor(solver: LinearSolver, n: int, dtype, block: int = 64,
                split: int = None, hykkt_backend: str = "native",
                solve_mode: str = "trisolve", cg_tol: float = 1e-8,
                cg_maxiter: int = 200) -> DenseFactor:
    """Structurally-correct zero factor (for pytree templates).

    The kind suffix and ``meta`` MUST mirror :func:`factorize` for the
    same options: a template whose static pytree aux differs from the
    real factor fails with a structure mismatch the moment it is carried
    through a traced loop (ADVICE r1)."""
    inv = solve_mode == "inverse"
    if solver == LinearSolver.BLOCK_CHOLESKY:
        nw = _bchol_split(n, split)
        return DenseFactor(
            "bchol_inv" if inv else "bchol", jnp.zeros((nw, nw), dtype),
            jnp.zeros((n + 2, n - nw), dtype), n,
        )
    if solver == LinearSolver.HYKKT:
        nw = _bchol_split(n, split)
        meta = (float(cg_tol), int(cg_maxiter))
        if hykkt_backend == "ldl":
            np_ = max(1, -(-nw // block)) * block
            return DenseFactor(
                "hykkt_ldl_inv" if inv else "hykkt_ldl",
                jnp.zeros((np_, np_ + 1), dtype),
                jnp.zeros((nw + 4, n - nw), dtype), n, meta=meta,
            )
        return DenseFactor(
            "hykkt_inv" if inv else "hykkt", jnp.zeros((nw, nw), dtype),
            jnp.zeros((nw + 4, n - nw), dtype), n, meta=meta,
        )
    if solver == LinearSolver.LDL:
        np_ = max(1, -(-n // block)) * block
        return DenseFactor("ldl_inv" if inv else "ldl",
                           jnp.zeros((np_, np_), dtype),
                           jnp.zeros((np_,), dtype), n)
    if solver == LinearSolver.CHOLESKY:
        if inv:
            return DenseFactor("chol_inv", jnp.zeros((n, n), dtype),
                               jnp.zeros((n, n), dtype), n)
        return DenseFactor("cholesky", jnp.zeros((n, n), dtype), jnp.zeros((0,), dtype), n)
    if solver == LinearSolver.LU:
        return DenseFactor("lu", jnp.zeros((n, n), dtype), jnp.zeros((n,), jnp.int32), n)
    if solver == LinearSolver.EVD:
        return DenseFactor("evd", jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype), n)
    if solver == LinearSolver.QR:
        return DenseFactor("qr", jnp.zeros((n, n), dtype), jnp.zeros((n, n), dtype), n)
    raise ValueError(solver)


def _bchol_split(n: int, split) -> int:
    if split is None or not (0 < split < n):
        raise ValueError(
            "BLOCK_CHOLESKY factorizes the 2x2 augmented block structure and "
            "needs the primal/dual split (0 < split < n); it is only "
            "available through KKT systems that supply it (dense augmented)"
        )
    return int(split)


def _bchol_factorize(K, n, split, solve_mode):
    """Range-space block elimination of K = [W Aᵀ; A C] (C diagonal ≤ 0):

        W = L₁L₁ᵀ,  X = L₁⁻¹Aᵀ,  S = XᵀX − C = L₂L₂ᵀ

    All native XLA cholesky / triangular-solve / GEMM — no sequential
    scalar pivot loops (the TPU answer to LAPACK sytrf: cf. the reference's
    Cholesky-success-as-inertia mode, lapack_common.jl:100-102, applied
    blockwise so indefinite *saddle* systems are still covered).  A NaN
    factor (W ⊁ 0, or S singular) surfaces through :func:`inertia` and
    drives the IPM's δ_w / δ_c regularization ladder."""
    nw = _bchol_split(n, split)
    m = n - nw
    W = K[:nw, :nw]
    A = K[nw:, :nw]
    C = K[nw:, nw:]
    L1 = jnp.linalg.cholesky(W)
    X = solve_triangular(L1, A.T, lower=True)          # (nw, m)
    S = X.T @ X - C
    L2 = jnp.linalg.cholesky(S)

    # Rank-revealing pivot validity: an exactly-singular block can round to
    # a *finite* Cholesky whose offending pivot sits at the cancellation
    # noise floor ~ sqrt(eps)·‖row‖ (NaN only if the rounding fell
    # negative), so "finite" alone cannot be the inertia signal.
    rtol = 4.0 * jnp.sqrt(jnp.finfo(K.dtype).eps).astype(K.dtype)

    def pivot_ok(L):
        rn = jnp.sqrt(jnp.sum(L * L, axis=1))
        return jnp.diagonal(L) > rtol * rn             # False for NaN too

    l1_ok = jnp.all(pivot_ok(L1)) & jnp.all(jnp.isfinite(L1))
    l2_ok = pivot_ok(L2) & jnp.all(jnp.isfinite(L2))   # per-pivot
    flags = jnp.zeros((2, m), K.dtype)
    flags = flags.at[0].set(l2_ok.astype(K.dtype))
    flags = flags.at[1, 0].set(l1_ok.astype(K.dtype))
    if solve_mode == "inverse":
        L1i = solve_triangular(L1, jnp.eye(nw, dtype=K.dtype), lower=True)
        L2i = solve_triangular(L2, jnp.eye(m, dtype=K.dtype), lower=True)
        return DenseFactor(
            "bchol_inv", L1i, jnp.concatenate([X, L2i, flags]), n
        )
    return DenseFactor("bchol", L1, jnp.concatenate([X, L2, flags]), n)


def _hykkt_factorize(K, n, split, solve_mode, rr, gamma, cg_tol, cg_maxiter,
                     backend="native", block=64):
    """Golub–Greif γ-augmented factorization of K = [W Aᵀ; A C] (C diag ≤ 0)
    — the HyKKT method of the reference's GPU ecosystem (arXiv:2405.14236,
    BASELINE.md):

        K_γ = W + γ AᵀA   (regular mode; SPD ⟺ the KKT signature is
                           correct, so Cholesky success is a *sound*
                           inertia certificate even for indefinite W)
        K_c = W + Aᵀ(−C)⁻¹A   (``rr=True``: the robust-restoration system
                           has a strictly negative dual diagonal, so direct
                           elimination needs no γ and no CG)

    Solves (see :func:`_hykkt_solve`) run CG on the symmetrized dual Schur
    complement, whose conditioning → 1 as γ grows; under the solver's f64
    iterative refinement the whole thing acts as a preconditioner, so CG
    only needs a loose tolerance."""
    nw = _bchol_split(n, split)
    m = n - nw
    W = K[:nw, :nw]
    A = K[nw:, :nw]
    c = jnp.diagonal(K[nw:, nw:])                      # (m,) ≤ 0
    if rr:
        gamma_eff = jnp.zeros((), K.dtype)
        Kg = W + (A.T / (-c)[None, :]) @ A
    else:
        # keep 1 + γc > 0 (c = −δ_c is a uniform tiny regularization)
        cmax = jnp.max(-c)
        gamma_eff = jnp.where(
            cmax > 0, jnp.minimum(gamma, 0.5 / cmax), gamma
        ).astype(K.dtype)
        Kg = W + gamma_eff * (A.T @ A)
    if backend == "ldl":
        # blocked LDLᵀ instead of native cholesky: K_γ is SPD when the
        # inertia condition holds, so all-positive pivots are the same
        # certificate.  (Native XLA cholesky at this size faults the
        # TPU device inside large whole-solver programs — an observed
        # backend bug; the blocked kernel is the stable path there.)
        f = _ldlt.ldlt_factorize(Kg, block=block)
        ok = jnp.all(jnp.isfinite(f.d)) & jnp.all(f.d > 0)
        L = f.L
        kind = "hykkt_ldl"
        if solve_mode == "inverse":
            L = solve_triangular(
                L, jnp.eye(L.shape[0], dtype=K.dtype), lower=True,
                unit_diagonal=True,
            )
            kind += "_inv"
        a = jnp.concatenate([L, f.d[:, None]], axis=1)  # (np_, np_+1)
    else:
        L = jnp.linalg.cholesky(Kg)
        ok = jnp.all(jnp.isfinite(L))
        kind = "hykkt"
        if solve_mode == "inverse":
            L = solve_triangular(L, jnp.eye(nw, dtype=K.dtype), lower=True)
            kind += "_inv"
        a = L
    # one static payload kind for both modes: the regular and restoration
    # phases share the persisted context slot inside the jitted state
    # machine, so the mode is a *value* (flag row), not pytree aux
    rows = jnp.stack([
        c,
        jnp.full((m,), gamma_eff, K.dtype),
        jnp.full((m,), ok.astype(K.dtype)),
        jnp.full((m,), 1.0 if rr else 0.0, K.dtype),
    ])
    return DenseFactor(
        kind, a, jnp.concatenate([A.T, rows]), n,
        meta=(float(cg_tol), int(cg_maxiter)),
    )


def _hykkt_kg_solve(factor, B):
    """K_γ⁻¹ applied to (nw, k) through the stored factor."""
    if factor.kind.startswith("hykkt_ldl"):
        np_ = factor.a.shape[0]
        L, d = factor.a[:, :np_], factor.a[:, np_]
        nw = B.shape[0]
        if np_ != nw:
            B = jnp.concatenate(
                [B, jnp.zeros((np_ - nw, B.shape[1]), B.dtype)]
            )
        d_div = jnp.where(jnp.abs(d) <= _ldlt.ZERO_PIVOT_TOL, jnp.inf, d)
        if factor.kind.endswith("_inv"):
            Li = L
            x = Li.T @ ((Li @ B) / d_div[:, None])
        else:
            z = solve_triangular(L, B, lower=True, unit_diagonal=True)
            x = solve_triangular(
                L.T, z / d_div[:, None], lower=False, unit_diagonal=True
            )
        return x[:nw]
    if factor.kind.endswith("_inv"):
        Li = factor.a
        return Li.T @ (Li @ B)
    L = factor.a
    return solve_triangular(
        L.T, solve_triangular(L, B, lower=True), lower=False
    )


def _hykkt_solve(factor: DenseFactor, b):
    """Backsolve for the γ-augmented (CG) and condensed (direct) modes."""
    nw = factor.b.shape[0] - 4
    m = factor.n - nw
    fact_dtype = factor.b.dtype
    # The CG (and the direct RR elimination) run in f64 with the reduced-
    # precision factor as the inner K_γ⁻¹ application: the factor supplies
    # the contraction, f64 keeps the Schur-complement arithmetic (which
    # squares conditioning) from flooring the outer iterative refinement
    # at the f32 noise level.
    f64 = jnp.float64
    At = factor.b[:nw].astype(f64)                      # Aᵀ (nw, m)
    c = factor.b[nw].astype(f64)                        # (m,)
    is_rr = factor.b[nw + 3, 0] > 0.5
    B1, B2 = b[:nw].astype(f64), b[nw:].astype(f64)

    def kg(B):
        return _hykkt_kg_solve(factor, B.astype(fact_dtype)).astype(f64)

    def cond_solve(_):
        dinv = 1.0 / jnp.where(c < 0, -c, 1.0)
        dx = kg(B1 + At @ (dinv[:, None] * B2))
        dy = dinv[:, None] * (At.T @ dx - B2)
        return jnp.concatenate([dx, dy]).astype(b.dtype)

    def cg_solve(_):
        gamma = factor.b[nw + 1, 0].astype(f64)
        cg_tol, cg_maxiter = factor.meta
        scal = 1.0 + gamma * c                          # > 0 by construction
        dvec = jnp.sqrt(scal)[:, None]

        b1g = B1 + gamma * (At @ B2)
        z = kg(b1g)
        rhs_s = dvec * (At.T @ z - B2)                  # symmetrized rhs

        def S_op(v):
            w = kg(At @ (dvec * v))
            return dvec * (At.T @ w) - c[:, None] * v

        # multi-RHS CG; converges jointly, per-column step sizes.  The
        # K_γ⁻¹ inside the operator runs at the factorization precision,
        # so the reachable residual floor is ~eps(fact); clamp the target
        # there and exit on stagnation — without this the loop runs to
        # cg_maxiter every time once the floor is hit.
        tol_eff = jnp.maximum(cg_tol, 64.0 * jnp.finfo(fact_dtype).eps)
        rs0 = jnp.sum(rhs_s * rhs_s, axis=0)
        tol2 = (tol_eff * tol_eff) * jnp.maximum(rs0, jnp.finfo(f64).tiny)

        def cond(carry):
            y, r, p, rs, slow, it = carry
            active = jnp.any(rs > tol2)
            # exit on SUSTAINED stagnation only (3 consecutive slow
            # iterations): a single <2x iteration is normal when cond(S)
            # is moderately above ~9 (gamma clamped by 0.5/cmax during a
            # delta_c ladder, or f32) and bailing there returns a step far
            # from cg_tol, costing outer-refinement rejections (ADVICE r1)
            return (it < cg_maxiter) & active & (slow < 3)

        def body(carry):
            y, r, p, rs, slow, it = carry
            Ap = S_op(p)
            denom = jnp.sum(p * Ap, axis=0)
            alpha = jnp.where(
                denom > 0, rs / jnp.where(denom > 0, denom, 1.0), 0.0
            )
            y = y + alpha[None, :] * p
            r = r - alpha[None, :] * Ap
            rs_new = jnp.sum(r * r, axis=0)
            beta = jnp.where(rs > 0, rs_new / jnp.where(rs > 0, rs, 1.0), 0.0)
            p = r + beta[None, :] * p
            stalled = jnp.all(rs_new > 0.25 * rs)       # <2x residual/iter
            slow = jnp.where(stalled, slow + 1, 0)
            return y, r, p, rs_new, slow, it + 1

        y0 = jnp.zeros_like(rhs_s)
        y, _, _, _, _, _ = jax.lax.while_loop(
            cond, body,
            (y0, rhs_s, rhs_s, rs0, jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32)),
        )
        dy = y / dvec                                   # un-symmetrize ỹ = D·dy
        dx = kg(b1g - At @ (scal[:, None] * dy))
        return jnp.concatenate([dx, dy]).astype(b.dtype)

    return jax.lax.cond(is_rr, cond_solve, cg_solve, None)


def factorize(
    K: jax.Array, solver: LinearSolver, block: int = 64,
    solve_mode: str = "trisolve", split: int = None, rr: bool = False,
    gamma: float = 1e4, cg_tol: float = 1e-8, cg_maxiter: int = 200,
    hykkt_backend: str = "native", sharding=None,
) -> DenseFactor:
    """``solve_mode="inverse"`` additionally inverts the triangular factor
    at factorization time (one matrix triangular-solve — GEMM-shaped), so
    every subsequent backsolve is two mat-vecs on the MXU instead of two
    sequential triangular solves — the right trade on TPU where triangular
    solves are latency-bound and the IPM performs many backsolves per
    factorization (refinement × SOC × probing).  The extra inverse error
    (~cond(L)·eps) is absorbed by the f64 iterative refinement."""
    n = K.shape[0]
    if solver == LinearSolver.HYKKT:
        return _hykkt_factorize(
            K, n, split, solve_mode, rr, gamma, cg_tol, cg_maxiter,
            backend=hykkt_backend, block=block,
        )
    if solver == LinearSolver.BLOCK_CHOLESKY:
        return _bchol_factorize(K, n, split, solve_mode)
    if solver == LinearSolver.LDL:
        f = _ldlt.ldlt_factorize(K, block=block, sharding=sharding)
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
    if kind.startswith("hykkt"):
        x = _hykkt_solve(factor, b)
    elif kind in ("bchol", "bchol_inv"):
        nw = factor.a.shape[0]
        m = factor.n - nw
        X = factor.b[:nw]
        L2 = factor.b[nw : nw + m]
        b1, b2 = b[:nw], b[nw:]
        if kind == "bchol_inv":
            L1i = factor.a
            z1 = L1i @ b1
            y = L2.T @ (L2 @ (X.T @ z1 - b2))
            x1 = L1i.T @ (z1 - X @ y)
        else:
            L1 = factor.a
            z1 = solve_triangular(L1, b1, lower=True)
            w2 = solve_triangular(L2, X.T @ z1 - b2, lower=True)
            y = solve_triangular(L2.T, w2, lower=False)
            x1 = solve_triangular(L1.T, z1 - X @ y, lower=False)
        x = jnp.concatenate([x1, y])
    elif kind == "ldl":
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
        LinearSolver.BLOCK_CHOLESKY,
        LinearSolver.HYKKT,
        LinearSolver.EVD,
        LinearSolver.BANDED,
        LinearSolver.BLOCK_ARROW,
        LinearSolver.MULTIFRONTAL,
    )


def inertia(factor: DenseFactor) -> Tuple[jax.Array, jax.Array, jax.Array]:
    kind = factor.kind
    n = factor.n
    if kind.startswith("hykkt"):
        # Cholesky success on K_γ (resp. K_c) is equivalent to W ≻ 0 on
        # null(A) for sufficient γ, i.e. the exact IPM inertia condition
        # (Golub–Greif); failure reports wrong inertia → δ_w ladder.
        nw = factor.b.shape[0] - 4
        m = n - nw
        ok = factor.b[nw + 2, 0] > 0.5
        pos = jnp.where(ok, nw, 0)
        zero = jnp.where(ok, 0, n)
        neg = jnp.where(ok, m, 0)
        return pos, zero, neg
    if kind in ("bchol", "bchol_inv"):
        # Cholesky-success-as-inertia, blockwise (flags computed at
        # factorization time, see _bchol_factorize): valid W and Schur
        # factors ⇒ signature (nw, 0, m) by Haynsworth; W-block failure ⇒
        # wrong inertia (δ_w ladder); Schur pivot failures alone ⇒
        # rank-deficient Jacobian ⇒ reported as zeros (δ_c regularization).
        nw = factor.a.shape[0]
        m = n - nw
        l2_ok = factor.b[nw + m] > 0.5
        ok1 = factor.b[nw + m + 1, 0] > 0.5
        nz2 = jnp.sum(~l2_ok)
        pos = jnp.where(ok1, nw, 0)
        zero = jnp.where(ok1, nz2, n)
        neg = jnp.where(ok1, m - nz2, 0)
        return pos, zero, neg
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
