"""Blocked dense LDLᵀ factorization with inertia — TPU-native replacement for
LAPACK ``sytrf`` (Bunch–Kaufman) used by the reference's ``LapackCPUSolver``
(``/root/reference/src/LinearSolvers/lapack.jl``) and for MUMPS' sparse LDLᵀ
inertia (``src/LinearSolvers/mumps.jl:248-250``).

Design notes (why no pivoting):

* The IPM always calls this inside an inertia-correction ladder
  (reference: src/IPM/solver.jl:611-670): if the factorization is inaccurate
  or the inertia is wrong, the system is re-regularized with growing δ_w and
  re-factorized.  Unpivoted LDLᵀ + iterative refinement + the δ ladder is
  the accelerator-native strategy (same reasoning that led MadNLP's GPU port
  to condensed systems instead of porting ma57's pivoting).
* Near-zero pivots are *skipped* (their column update is suppressed) and
  recorded, so they surface as zero inertia rather than poisoning the factor
  with Inf/NaN.

The factorization is right-looking and blocked: the O(N³) work is in
``panel @ panelᵀ`` GEMMs that XLA maps onto the MXU.  Block loop is unrolled
at trace time (shapes are static).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class LDLFactor(NamedTuple):
    L: jax.Array      # (Np, Np) unit lower triangular (padded)
    d: jax.Array      # (Np,) pivot values (padded entries = 1)
    n: int            # logical dimension (static)


# Absolute threshold below which a pivot is declared zero.  Kept tiny and
# absolute on purpose: near-singularity is caught by the refinement/δ-ladder
# failure path, not by aggressive pivot classification (see module docstring).
ZERO_PIVOT_TOL = 1e-30


def _ldlt_unblocked(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """LDLᵀ of a small (b, b) full symmetric block via fori_loop."""
    b = A.shape[0]
    idx = jnp.arange(b)

    def body(j, carry):
        A, L, d = carry
        dj = A[j, j]
        dj_div = jnp.where(jnp.abs(dj) <= ZERO_PIVOT_TOL, jnp.inf, dj)
        lj = jnp.where(idx > j, A[:, j] / dj_div, 0.0)
        A = A - dj * jnp.outer(lj, lj)
        L = L.at[:, j].set(lj)
        d = d.at[j].set(dj)
        return A, L, d

    L0 = jnp.zeros_like(A)
    d0 = jnp.zeros((b,), dtype=A.dtype)
    _, L, d = jax.lax.fori_loop(0, b, body, (A, L0, d0))
    return L + jnp.eye(b, dtype=A.dtype), d


def ldlt_factorize(A: jax.Array, block: int = 64,
                   sharding=None) -> LDLFactor:
    """Factorize symmetric ``A = L D Lᵀ`` (full matrix input, no pivoting).

    Right-looking and blocked, but *rolled*: one ``lax.fori_loop`` over
    block-columns with masked full-width GEMM updates.  Compared to a
    trace-time-unrolled loop this compiles in O(1) program size (the
    unrolled variant took tens of minutes through the remote TPU compiler
    at N≈6000) and keeps every O(N³) operation MXU-shaped: the trailing
    update is an (N, b) × (b, N) GEMM per step with rows masked instead of
    sliced, trading ≈3× redundant FLOPs — the cheap currency on TPU — for
    static shapes and a short program.

    ``sharding``: optional ``NamedSharding`` (e.g. ``P("kkt", None)`` —
    rows over a mesh axis) for SINGLE-PROBLEM tensor parallelism of one
    large KKT factorization.  The distributed algorithm is the GSPMD
    recipe, not hand-written collectives: the carry (trailing matrix and
    factor) is constrained to the mesh, so each device executes the rows
    of the (N, b)×(b, N) trailing GEMM it owns, and XLA inserts the
    per-panel collectives (the b-wide panel all-gather — the ScaLAPACK
    broadcast — and the small b×b diagonal-block gather) automatically.
    The reference has no analogue (one device owns the whole KKT,
    SURVEY.md §2.5 'tensor parallel: none')."""
    n = A.shape[0]
    nb = max(1, -(-n // block))
    np_ = nb * block
    if np_ != n:
        # Pad with an identity tail: contributes +`pad` positive pivots,
        # removed again in `ldlt_inertia`.
        pad = np_ - n
        A = jnp.block(
            [
                [A, jnp.zeros((n, pad), A.dtype)],
                [jnp.zeros((pad, n), A.dtype), jnp.eye(pad, dtype=A.dtype)],
            ]
        )

    eye_b = jnp.eye(block, dtype=A.dtype)
    rows = jnp.arange(np_)

    def _shard(x):
        if sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, sharding)

    A = _shard(A)

    def body(k, carry):
        Awork, L, d = carry
        Awork, L = _shard(Awork), _shard(L)
        kb = k * block
        Akk = jax.lax.dynamic_slice(Awork, (kb, kb), (block, block))
        Lkk, dk = _ldlt_unblocked(Akk)
        # unit-lower inverse of the diagonal block (static small solve)
        invLkk = solve_triangular(Lkk, eye_b, lower=True, unit_diagonal=True)
        dk_div = jnp.where(jnp.abs(dk) <= ZERO_PIVOT_TOL, jnp.inf, dk)

        Acol = jax.lax.dynamic_slice(Awork, (0, kb), (np_, block))  # (N, b)
        X = Acol @ invLkk.T
        below = rows >= kb + block
        Lcol = jnp.where(below[:, None], X / dk_div[None, :], 0.0)
        Xm = jnp.where(below[:, None], X, 0.0)
        # trailing update (full-width masked GEMM — MXU)
        Awork = Awork - Lcol @ Xm.T
        # store the block column of L (diag block + sub-panel)
        Lsave = Lcol + jax.lax.dynamic_update_slice(
            jnp.zeros((np_, block), A.dtype), Lkk, (kb, 0)
        )
        L = jax.lax.dynamic_update_slice(L, Lsave, (0, kb))
        d = jax.lax.dynamic_update_slice(d, dk, (kb,))
        return Awork, L, d

    L0 = _shard(jnp.zeros((np_, np_), dtype=A.dtype))
    d0 = jnp.zeros((np_,), dtype=A.dtype)
    _, L, d = jax.lax.fori_loop(0, nb, body, (A, L0, d0))
    return LDLFactor(L=L, d=d, n=n)


def ldlt_solve(factor: LDLFactor, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` given ``A = L D Lᵀ``. ``b``: (n,) or (n, k)."""
    L, d, n = factor
    np_ = L.shape[0]
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    if np_ != n:
        b = jnp.concatenate(
            [b, jnp.zeros((np_ - n, b.shape[1]), b.dtype)], axis=0
        )
    z = solve_triangular(L, b, lower=True, unit_diagonal=True)
    d_div = jnp.where(jnp.abs(d) <= ZERO_PIVOT_TOL, jnp.inf, d)
    w = z / d_div[:, None]
    x = solve_triangular(L.T, w, lower=False, unit_diagonal=True)
    x = x[:n]
    return x[:, 0] if squeeze else x


def ldlt_inertia(factor: LDLFactor) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Inertia (num_pos, num_zero, num_neg) from the pivot signs.

    Non-finite pivots (overflowed factorization) count as zeros so the
    caller's `is_inertia_correct` check fails and triggers regularization.
    """
    L, d, n = factor
    np_ = L.shape[0]
    finite = jnp.isfinite(d)
    pos = jnp.sum((d > ZERO_PIVOT_TOL) & finite) - (np_ - n)
    neg = jnp.sum((d < -ZERO_PIVOT_TOL) & finite)
    zero = n - pos - neg
    return pos, zero, neg
