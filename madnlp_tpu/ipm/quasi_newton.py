"""Quasi-Newton Hessian approximations — jit-compatible re-design of
``/root/reference/src/quasi_newton.jl``.

* ``BFGS`` / ``DampedBFGS`` — dense direct updates (quasi_newton.jl:112-130,
  163-192; damping = Nocedal & Wright Procedure 18.2).
* ``CompactLBFGS`` — compact limited-memory representation
  ``B = σI − UUᵀ + VVᵀ`` (quasi_newton.jl:366-423) with the
  curvature-skip / double-skip-reset logic.  The reference grows its
  ``Sk/Yk`` buffers dynamically; here memory is a *fixed* (n, p) array pair
  with an active-column mask — identical math, static shapes (jit), and the
  σS'S / L D⁻¹L' / J⁻ᵀ algebra is p×p dense — MXU-trivial.

Deviation from the reference (documented): with the dense KKT systems used
on TPU, the L-BFGS matrix is *formed* as a dense n×n operator (σI − UUᵀ +
VVᵀ, two n×p GEMMs) and factorized directly instead of applying the
Sherman–Morrison–Woodbury correction around a sparse factorization
(src/IPM/factorization.jl:76-140) — same operator, same iterations; SMW
returns with the sparse KKT path where it pays off.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from ..utils.options import BFGSInitStrategy, QuasiNewtonOptions


class LowRankHessian(NamedTuple):
    """Compact L-BFGS operator ``B = diag + V Vᵀ − U Uᵀ`` kept in factored
    form for sparse KKT systems: the diagonal is assembled into the sparse
    matrix, the low-rank part is applied by Sherman–Morrison–Woodbury at
    solve time (reference: src/IPM/factorization.jl:76-140)."""

    diag: jax.Array   # (n,) σ (or Gilbert–Lemaréchal init) diagonal
    U: jax.Array      # (n, p)
    V: jax.Array      # (n, p)


def lowrank_zeros(n: int, p: int) -> LowRankHessian:
    return LowRankHessian(
        diag=jnp.zeros((n,)), U=jnp.zeros((n, p)), V=jnp.zeros((n, p))
    )


class QNState(NamedTuple):
    """Fixed-shape quasi-Newton memory (lives inside the solver State)."""

    last_x: jax.Array      # (n,)
    last_g: jax.Array      # (n,)
    last_jv: jax.Array     # (n,)  Jᵀy at last_x
    Sk: jax.Array          # (n, p)
    Yk: jax.Array          # (n, p)
    mem: jax.Array         # int32 current memory
    skipped: jax.Array     # int32 consecutive skipped updates
    instantiated: jax.Array  # bool (BFGS init-on-first-update flag)


def qn_zeros(n: int, p: int) -> QNState:
    return QNState(
        last_x=jnp.zeros((n,)),
        last_g=jnp.zeros((n,)),
        last_jv=jnp.zeros((n,)),
        Sk=jnp.zeros((n, p)),
        Yk=jnp.zeros((n, p)),
        mem=jnp.zeros((), jnp.int32),
        skipped=jnp.zeros((), jnp.int32),
        instantiated=jnp.asarray(False),
    )


def curvature(strategy: BFGSInitStrategy, sk, yk):
    """σ-initialization strategies (quasi_newton.jl:48-61)."""
    sy = jnp.dot(sk, yk)
    ss = jnp.dot(sk, sk)
    yy = jnp.dot(yk, yk)
    if strategy == BFGSInitStrategy.SCALAR1:
        return sy / ss
    if strategy == BFGSInitStrategy.SCALAR2:
        return yy / sy
    if strategy == BFGSInitStrategy.SCALAR3:
        return ((sy / ss) + (yy / sy)) / 2.0
    if strategy == BFGSInitStrategy.SCALAR4:
        return jnp.sqrt((sy / ss) * (yy / sy))
    return jnp.ones(())  # CONSTANT


def _gilbert_lemarechal_rho(g0, f0):
    eps = jnp.finfo(g0.dtype).eps
    norm_g0 = jnp.dot(g0, g0)
    return jnp.where(
        norm_g0 < jnp.sqrt(eps),
        1.0,
        jnp.where(jnp.abs(f0) < eps, 1.0 / norm_g0, jnp.abs(f0) / norm_g0),
    )


def init_hessian_dense(n: int, g0, f0, init_value: float = 1.0):
    """Gilbert–Lemaréchal initial estimate (quasi_newton.jl:194-206)."""
    return 2.0 * _gilbert_lemarechal_rho(g0, f0) * init_value * jnp.eye(n)


def init_hessian_lowrank(lr: LowRankHessian, g0, f0, init_value: float = 1.0):
    """Low-rank-form Gilbert–Lemaréchal init (same scalar, diag storage)."""
    rho0 = _gilbert_lemarechal_rho(g0, f0)
    return lr._replace(
        diag=jnp.full_like(lr.diag, 2.0 * rho0 * init_value),
        U=jnp.zeros_like(lr.U),
        V=jnp.zeros_like(lr.V),
    )


def bfgs_update(Bk, qn: QNState, sk, yk, damped: bool):
    """Dense (damped) BFGS update; returns (Bk', qn')."""
    yksk = jnp.dot(sk, yk)
    n = Bk.shape[0]

    def do_update(args):
        Bk, qn = args
        # lazily re-initialize B on the first successful update
        B0 = jnp.eye(n) * (yksk / jnp.dot(sk, sk))
        Bk0 = jnp.where(qn.instantiated, Bk, B0)
        bsk = Bk0 @ sk
        sBs = jnp.dot(sk, bsk)
        if damped:
            # Procedure 18.2 (quasi_newton.jl:176-191)
            theta = jnp.where(yksk < 0.2 * sBs, 0.8 * sBs / (sBs - yksk), 1.0)
            rk = theta * yk + (1.0 - theta) * bsk
            Bk1 = (
                Bk0
                - jnp.outer(bsk, bsk) / sBs
                + jnp.outer(rk, rk) / jnp.dot(rk, sk)
            )
        else:
            Bk1 = (
                Bk0
                - jnp.outer(bsk, bsk) / sBs
                + jnp.outer(yk, yk) / yksk
            )
        return Bk1, qn._replace(instantiated=jnp.asarray(True))

    if damped:
        return do_update((Bk, qn))
    # plain BFGS skips the update on negative curvature (quasi_newton.jl:113-116)
    return lax.cond(yksk < 1e-8, lambda a: a, do_update, (Bk, qn))


def lbfgs_update(Bk, qn: QNState, sk, yk, opts: QuasiNewtonOptions):
    """Compact L-BFGS update forming the dense operator (for dense KKT
    systems); returns (Bk', qn')."""
    n = Bk.shape[0]
    return _lbfgs_update_generic(
        Bk, qn, sk, yk, opts,
        lambda _, s, U, V: s * jnp.eye(n) - U @ U.T + V @ V.T,
    )


def lbfgs_update_compact(lr: LowRankHessian, qn: QNState, sk, yk,
                         opts: QuasiNewtonOptions):
    """Compact L-BFGS update kept in factored low-rank form (for sparse KKT
    systems + SMW solve); returns (LowRankHessian', qn')."""
    return _lbfgs_update_generic(
        lr, qn, sk, yk, opts,
        lambda lr, s, U, V: LowRankHessian(
            diag=jnp.full_like(lr.diag, s), U=U, V=V
        ),
    )


def _lbfgs_update_generic(Bk, qn: QNState, sk, yk, opts: QuasiNewtonOptions,
                          form):
    """Shared compact L-BFGS machinery (quasi_newton.jl:366-423 with
    fixed-size masked memory); ``form(hess, sigma, U, V)`` builds the
    output operator representation."""
    n, p = qn.Sk.shape
    eps = jnp.finfo(sk.dtype).eps
    norm_s = jnp.linalg.norm(sk)
    norm_y = jnp.linalg.norm(yk)
    sy = jnp.dot(sk, yk)
    skip = (
        (norm_s < 100 * eps)
        | (norm_y < 100 * eps)
        | (sy < jnp.sqrt(eps) * norm_s * norm_y)
    )

    def on_skip(args):
        Bk, qn = args
        skipped = qn.skipped + 1

        def reset(qn):
            return qn._replace(
                Sk=jnp.zeros_like(qn.Sk),
                Yk=jnp.zeros_like(qn.Yk),
                mem=jnp.zeros((), jnp.int32),
                skipped=jnp.zeros((), jnp.int32),
                last_jv=jnp.zeros_like(qn.last_jv),
            )

        qn = lax.cond(
            skipped >= 2, reset, lambda q: q._replace(skipped=skipped), qn
        )
        return Bk, qn

    def on_update(args):
        Bk, qn = args
        full = qn.mem >= p

        def insert(M, v):
            # history left-aligned, oldest → newest; when full, shift left
            shifted = jnp.roll(M, -1, axis=1).at[:, p - 1].set(v)
            appended = M.at[:, jnp.minimum(qn.mem, p - 1)].set(v)
            return jnp.where(full, shifted, appended)

        Sk = insert(qn.Sk, sk)
        Yk = insert(qn.Yk, yk)
        mem = jnp.minimum(qn.mem + 1, p)
        active = jnp.arange(p) < mem

        sigma = jnp.clip(
            curvature(opts.init_strategy, sk, yk), opts.sigma_min, opts.sigma_max
        )
        SY = Sk.T @ Yk                                   # (p, p)
        Dk = jnp.where(active, jnp.diag(SY), 1.0)
        mask2 = active[:, None] & active[None, :]
        Lk = jnp.where(mask2, jnp.tril(SY, k=-1), 0.0)   # strict lower
        delta = 1.0 / jnp.sqrt(Dk)
        DkLk = delta[:, None] * Lk.T                     # D^{-1/2} Lᵀ
        Mk = sigma * (Sk.T @ Sk) + DkLk.T @ DkLk
        Mk = Mk + jnp.diag(jnp.where(active, 0.0, 1.0))  # identity padding
        Jk = jnp.linalg.cholesky(Mk)
        V = Yk * delta[None, :]
        U = sigma * Sk + V @ DkLk
        U = solve_triangular(Jk, U.T, lower=True).T      # U Jk⁻ᵀ
        qn = qn._replace(Sk=Sk, Yk=Yk, mem=mem, skipped=jnp.zeros((), jnp.int32))
        return form(Bk, sigma, U, V), qn

    Bk, qn = lax.cond(skip, on_skip, on_update, (Bk, qn))
    return Bk, qn
