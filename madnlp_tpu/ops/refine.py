"""Richardson iterative refinement over a KKT operator.

Functional port of the reference's ``RichardsonIterator``
(``/root/reference/src/LinearSolvers/backsolve.jl:27-76``): repeat
``x += K⁻¹(b - K x)`` until ``‖r‖ / (min(‖x‖, 1e6‖b‖) + ‖b‖) < tol`` or the
iteration cap is hit; success means the ratio beat ``acceptable_tol``.

Implemented as a ``lax.while_loop`` so it nests inside the jitted IPM step;
also the seam where mixed-precision refinement plugs in (factorize f32,
refine in f64) — the TPU answer to f64 emulation cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kkt.vec import KKTVec, norm_inf


def solve_refine(solve_fn, mul_fn, b: KKTVec, max_iter: int, tol: float,
                 acceptable_tol: float):
    """Returns ``(x, converged, iters)``."""
    norm_b = norm_inf(b)
    x0 = KKTVec(*(jnp.zeros_like(a) for a in b))

    def cond(carry):
        x, w, ir, ratio, prev = carry
        # Stagnation early-exit (madnlp_tpu addition): with a reduced-
        # precision factor the residual plateaus at ~cond·eps(f32) long
        # before `tol` (= tol^1.25 of the f64 path); once the ratio is
        # acceptable and improving by <4x per sweep, more sweeps are wasted
        # backsolves.  Exact-precision runs still behave like the reference
        # (they hit `tol` in 1-2 sweeps before stagnation can trigger).
        stalled = (ratio > 0.25 * prev) & (ratio < acceptable_tol)
        return (ir < max_iter) & (ratio >= tol) & ~stalled

    def body(carry):
        x, w, ir, ratio, _ = carry
        dx = solve_fn(w)
        x = x.axpy(1.0, dx)
        kx = mul_fn(x)
        w = KKTVec(*(bb - kk for bb, kk in zip(b, kx)))
        norm_w = norm_inf(w)
        norm_x = norm_inf(x)
        ratio_new = norm_w / (jnp.minimum(norm_x, 1e6 * norm_b) + norm_b)
        return x, w, ir + 1, ratio_new, ratio

    inf0 = jnp.asarray(jnp.inf, norm_b.dtype)
    init = (x0, b, jnp.zeros((), jnp.int32), inf0, inf0)
    x, w, ir, ratio, _ = jax.lax.while_loop(cond, body, init)
    converged = ratio < acceptable_tol
    # Inconsistent-singular guard (madnlp_tpu addition): the reference's
    # ratio is scale-invariant in ‖x‖, so a factorization of a singular K
    # returning a near-null-space blow-up (‖x‖ huge, residual never
    # reduced — e.g. a structurally rank-deficient Jacobian row that
    # unpivoted LDLᵀ cannot flag, unlike the reference's MUMPS) would be
    # accepted.  A genuine solve must at least reduce the residual.
    converged = converged & (norm_inf(w) <= 0.999 * norm_b)
    # b == 0 -> x = 0 is exact (reference skips the loop in that case).
    converged = converged | (norm_b == 0.0)
    return x, converged, ir


def solve_gmres(solve_fn, mul_fn, b: KKTVec, max_iter: int, tol: float,
                acceptable_tol: float):
    """Preconditioned GMRES refinement — analogue of ``KrylovIterator``
    (``lib/MadNLPKrylov/src/MadNLPKrylov.jl:14-100``): the KKT operator is
    the matvec, the current factorization the (right) preconditioner."""
    sizes = [a.shape[0] for a in b]

    def flat(v: KKTVec):
        return jnp.concatenate(list(v))

    def unflat(x):
        out, o = [], 0
        for s in sizes:
            out.append(x[o : o + s])
            o += s
        return KKTVec(*out)

    bf = flat(b)
    x, info = jax.scipy.sparse.linalg.gmres(
        lambda v: flat(mul_fn(unflat(v))),
        bf,
        M=lambda v: flat(solve_fn(unflat(v))),
        tol=tol,
        atol=0.0,
        maxiter=max_iter,
        restart=min(20, max(1, max_iter)),
        solve_method="batched",
    )
    xk = unflat(x)
    r = KKTVec(*(bb - kk for bb, kk in zip(b, mul_fn(xk))))
    norm_b = norm_inf(b)
    ratio = norm_inf(r) / (jnp.minimum(norm_inf(xk), 1e6 * norm_b) + norm_b)
    converged = (ratio < acceptable_tol) & (norm_inf(r) <= 0.999 * norm_b)
    converged = converged | (norm_b == 0.0)
    return xk, converged, jnp.asarray(max_iter, jnp.int32)
