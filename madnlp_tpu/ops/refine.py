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
        x, w, ir, ratio = carry
        return (ir < max_iter) & (ratio >= tol)

    def body(carry):
        x, w, ir, _ = carry
        dx = solve_fn(w)
        x = x.axpy(1.0, dx)
        kx = mul_fn(x)
        w = KKTVec(*(bb - kk for bb, kk in zip(b, kx)))
        norm_w = norm_inf(w)
        norm_x = norm_inf(x)
        ratio = norm_w / (jnp.minimum(norm_x, 1e6 * norm_b) + norm_b)
        return x, w, ir + 1, ratio

    init = (x0, b, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, norm_b.dtype))
    x, w, ir, ratio = jax.lax.while_loop(cond, body, init)
    converged = ratio < acceptable_tol
    # b == 0 -> x = 0 is exact (reference skips the loop in that case).
    converged = converged | (norm_b == 0.0)
    return x, converged, ir
