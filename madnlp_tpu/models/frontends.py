"""Model-ingestion front ends — the analogue of the reference's MOI/JuMP
layer and CPU↔device wrapper models
(``/root/reference/ext/MadNLPMOI/MOI_wrapper.jl:1376-1561``,
``/root/reference/src/Callbacks/wrappers.jl:3-221``).

* :func:`from_scipy` — ingest a ``scipy.optimize.minimize``-style problem
  (callable + ``Bounds`` + ``LinearConstraint``/``NonlinearConstraint`` /
  dict constraints) into a :class:`DenseNLPModel` with JAX AD derivatives —
  the Python ecosystem's lingua franca playing MOI's role.
* :func:`host_model` — a model whose callbacks run **on the host CPU**
  (arbitrary Python/NumPy code, no JAX-traceability required) while the
  solver state stays on device, staged through ``jax.pure_callback`` — the
  TPU reading of ``SparseWrapperModel``/``DenseWrapperModel`` (solver on
  device, evaluations wherever the model lives).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .model import DenseNLPModel


def from_scipy(fun, x0, bounds=None, constraints=(), name="scipy_model"):
    """Build a :class:`DenseNLPModel` from ``scipy.optimize`` vocabulary.

    ``fun`` and constraint functions must be JAX-traceable (use
    :func:`host_model` for opaque NumPy code).  Accepted constraints:
    ``scipy.optimize.NonlinearConstraint``, ``LinearConstraint``, or the
    ``minimize``-style dicts ``{"type": "eq"|"ineq", "fun": g}`` (with the
    scipy convention ``g(x) = 0`` / ``g(x) >= 0``)."""
    x0 = np.asarray(x0, dtype=np.float64)
    n = x0.shape[0]

    lvar = uvar = None
    if bounds is not None:
        if hasattr(bounds, "lb"):  # scipy.optimize.Bounds
            lvar = np.broadcast_to(np.asarray(bounds.lb, float), (n,))
            uvar = np.broadcast_to(np.asarray(bounds.ub, float), (n,))
        else:  # sequence of (lo, hi)
            arr = np.asarray(
                [(-np.inf if lo is None else lo, np.inf if hi is None else hi)
                 for lo, hi in bounds], dtype=float,
            )
            lvar, uvar = arr[:, 0], arr[:, 1]

    if isinstance(constraints, dict) or hasattr(constraints, "fun"):
        constraints = (constraints,)

    funs, lcs, ucs = [], [], []
    for c in constraints:
        if isinstance(c, dict):
            g = c["fun"]
            width = np.atleast_1d(np.asarray(g(x0))).shape[0]
            funs.append(lambda x, g=g: jnp.atleast_1d(g(x)))
            if c["type"] == "eq":
                lcs.append(np.zeros(width))
                ucs.append(np.zeros(width))
            else:  # "ineq": g(x) >= 0
                lcs.append(np.zeros(width))
                ucs.append(np.full(width, np.inf))
        elif hasattr(c, "A"):  # LinearConstraint
            A = jnp.asarray(np.asarray(c.A, dtype=float))
            width = A.shape[0]
            funs.append(lambda x, A=A: A @ x)
            lcs.append(np.broadcast_to(np.asarray(c.lb, float), (width,)))
            ucs.append(np.broadcast_to(np.asarray(c.ub, float), (width,)))
        else:  # NonlinearConstraint
            g = c.fun
            width = np.atleast_1d(np.asarray(g(x0))).shape[0]
            funs.append(lambda x, g=g: jnp.atleast_1d(g(x)))
            lcs.append(np.broadcast_to(np.asarray(c.lb, float), (width,)))
            ucs.append(np.broadcast_to(np.asarray(c.ub, float), (width,)))

    m = int(sum(len(l) for l in lcs))
    cons = None
    if m:
        def cons(x):
            return jnp.concatenate([f(x) for f in funs])

    return DenseNLPModel(
        n=n, m=m, obj=fun, cons=cons, x0=x0,
        lvar=lvar, uvar=uvar,
        lcon=np.concatenate(lcs) if m else None,
        ucon=np.concatenate(ucs) if m else None,
        name=name,
    )


def host_model(
    obj: Callable,
    x0,
    grad: Callable,
    m: int = 0,
    cons: Optional[Callable] = None,
    jac: Optional[Callable] = None,
    lag_hess: Optional[Callable] = None,
    lvar=None,
    uvar=None,
    lcon=None,
    ucon=None,
    name: str = "host_model",
) -> DenseNLPModel:
    """Model with host-side (arbitrary Python/NumPy) callbacks.

    Each callback is staged through ``jax.pure_callback``: the solver's
    jitted step transfers the (small) iterate to the host, runs the Python
    function, and ships the values back — the reference's wrapper-model
    staging buffers (wrappers.jl:107-135) with XLA managing the copies.
    Derivatives cannot come from AD (the code is opaque to JAX), so ``grad``
    is required, ``jac`` is required when ``m > 0``, and a missing
    ``lag_hess`` should be paired with
    ``hessian_approximation=COMPACT_LBFGS``."""
    x0 = np.asarray(x0, dtype=np.float64)
    n = x0.shape[0]
    if m > 0:
        assert cons is not None and jac is not None, (
            "host_model with constraints requires cons and jac callbacks"
        )

    def _f(shape, fn, *args):
        out = jax.ShapeDtypeStruct(shape, jnp.float64)
        return jax.pure_callback(
            lambda *a: np.asarray(fn(*a), dtype=np.float64).reshape(shape),
            out, *args,
        )

    model_kwargs = dict(
        obj=lambda x: _f((), obj, x),
        grad=lambda x: _f((n,), grad, x),
    )
    if m > 0:
        model_kwargs["cons"] = lambda x: _f((m,), cons, x)
        model_kwargs["jac"] = lambda x: _f((m, n), jac, x)
    if lag_hess is not None:
        model_kwargs["lag_hess"] = lambda x, y, ow: _f(
            (n, n), lag_hess, x, y, ow
        )
    else:
        # quasi-Newton placeholder — never evaluated under COMPACT_LBFGS/BFGS
        def _no_hess(x, y, ow):
            raise NotImplementedError(
                "host_model without lag_hess: use "
                "hessian_approximation=HessianApproximation.COMPACT_LBFGS"
            )

        model_kwargs["lag_hess"] = _no_hess

    return DenseNLPModel(
        n=n, m=m, x0=x0, lvar=lvar, uvar=uvar, lcon=lcon, ucon=ucon,
        name=name, **model_kwargs,
    )
