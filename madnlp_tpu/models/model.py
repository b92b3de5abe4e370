"""NLP model protocol — the user-facing problem description.

Plays the role of NLPModels.jl in the reference stack (SURVEY.md §1 layer 5/9):

    min_x f(x)   s.t.   g_l <= g(x) <= g_u,   x_l <= x <= x_u

All evaluation callables must be JAX-traceable pure functions: the solver
jits them into its iteration step.  Derivatives default to JAX automatic
differentiation (the TPU-native replacement for JuMP/MOI AD ingestion,
reference: ext/MadNLPMOI/MOI_wrapper.jl:1376-1561).

Two derivative interfaces exist, mirroring the reference's Dense/Sparse
callbacks (src/Callbacks/nlpmodels.jl:116-218):

* :class:`DenseNLPModel` — ``jac(x) -> (m, n)``, ``lag_hess(x, y, ow) -> (n, n)``.
* :class:`SparseNLPModel` — static COO structures fixed at construction plus
  coordinate-value functions; the structure arrays are host-side numpy and
  become static gather/scatter maps at trace time (jit-friendly).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _as_np(x, n, default):
    if x is None:
        return np.full((n,), default, dtype=np.float64)
    return np.asarray(x, dtype=np.float64)


@dataclasses.dataclass
class DenseNLPModel:
    """NLP with dense derivative callbacks (AD-backed by default).

    **Parametric mode** (the SIMD-abstraction-of-NLPs pattern used by
    ExaModels for MadNLP's batched GPU path, BASELINE.md): if ``params`` is
    set to an example pytree, every callback takes ``(x, params)`` and the
    whole solver can be ``vmap``-ed / sharded over stacked parameter
    batches (e.g. thousands of perturbed scenarios)."""

    n: int
    obj: Callable
    x0: np.ndarray
    m: int = 0
    cons: Optional[Callable] = None
    lvar: Optional[np.ndarray] = None
    uvar: Optional[np.ndarray] = None
    lcon: Optional[np.ndarray] = None
    ucon: Optional[np.ndarray] = None
    y0: Optional[np.ndarray] = None
    grad: Optional[Callable] = None
    jac: Optional[Callable] = None
    lag_hess: Optional[Callable] = None  # (x, y, obj_weight[, params]) -> (n, n)
    minimize: bool = True
    name: str = "generic"
    params: object = None          # example parameter pytree (parametric mode)
    x0_fn: Optional[Callable] = None  # params -> x0 (parametric initial point)

    def __post_init__(self):
        self.x0 = np.asarray(self.x0, dtype=np.float64)
        self.lvar = _as_np(self.lvar, self.n, -np.inf)
        self.uvar = _as_np(self.uvar, self.n, np.inf)
        self.lcon = _as_np(self.lcon, self.m, 0.0)
        self.ucon = _as_np(self.ucon, self.m, 0.0)
        self.y0 = _as_np(self.y0, self.m, 0.0)
        parametric = self.params is not None
        if self.cons is None:
            assert self.m == 0
            if parametric:
                self.cons = lambda x, p: jnp.zeros((0,), dtype=x.dtype)
            else:
                self.cons = lambda x: jnp.zeros((0,), dtype=x.dtype)
        if self.grad is None:
            self.grad = jax.grad(self.obj, argnums=0)
        if self.jac is None:
            cons = self.cons
            if self.m > 0:
                self.jac = jax.jacfwd(cons, argnums=0)
            elif parametric:
                self.jac = lambda x, p: jnp.zeros((0, self.n), dtype=x.dtype)
            else:
                self.jac = lambda x: jnp.zeros((0, self.n), dtype=x.dtype)
        if self.lag_hess is None:
            obj, cons = self.obj, self.cons
            if parametric:
                def lag_hess(x, y, obj_weight, p):
                    def lagrangian(xx):
                        val = obj_weight * obj(xx, p)
                        if self.m > 0:
                            val = val + jnp.dot(y, cons(xx, p))
                        return val

                    return jax.hessian(lagrangian)(x)
            else:
                def lag_hess(x, y, obj_weight):
                    def lagrangian(xx):
                        val = obj_weight * obj(xx)
                        if self.m > 0:
                            val = val + jnp.dot(y, cons(xx))
                        return val

                    return jax.hessian(lagrangian)(x)

            self.lag_hess = lag_hess

    @property
    def is_dense(self) -> bool:
        return True

    @property
    def is_parametric(self) -> bool:
        return self.params is not None


@dataclasses.dataclass
class SparseNLPModel:
    """NLP with static sparse derivative structure.

    ``jac_rows/jac_cols`` give the COO structure of the Jacobian and
    ``hess_rows/hess_cols`` the **lower-triangular** structure of the
    Lagrangian Hessian (same convention as NLPModels.jl,
    reference: lib/MadNLPTests/src/Instances/hs15.jl:60-104).
    """

    n: int
    m: int
    obj: Callable
    cons: Callable
    x0: np.ndarray
    jac_rows: np.ndarray
    jac_cols: np.ndarray
    jac_coords: Callable          # x -> (nnzj,)
    hess_rows: np.ndarray
    hess_cols: np.ndarray
    hess_coords: Callable         # (x, y, obj_weight) -> (nnzh,)
    lvar: Optional[np.ndarray] = None
    uvar: Optional[np.ndarray] = None
    lcon: Optional[np.ndarray] = None
    ucon: Optional[np.ndarray] = None
    y0: Optional[np.ndarray] = None
    grad: Optional[Callable] = None
    minimize: bool = True
    name: str = "generic-sparse"
    params: object = None
    x0_fn: Optional[Callable] = None

    def __post_init__(self):
        self.x0 = np.asarray(self.x0, dtype=np.float64)
        self.lvar = _as_np(self.lvar, self.n, -np.inf)
        self.uvar = _as_np(self.uvar, self.n, np.inf)
        self.lcon = _as_np(self.lcon, self.m, 0.0)
        self.ucon = _as_np(self.ucon, self.m, 0.0)
        self.y0 = _as_np(self.y0, self.m, 0.0)
        self.jac_rows = np.asarray(self.jac_rows, dtype=np.int64)
        self.jac_cols = np.asarray(self.jac_cols, dtype=np.int64)
        self.hess_rows = np.asarray(self.hess_rows, dtype=np.int64)
        self.hess_cols = np.asarray(self.hess_cols, dtype=np.int64)
        if self.grad is None:
            self.grad = jax.grad(self.obj)

    @property
    def nnzj(self) -> int:
        return len(self.jac_rows)

    @property
    def nnzh(self) -> int:
        return len(self.hess_rows)

    @property
    def is_dense(self) -> bool:
        return False

    @property
    def is_parametric(self) -> bool:
        return self.params is not None

    def jac_dense(self, x):
        """Densify the Jacobian via static scatter (trace-time constant maps)."""
        vals = self.jac_coords(x)
        out = jnp.zeros((self.m, self.n), dtype=vals.dtype)
        return out.at[self.jac_rows, self.jac_cols].add(vals)

    def lag_hess_dense(self, x, y, obj_weight):
        """Densify the lower-triangular Hessian into a full symmetric matrix."""
        vals = self.hess_coords(x, y, obj_weight)
        out = jnp.zeros((self.n, self.n), dtype=vals.dtype)
        out = out.at[self.hess_rows, self.hess_cols].add(vals)
        strict_lower = jnp.tril(out, k=-1)
        return out + strict_lower.T

    def to_dense(self) -> DenseNLPModel:
        return DenseNLPModel(
            n=self.n,
            m=self.m,
            obj=self.obj,
            cons=self.cons,
            x0=self.x0,
            lvar=self.lvar,
            uvar=self.uvar,
            lcon=self.lcon,
            ucon=self.ucon,
            y0=self.y0,
            grad=self.grad,
            jac=self.jac_dense,
            lag_hess=self.lag_hess_dense,
            minimize=self.minimize,
            name=self.name,
        )


NLPModel = DenseNLPModel  # default public alias


def create_model(
    obj: Callable,
    n: int,
    x0,
    cons: Optional[Callable] = None,
    m: int = 0,
    **kwargs,
) -> DenseNLPModel:
    """Convenience constructor: define an NLP from pure JAX functions.

    Derivatives are obtained by JAX AD.  This is the ergonomic analogue of
    the reference's JuMP/MOI front end."""
    return DenseNLPModel(n=n, m=m, obj=obj, cons=cons, x0=x0, **kwargs)
