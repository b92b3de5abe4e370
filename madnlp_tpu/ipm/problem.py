"""Problem reformulation layer — the analogue of the reference's Callback
wrappers (``/root/reference/src/Callbacks/nlpmodels.jl``).

Reformulates the user NLP

    min f(x)  s.t.  g_l <= g(x) <= g_u,  x_l <= x <= x_u

into the internal slack form used by the IPM
(``docs/src/algorithm.md:30-57``):

    min f(w)  s.t.  c(w) = 0,  xl <= w <= xu,   w = (x, s)

with ``c_i(w) = s_g(i) g_i(x) - s_i`` for inequality rows and
``c_i(w) = s_g(i) (g_i(x) - rhs_i)`` for equality rows, plus objective /
constraint / Jacobian scaling (nlpmodels.jl:225-264), fixed-variable
treatment (MakeParameter masking for dense callbacks, nlpmodels.jl:1035-1058),
equality relaxation (nlpmodels.jl:83-105), and min/max sign flip
(src/IPM/callbacks.jl:9-15).

All index sets of the reference (ind_ineq/lb/ub/llb/uub/fixed,
nlpmodels.jl:369-406) become **static boolean masks** computed host-side
with numpy at construction; evaluations are pure jax functions of
``(w, scaling)`` with fixed shapes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import DenseNLPModel
from ..utils.options import (
    EqualityTreatment,
    FixedVariableTreatment,
    MadNLPOptions,
)


class Scaling(NamedTuple):
    """Runtime scaling factors, computed once at ``initialize`` from the
    Jacobian/gradient at the initial point (nlpmodels.jl:698-765)."""

    obj_scale: jax.Array   # scalar
    con_scale: jax.Array   # (m,)


@dataclasses.dataclass
class Problem:
    """Static reformulated problem (host-side construction)."""

    model: DenseNLPModel
    opts: MadNLPOptions

    n: int       # original variables
    m: int       # constraints
    ns: int      # slacks (= #inequality rows)
    nw: int      # n + ns
    n_eq: int

    # static masks / maps (numpy, baked in as constants at trace time)
    ineq_mask: np.ndarray       # (m,) bool — rows with a slack
    slack_sel: np.ndarray       # (ns,) int — constraint index of each slack
    lb_mask: np.ndarray         # (nw,) bool
    ub_mask: np.ndarray         # (nw,) bool
    llb_mask: np.ndarray        # (nw,) bool — lower-bounded only (x part only)
    uub_mask: np.ndarray        # (nw,) bool — upper-bounded only (x part only)
    eqrelax_mask: np.ndarray    # (nw,) bool — slacks of relaxed equality rows
                                # (their bounds get relaxed twice at init,
                                # matching nlpmodels.jl:576-578 + 632)
    fixed_mask: np.ndarray      # (n,) bool (MakeParameter treatment)
    xl0: np.ndarray             # (nw,) reformulated lower bounds (pre-relax)
    xu0: np.ndarray             # (nw,)
    rhs: np.ndarray             # (m,) equality right-hand side (pre-scaling)
    sign: float                 # +1 minimize, -1 maximize

    @property
    def nlb(self) -> int:
        return int(self.lb_mask.sum())

    @property
    def nub(self) -> int:
        return int(self.ub_mask.sum())

    @property
    def has_constraints(self) -> bool:
        return self.m > 0

    # -- evaluation pipeline (pure jax functions) -------------------------

    def x_of(self, w):
        return w[: self.n]

    def s_of(self, w):
        return w[self.n :]

    def scatter_slack(self, s):
        """(ns,) slack values -> (m,) with zeros on equality rows."""
        out = jnp.zeros((self.m,), dtype=s.dtype)
        if self.ns:
            out = out.at[jnp.asarray(self.slack_sel)].set(s)
        return out

    def gather_ineq(self, c):
        """(m,) -> (ns,) values on inequality rows."""
        if self.ns == 0:
            return jnp.zeros((0,), dtype=c.dtype)
        return c[jnp.asarray(self.slack_sel)]

    # model call helpers: parametric models take (x, ..., params)
    def _obj(self, x, theta):
        return self.model.obj(x, theta) if self.model.is_parametric else self.model.obj(x)

    def _grad(self, x, theta):
        return self.model.grad(x, theta) if self.model.is_parametric else self.model.grad(x)

    def _cons(self, x, theta):
        return self.model.cons(x, theta) if self.model.is_parametric else self.model.cons(x)

    def _jac(self, x, theta):
        return self.model.jac(x, theta) if self.model.is_parametric else self.model.jac(x)

    def _lag_hess(self, x, y, ow, theta):
        if self.model.is_parametric:
            return self.model.lag_hess(x, y, ow, theta)
        return self.model.lag_hess(x, y, ow)

    def eval_obj(self, scal: Scaling, w, theta=None):
        return self.sign * scal.obj_scale * self._obj(self.x_of(w), theta)

    def eval_grad(self, scal: Scaling, w, theta=None):
        """(nw,) gradient; slack part is zero."""
        x = self.x_of(w)
        g = scal.obj_scale * self._grad(x, theta)
        if self.fixed_mask.any():
            # MakeParameter (dense): proximal pull to the fixed value
            # (nlpmodels.jl:1019-1034)
            fm = jnp.asarray(self.fixed_mask)
            g = jnp.where(fm, x - jnp.asarray(self.xl_fixed), g)
        g = self.sign * g
        return jnp.concatenate([g, jnp.zeros((self.ns,), g.dtype)])

    def eval_cons(self, scal: Scaling, w, theta=None):
        """(m,) internal constraints c(w) (src/IPM/callbacks.jl:39-55)."""
        if self.m == 0:
            return jnp.zeros((0,), w.dtype)
        x, s = self.x_of(w), self.s_of(w)
        c = scal.con_scale * self._cons(x, theta)
        c = c - self.scatter_slack(s)
        c = c - scal.con_scale * jnp.asarray(self.rhs)
        return c

    def eval_jac(self, scal: Scaling, w, theta=None):
        """(m, nw) augmented Jacobian [s_g ∘ J(x), -E]."""
        x = self.x_of(w)
        J = scal.con_scale[:, None] * self._jac(x, theta)
        if self.fixed_mask.any():
            J = jnp.where(jnp.asarray(self.fixed_mask)[None, :], 0.0, J)
        E = jnp.zeros((self.m, self.ns), dtype=J.dtype)
        if self.ns:
            E = E.at[jnp.asarray(self.slack_sel), jnp.arange(self.ns)].set(-1.0)
        return jnp.concatenate([J, E], axis=1)

    def eval_jtprod_x(self, scal: Scaling, x, y, theta=None):
        """(n,) J(x)ᵀ y in the scaled space via VJP (quasi-Newton secant
        path, nlpmodels.jl:790-800)."""
        if self.m == 0:
            return jnp.zeros((self.n,), x.dtype)
        ys = y * scal.con_scale
        _, vjp = jax.vjp(lambda xx: self._cons(xx, theta), x)
        (jt,) = vjp(ys)
        if self.fixed_mask.any():
            jt = jnp.where(jnp.asarray(self.fixed_mask), 0.0, jt)
        return jt

    def eval_lag_hess(self, scal: Scaling, w, y, theta=None, is_resto: bool = False):
        """(n, n) Lagrangian Hessian in the scaled space."""
        x = self.x_of(w)
        obj_weight = (0.0 if is_resto else 1.0) * self.sign * scal.obj_scale
        H = self._lag_hess(x, y * scal.con_scale, obj_weight, theta)
        if self.fixed_mask.any():
            fm = jnp.asarray(self.fixed_mask)
            H = jnp.where(fm[:, None] | fm[None, :], 0.0, H)
            H = H + jnp.diag(jnp.where(fm, 1.0, 0.0))
        return H

    def compute_scaling(self, w0, theta=None) -> Scaling:
        """nlpmodels.jl:225-264: row-max Jacobian scaling + gradient scaling."""
        dtype = w0.dtype
        if not self.opts.nlp_scaling:
            return Scaling(jnp.ones((), dtype), jnp.ones((self.m,), dtype))
        unit = Scaling(jnp.ones((), dtype), jnp.ones((self.m,), dtype))
        max_g = self.opts.nlp_scaling_max_gradient
        if self.m > 0:
            J = self.eval_jac(unit, w0, theta)[:, : self.n]
            row_max = jnp.maximum(jnp.max(jnp.abs(J), axis=1), 1.0)
            con_scale = jnp.minimum(1.0, max_g / row_max)
        else:
            con_scale = jnp.ones((0,), dtype)
        g = self._grad(self.x_of(w0), theta)
        gnorm = jnp.max(jnp.abs(g)) if self.n else jnp.ones((), dtype)
        obj_scale = jnp.minimum(1.0, max_g / jnp.maximum(gnorm, 1e-300))
        return Scaling(obj_scale, con_scale)

    def jac_template(self):
        """Zero value of the Jacobian representation stored in the State."""
        return jnp.zeros((self.m, self.nw))

    def hess_template(self):
        return jnp.zeros((self.n, self.n))

    @property
    def is_sparse(self) -> bool:
        return False

    # set in build_problem:
    xl_fixed: np.ndarray = None  # (n,) original lower bounds (for MakeParameter)


@dataclasses.dataclass
class SparseProblem(Problem):
    """Sparse-callback problem (the `SparseCallback` analogue): Jacobian and
    Hessian live as *value arrays over a static COO structure*, augmented
    with the slack entries so every product/assembly is one uniform
    segment scatter/gather with trace-time-constant index maps — the
    TPU-native reading of the reference's `coo_to_csc` map trick
    (src/matrixtools.jl:55-137, SURVEY.md §7).

    Representations stored in the solver State:
    * jac  -> (nnzj + ns,) scaled values over (jac_rows_aug, jac_cols_aug)
    * hess -> (nnzh,) values over the static lower-triangular structure
    """

    # static augmented jacobian structure (set in build_problem)
    jac_rows_aug: np.ndarray = None   # (nnzj + ns,)
    jac_cols_aug: np.ndarray = None   # (nnzj + ns,) in [0, nw)
    hess_rows: np.ndarray = None
    hess_cols: np.ndarray = None

    @property
    def is_sparse(self) -> bool:
        return True

    @property
    def nnzj_aug(self) -> int:
        return len(self.jac_rows_aug)

    def jac_template(self):
        return jnp.zeros((self.nnzj_aug,))

    def hess_template(self):
        from ..utils.options import HessianApproximation
        from .quasi_newton import lowrank_zeros

        if self.opts.hessian_approximation == HessianApproximation.COMPACT_LBFGS:
            # compact L-BFGS over a sparse KKT: σ-diagonal assembled, low-rank
            # part applied via SMW (reference: src/IPM/factorization.jl:76-140)
            return lowrank_zeros(self.n, self.opts.quasi_newton_options.max_history)
        return jnp.zeros((len(self.hess_rows),))

    def eval_jac(self, scal: Scaling, w, theta=None):
        """(nnzj+ns,) scaled jacobian values (jac_scale = con_scale[row],
        nlpmodels.jl:246-252); slack entries are the trailing -1s."""
        x = self.x_of(w)
        model = self.model
        vals = (
            model.jac_coords(x, theta)
            if model.is_parametric
            else model.jac_coords(x)
        )
        vals = vals * scal.con_scale[jnp.asarray(model.jac_rows)]
        if self.fixed_mask.any():
            fixed_entry = jnp.asarray(self.fixed_mask[model.jac_cols])
            vals = jnp.where(fixed_entry, 0.0, vals)
        slack_vals = jnp.full((self.ns,), -1.0)
        return jnp.concatenate([vals, slack_vals])

    def eval_lag_hess(self, scal: Scaling, w, y, theta=None, is_resto=False):
        x = self.x_of(w)
        model = self.model
        obj_weight = (0.0 if is_resto else 1.0) * self.sign * scal.obj_scale
        ys = y * scal.con_scale
        vals = (
            model.hess_coords(x, ys, obj_weight, theta)
            if model.is_parametric
            else model.hess_coords(x, ys, obj_weight)
        )
        if self.fixed_mask.any():
            hr, hc = model.hess_rows, model.hess_cols
            fixed_entry = jnp.asarray(
                self.fixed_mask[hr] | self.fixed_mask[hc]
            )
            unit_diag = jnp.asarray((hr == hc) & self.fixed_mask[hr])
            vals = jnp.where(fixed_entry, 0.0, vals)
            vals = jnp.where(unit_diag, 1.0, vals)
        return vals

    def eval_jtprod_x(self, scal: Scaling, x, y, theta=None):
        model = self.model
        vals = (
            model.jac_coords(x, theta)
            if model.is_parametric
            else model.jac_coords(x)
        )
        ys = y * scal.con_scale
        out = jnp.zeros((self.n,), x.dtype)
        out = out.at[jnp.asarray(model.jac_cols)].add(
            vals * ys[jnp.asarray(model.jac_rows)]
        )
        if self.fixed_mask.any():
            out = jnp.where(jnp.asarray(self.fixed_mask), 0.0, out)
        return out

    def compute_scaling(self, w0, theta=None) -> Scaling:
        """Sparse row-max scaling (set_con_scale_sparse!,
        nlpmodels.jl:229-246)."""
        dtype = w0.dtype
        if not self.opts.nlp_scaling:
            return Scaling(jnp.ones((), dtype), jnp.ones((self.m,), dtype))
        max_g = self.opts.nlp_scaling_max_gradient
        model = self.model
        x = self.x_of(w0)
        if self.m > 0:
            vals = (
                model.jac_coords(x, theta)
                if model.is_parametric
                else model.jac_coords(x)
            )
            row_max = jnp.ones((self.m,), dtype)
            row_max = row_max.at[jnp.asarray(model.jac_rows)].max(jnp.abs(vals))
            con_scale = jnp.minimum(1.0, max_g / row_max)
        else:
            con_scale = jnp.ones((0,), dtype)
        g = self._grad(x, theta)
        gnorm = jnp.max(jnp.abs(g)) if self.n else jnp.ones((), dtype)
        obj_scale = jnp.minimum(1.0, max_g / jnp.maximum(gnorm, 1e-300))
        return Scaling(obj_scale, con_scale)

    # dense fallbacks for the stats-unpacking path
    def _jac(self, x, theta):
        vals = (
            self.model.jac_coords(x, theta)
            if self.model.is_parametric
            else self.model.jac_coords(x)
        )
        out = jnp.zeros((self.m, self.n))
        return out.at[
            jnp.asarray(self.model.jac_rows), jnp.asarray(self.model.jac_cols)
        ].add(vals)


def build_problem(model: DenseNLPModel, opts: MadNLPOptions) -> Problem:
    """Host-side reformulation (the `create_callback` analogue,
    nlpmodels.jl:412-508)."""
    n, m = model.n, model.m
    lvar = model.lvar.copy()
    uvar = model.uvar.copy()
    lcon = model.lcon.copy()
    ucon = model.ucon.copy()
    sign = 1.0 if model.minimize else -1.0

    # Fixed variables
    fixed_mask = np.zeros((n,), dtype=bool)
    xl_fixed = lvar.copy()
    if opts.fixed_variable_treatment == FixedVariableTreatment.MAKE_PARAMETER:
        fixed_mask = lvar == uvar
        if fixed_mask.any():
            # Dense MakeParameter: free the bounds, pin via grad/hess masking
            # (nlpmodels.jl:580-590)
            lvar = np.where(fixed_mask, -np.inf, lvar)
            uvar = np.where(fixed_mask, np.inf, uvar)
    # RelaxBound needs no static work — bound relaxation at initialize
    # separates lvar/uvar by ±tol (kernels.jl:206-218).

    # Equality treatment
    if opts.equality_treatment == EqualityTreatment.RELAX:
        # All rows become inequalities; bounds relaxed at initialize.
        eq_rows = lcon == ucon
        ineq_mask = np.ones((m,), dtype=bool)
    else:
        eq_rows = np.zeros((m,), dtype=bool)
        ineq_mask = lcon < ucon

    slack_sel = np.nonzero(ineq_mask)[0].astype(np.int64)
    ns = len(slack_sel)
    nw = n + ns
    n_eq = m - ns

    # Reformulated bounds over w = (x, s)
    xl0 = np.concatenate([lvar, lcon[slack_sel]])
    xu0 = np.concatenate([uvar, ucon[slack_sel]])

    # Equality right-hand side (pre-scaling): rows with lcon == ucon
    rhs = np.where(~ineq_mask, lcon, 0.0)

    lb_mask = xl0 > -np.inf
    ub_mask = xu0 < np.inf
    # llb/uub masks over x-part only (nlpmodels.jl:390-393): one-sided bounds
    llb = (lvar > -np.inf) & (uvar == np.inf)
    uub = (lvar == -np.inf) & (uvar < np.inf)
    llb_mask = np.concatenate([llb, np.zeros((ns,), bool)])
    uub_mask = np.concatenate([uub, np.zeros((ns,), bool)])
    eqrelax_mask = np.concatenate([np.zeros((n,), bool), eq_rows[slack_sel]])

    fields = dict(
        model=model,
        opts=opts,
        n=n,
        m=m,
        ns=ns,
        nw=nw,
        n_eq=n_eq,
        ineq_mask=ineq_mask,
        slack_sel=slack_sel,
        lb_mask=lb_mask,
        ub_mask=ub_mask,
        llb_mask=llb_mask,
        uub_mask=uub_mask,
        eqrelax_mask=eqrelax_mask,
        fixed_mask=fixed_mask,
        xl0=xl0,
        xu0=xu0,
        rhs=rhs,
        sign=sign,
    )
    if getattr(model, "is_dense", True):
        prob = Problem(**fields)
    else:
        # augment the jacobian structure with the slack entries so every
        # J-product is one uniform segment op
        jac_rows_aug = np.concatenate([model.jac_rows, slack_sel])
        jac_cols_aug = np.concatenate(
            [model.jac_cols, n + np.arange(ns, dtype=np.int64)]
        )
        prob = SparseProblem(
            **fields,
            jac_rows_aug=jac_rows_aug,
            jac_cols_aug=jac_cols_aug,
            hess_rows=model.hess_rows,
            hess_cols=model.hess_cols,
        )
    prob.xl_fixed = xl_fixed
    return prob
