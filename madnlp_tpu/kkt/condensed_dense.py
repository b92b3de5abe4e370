"""Condensed-space KKT system (dense storage) — the accelerator-native
formulation (TPU re-design of ``DenseCondensedKKTSystem``,
``/root/reference/src/KKT/Dense/condensed.jl``, and the solve path
``src/IPM/factorization.jl:190-229``).

Eliminates both the bound duals *and* the slack/inequality rows:

    K_cond = [ W + Σx + Jᵢᵀ D Jᵢ    Aₑᵀ    ]        D = Σs / (1 − Σd Σs)
             [ Aₑ                  Σd(eq) ]

size (n + n_eq).  With the Lifted-KKT reformulation (equality relaxation,
``RelaxEquality``) n_eq = 0 and K_cond is symmetric positive definite after
regularization, so a plain Cholesky factorization suffices and "Cholesky
succeeded" doubles as the inertia test — exactly the strategy MadNLP's GPU
port chose over porting sparse indefinite factorizations (SURVEY.md §2.4),
and the right fit for the TPU MXU: the condensation itself is one
``JᵀDJ`` GEMM.

Inertia rule: ``num_zero == 0 && num_neg == n_eq`` (condensed.jl:189-191).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .dense import DenseKKT, KKTContext
from .vec import KKTVec


class DenseCondensedKKT(DenseKKT):
    def __init__(self, prob, opts):
        super().__init__(prob, opts)
        self.eq_sel = np.nonzero(~prob.ineq_mask)[0].astype(np.int64)
        self.n_eq = len(self.eq_sel)
        from ..utils.options import LinearSolver

        if opts.linear_solver in (
            LinearSolver.BLOCK_CHOLESKY, LinearSolver.HYKKT
        ):
            # condensed matrix is [W̃ Aeᵀ; Ae Σd]: range-space split at n;
            # with no equalities it is plain SPD — use Cholesky directly
            self.solver = (
                opts.linear_solver if self.n_eq else LinearSolver.CHOLESKY
            )

    def _split(self):
        from ..utils.options import LinearSolver

        if self.solver in (LinearSolver.BLOCK_CHOLESKY, LinearSolver.HYKKT):
            return self.prob.n
        return None

    # -- assembly + factorization -----------------------------------------

    def _diag_buffer(self, pr_diag, du_diag):
        """D = Σs / (1 − Σd Σs) over inequality rows (condensed.jl:160-162)."""
        p = self.prob
        sigma_s = pr_diag[p.n :]
        sigma_d = du_diag[jnp.asarray(p.slack_sel)] if p.ns else du_diag[:0]
        return sigma_s / (1.0 - sigma_d * sigma_s)

    def build_and_factorize(
        self, hess, jac, reg, du_diag, dl, du_, zl, zu, rr: bool = False
    ) -> KKTContext:
        p = self.prob
        pr_diag, du_diag = self.aug_diagonals(reg, du_diag, dl, du_, zl, zu)
        n = p.n
        Jx = jac[:, :n]
        D = self._diag_buffer(pr_diag, du_diag)
        W = hess + jnp.diag(pr_diag[:n])
        if p.ns:
            Ji = Jx[jnp.asarray(p.slack_sel), :]
            # JᵢᵀDJᵢ as one MXU GEMM (√D-scaled, condensed.jl:146-172)
            Js = Ji * jnp.sqrt(D)[:, None]
            W = W + Js.T @ Js
        if self.n_eq:
            eq = jnp.asarray(self.eq_sel)
            Ae = Jx[eq, :]
            Kc = jnp.block(
                [[W, Ae.T], [Ae, jnp.diag(du_diag[eq])]]
            )
        else:
            Kc = W
        factor = self._factorize_matrix(Kc, split=self._split(), rr=rr)
        return KKTContext(
            hess=hess, jac=jac, pr_diag=pr_diag, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    def sys_size(self) -> int:
        return self.prob.n + self.n_eq

    # -- inertia -----------------------------------------------------------

    def is_inertia_correct(self, pos, zero, neg):
        return (zero == 0) & (neg == self.n_eq)

    # -- solve (factorization.jl:190-229) ----------------------------------

    def solve(self, ctx: KKTContext, b: KKTVec) -> KKTVec:
        p = self.prob
        n = p.n
        w = self.reduce_rhs(ctx, b)
        wx = w.xp[:n]
        ws = w.xp[n:]
        wy_full = w.y
        D = self._diag_buffer(ctx.pr_diag, ctx.du_diag)
        sigma_s = ctx.pr_diag[n:]
        Jx = ctx.jac[:, :n]

        if p.ns:
            sel = jnp.asarray(p.slack_sel)
            wz = wy_full[sel]
            buffer = jnp.zeros((p.m,), wx.dtype).at[sel].set(D * (wz + ws / sigma_s))
            xx = wx + Jx.T @ buffer
        else:
            buffer = jnp.zeros((p.m,), wx.dtype)
            xx = wx

        if self.n_eq:
            eq = jnp.asarray(self.eq_sel)
            rhs = jnp.concatenate([xx, wy_full[eq]])
            sol = self._backsolve(ctx.factor, rhs)
            dx, xy = sol[:n], sol[n:]
        else:
            dx = self._backsolve(ctx.factor, xx)
            xy = jnp.zeros((0,), dx.dtype)

        dual = Jx @ dx
        if self.n_eq:
            dual = dual.at[jnp.asarray(self.eq_sel)].set(xy)
        if p.ns:
            sel = jnp.asarray(p.slack_sel)
            dual = dual.at[sel].set(dual[sel] * D)
        dual = dual - buffer
        if p.ns:
            dz = dual[jnp.asarray(p.slack_sel)]
            ds_out = (ws + dz) / sigma_s
        else:
            ds_out = ws[:0]
        w = w._replace(xp=jnp.concatenate([dx, ds_out]), y=dual)
        return self.finish_aug_solve(ctx, w, b.zl, b.zu)
