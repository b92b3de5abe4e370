"""Unreduced KKT system — bound duals kept inside the matrix
(TPU re-design of ``SparseUnreducedKKTSystem``,
``/root/reference/src/KKT/Sparse/unreduced.jl``; solve path
``src/IPM/factorization.jl:29-39``).

The 6×6 block system of ``src/KKT/KKTsystem.jl:10-34`` symmetrized with the
√z scaling:

    [ W + δwI   Aᵀ     Slᵀ          Suᵀ        ]   Sl = diag(√zl) (masked)
    [ A         -δcI   0            0          ]   Su = diag(√zu)
    [ Sl        0      diag(xl−x)   0          ]
    [ Su        0      0            diag(x−xu) ]

size 3·nw + m in the masked full-length layout (unmasked bound rows carry a
decoupled −1 diagonal, matching the negative corner blocks so the inertia
test stays ``num_pos == nw``).  The iterative-refinement operator is the
same unreduced operator as the reduced systems (`DenseKKT.mul`), so
refinement is inherited unchanged."""

from __future__ import annotations

import jax.numpy as jnp

from .dense import DenseKKT, KKTContext
from .vec import KKTVec


class DenseUnreducedKKT(DenseKKT):
    def sys_size(self) -> int:
        p = self.prob
        return 3 * p.nw + p.m

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu):
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        n, nw, m = p.n, p.nw, p.m
        W = jnp.zeros((nw, nw), hess.dtype).at[:n, :n].set(hess)
        W = W + jnp.diag(reg)  # pr_diag = reg only (kernels.jl:29-34)
        sl = jnp.where(lb, jnp.sqrt(zl), 0.0)
        su = jnp.where(ub, jnp.sqrt(zu), 0.0)
        Sl = jnp.diag(sl)
        Su = jnp.diag(su)
        ldg = jnp.where(lb, -dl, -1.0)   # xl − x  (negative corner)
        udg = jnp.where(ub, -du_, -1.0)  # x − xu
        Z = jnp.zeros
        dt = hess.dtype
        K = jnp.block(
            [
                [W, jac.T, Sl, Su],
                [jac, jnp.diag(du_diag), Z((m, nw), dt), Z((m, nw), dt)],
                [Sl, Z((nw, m), dt), jnp.diag(ldg), Z((nw, nw), dt)],
                [Su, Z((nw, m), dt), Z((nw, nw), dt), jnp.diag(udg)],
            ]
        )
        factor = self._factorize_matrix(K)
        return KKTContext(
            hess=hess, jac=jac, pr_diag=reg, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    def solve(self, ctx: KKTContext, b: KKTVec) -> KKTVec:
        """solve_kkt! for the unreduced system (factorization.jl:29-39):
        pre-scale the bound-dual rhs by 1/√z, solve, post-scale by ∓√z."""
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        sl = jnp.where(lb, jnp.sqrt(ctx.zl), 0.0)
        su = jnp.where(ub, jnp.sqrt(ctx.zu), 0.0)
        wzl = jnp.where(lb & (sl != 0.0), b.zl / jnp.where(sl != 0.0, sl, 1.0), b.zl)
        wzu = jnp.where(ub & (su != 0.0), b.zu / jnp.where(su != 0.0, su, 1.0), b.zu)
        rhs = jnp.concatenate([b.xp, b.y, wzl, wzu])
        sol = self._backsolve(ctx.factor, rhs)
        nw, m = p.nw, p.m
        xp = sol[:nw]
        y = sol[nw : nw + m]
        tl = sol[nw + m : 2 * nw + m]
        tu = sol[2 * nw + m :]
        dzl = jnp.where(lb, -sl * tl, 0.0)
        dzu = jnp.where(ub, su * tu, 0.0)
        return KKTVec(xp=xp, y=y, zl=dzl, zu=dzu)

    def mul_hess_blk(self, ctx: KKTContext, t):
        """factorization.jl:340-350: add the Σ terms explicitly (pr_diag of
        the unreduced system holds only the regularization)."""
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        n = p.n
        ht = ctx.hess @ t[:n]
        wx = jnp.concatenate([ht, jnp.zeros((p.nw - n,), ht.dtype)])
        sigma = (
            jnp.where(lb, ctx.zl / ctx.dl, 0.0)
            + jnp.where(ub, ctx.zu / ctx.du_, 0.0)
        )
        return wx + t * (ctx.pr_diag + sigma)
