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
import numpy as np

from .dense import DenseKKT, KKTContext
from .sparse import SparseKKT
from .vec import KKTVec


class DenseUnreducedKKT(DenseKKT):
    def sys_size(self) -> int:
        p = self.prob
        return 3 * p.nw + p.m

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu, rr=False):
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


class SparseUnreducedKKT(SparseKKT):
    """Sparse-storage unreduced system (``SparseUnreducedKKTSystem``,
    unreduced.jl): the √z-symmetrized 4-block matrix assembled from COO
    value arrays — with the block-banded backend each bound-dual row is a
    single-entry "constraint" interleaved directly after its variable
    (same quasidefinite-preserving order as the augmented system; its
    diagonal ``xl−x < 0`` is fully formed on arrival)."""

    _band_is_augmented = False  # band holds the √z-symmetrized 4-block system

    def __init__(self, prob, opts):
        super().__init__(prob, opts)
        assert not self.lowrank, (
            "quasi-Newton low-rank Hessians are not supported by the "
            "unreduced system; use KKTSystem.SPARSE"
        )

    def sys_size(self) -> int:
        p = self.prob
        return 3 * p.nw + p.m

    def _extended_jac_pattern(self):
        """Jacobian pattern with the 2·nw bound-dual rows appended as
        one-entry rows (row m+i ↔ lower bound of w_i, m+nw+i ↔ upper)."""
        p = self.prob
        iw = np.arange(p.nw, dtype=np.int64)
        rows = np.concatenate([np.asarray(p.jac_rows_aug), p.m + iw, p.m + p.nw + iw])
        cols = np.concatenate([np.asarray(p.jac_cols_aug), iw, iw])
        return rows, cols

    def _band_pattern(self):
        p = self.prob
        N = self.sys_size()
        diag = np.arange(N, dtype=np.int64)
        hr, hc = self._hess_pattern()
        jr, jc = self._extended_jac_pattern()
        rows = np.concatenate([diag, p.nw + jr, hr])
        cols = np.concatenate([diag, jc, hc])
        return rows, cols, N

    def _band_ordering(self):
        from ..ops.banded import kkt_interleaved_ordering

        p = self.prob
        hr, hc = self._hess_pattern()
        jr, jc = self._extended_jac_pattern()
        return kkt_interleaved_ordering(hr, hc, jr, jc, p.nw, p.m + 2 * p.nw)

    def _unreduced_parts(self, hess, jac, reg, du_diag, dl, du_, zl, zu):
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        sl = jnp.where(lb, jnp.sqrt(zl), 0.0)
        su = jnp.where(ub, jnp.sqrt(zu), 0.0)
        ldg = jnp.where(lb, -dl, -1.0)
        udg = jnp.where(ub, -du_, -1.0)
        return sl, su, ldg, udg

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu, rr=False):
        p = self.prob
        sl, su, ldg, udg = self._unreduced_parts(
            hess, jac, reg, du_diag, dl, du_, zl, zu
        )
        hv = hess  # quasi-Newton low-rank not supported for unreduced
        if self.sparse_direct:
            # value layout must match _band_pattern: diag, jac_ext, hess
            vals = jnp.concatenate(
                [reg, du_diag, ldg, udg, jac, sl, su, hv]
            )
            factor = self._sparse_factorize_coo(vals)
        else:
            N = self.sys_size()
            nw, m = p.nw, p.m
            K = jnp.zeros((N, N))
            idx = jnp.arange(nw)
            K = K.at[idx, idx].add(reg)
            if m:
                jdx = nw + jnp.arange(m)
                K = K.at[jdx, jdx].add(du_diag)
                K = K.at[nw + self.jr, self.jc].add(jac)
                K = K.at[self.jc, nw + self.jr].add(jac)
            K = K.at[self.hr, self.hc].add(hv)
            off = jnp.where(self.h_offdiag, hv, 0.0)
            K = K.at[self.hc, self.hr].add(off)
            ldx = nw + m + idx
            udx = 2 * nw + m + idx
            K = K.at[ldx, ldx].add(ldg)
            K = K.at[udx, udx].add(udg)
            K = K.at[ldx, idx].add(sl)
            K = K.at[idx, ldx].add(sl)
            K = K.at[udx, idx].add(su)
            K = K.at[idx, udx].add(su)
            factor = self._factorize_matrix(K)
        return KKTContext(
            hess=hess, jac=jac, pr_diag=reg, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    def solve(self, ctx: KKTContext, b: KKTVec) -> KKTVec:
        """Same pre/post √z scaling as the dense unreduced solve
        (factorization.jl:29-39)."""
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
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        ht = self.hess_mul(ctx.hess, t[: p.n])
        wx = jnp.concatenate([ht, jnp.zeros((p.nw - p.n,), ht.dtype)])
        sigma = (
            jnp.where(lb, ctx.zl / ctx.dl, 0.0)
            + jnp.where(ub, ctx.zu / ctx.du_, 0.0)
        )
        return wx + t * (ctx.pr_diag + sigma)
