"""Sparse-callback KKT systems — static-scatter assembly from COO value
arrays (TPU re-design of ``SparseKKTSystem`` / ``SparseCondensedKKTSystem``,
``/root/reference/src/KKT/Sparse/{augmented,condensed}.jl``).

The reference's symbolic phase builds index maps once (``coo_to_csc`` +
``dptr/hptr/jptr``, condensed.jl:201-301) and then every assembly is a
scatter through those maps — already the perfect formulation for XLA: here
the maps are host-side numpy arrays baked into the trace, and assemblies
are single fused ``scatter-add``s.

Storage/factorization remain *dense* in this round (TPU has no sparse
direct solver; the Pallas block-sparse Cholesky is the planned follow-up) —
what the sparse path buys today is sparse **evaluation and assembly**:
``nnz``-sized derivative arrays instead of dense (m, nw)/(n, n) AD
materializations, which is what limits problem size on the evaluation side.

* :class:`SparseKKT` — reduced augmented system, scatter-assembled.
* :class:`SparseCondensedKKT` — Lifted-KKT condensed system
  ``K = W + Σx + JᵀDJ`` where the JᵀDJ term uses a precomputed
  *pair map*: for every pair of nonzeros sharing a constraint row, one
  (row, col, src_a, src_b, con) tuple; the numeric build is then
  ``K[r,c] += D[con]·Jv[a]·Jv[b]`` — exactly
  ``_build_condensed_aug_coord!`` (condensed.jl:328-345) as one scatter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .dense import DenseKKT, KKTContext
from .vec import KKTVec


class SparseKKT(DenseKKT):
    """Reduced augmented KKT with scatter assembly from sparse callbacks."""

    def __init__(self, prob, opts):
        super().__init__(prob, opts)
        p = prob
        self.jr = jnp.asarray(p.jac_rows_aug)
        self.jc = jnp.asarray(p.jac_cols_aug)
        self.hr = jnp.asarray(p.hess_rows)
        self.hc = jnp.asarray(p.hess_cols)
        self.h_offdiag = jnp.asarray(p.hess_rows != p.hess_cols)

    # -- sparse products ---------------------------------------------------

    def jtprod(self, jac_vals, y):
        p = self.prob
        out = jnp.zeros((p.nw,), jac_vals.dtype)
        if p.m == 0:
            return out
        return out.at[self.jc].add(jac_vals * y[self.jr])

    def jprod(self, jac_vals, v):
        p = self.prob
        out = jnp.zeros((p.m,), jac_vals.dtype)
        if p.m == 0:
            return out
        return out.at[self.jr].add(jac_vals * v[self.jc])

    def hess_mul(self, hess_vals, v):
        """(n,) symmetric product from the lower-triangular values."""
        p = self.prob
        out = jnp.zeros((p.n,), hess_vals.dtype)
        out = out.at[self.hr].add(hess_vals * v[self.hc])
        off = jnp.where(self.h_offdiag, hess_vals, 0.0)
        return out.at[self.hc].add(off * v[self.hr])

    # -- assembly ----------------------------------------------------------

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu):
        p = self.prob
        pr_diag, du_diag = self.aug_diagonals(reg, du_diag, dl, du_, zl, zu)
        N = p.nw + p.m
        K = jnp.zeros((N, N))
        idx = jnp.arange(p.nw)
        K = K.at[idx, idx].add(pr_diag)
        if p.m:
            jdx = p.nw + jnp.arange(p.m)
            K = K.at[jdx, jdx].add(du_diag)
            K = K.at[p.nw + self.jr, self.jc].add(jac)
            K = K.at[self.jc, p.nw + self.jr].add(jac)
        K = K.at[self.hr, self.hc].add(hess)
        off = jnp.where(self.h_offdiag, hess, 0.0)
        K = K.at[self.hc, self.hr].add(off)
        factor = self._factorize_matrix(K, self._k25_scaling(dl, du_, p.m))
        return KKTContext(
            hess=hess, jac=jac, pr_diag=pr_diag, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    # -- operator / solve --------------------------------------------------

    def mul(self, ctx: KKTContext, v: KKTVec) -> KKTVec:
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        hv = self.hess_mul(ctx.hess, v.xp[: p.n])
        wx = jnp.concatenate([hv, jnp.zeros((p.nw - p.n,), hv.dtype)])
        wx = wx + ctx.reg * v.xp
        if p.m > 0:
            wx = wx + self.jtprod(ctx.jac, v.y)
            wy = self.jprod(ctx.jac, v.xp) + ctx.du_diag * v.y
        else:
            wy = v.y
        wx = wx - jnp.where(lb, v.zl, 0.0) + jnp.where(ub, v.zu, 0.0)
        wzl = jnp.where(lb, ctx.zl * v.xp + ctx.dl * v.zl, 0.0)
        wzu = jnp.where(ub, ctx.zu * v.xp - ctx.du_ * v.zu, 0.0)
        return KKTVec(xp=wx, y=wy, zl=wzl, zu=wzu)

    def mul_hess_blk(self, ctx: KKTContext, t):
        p = self.prob
        ht = self.hess_mul(ctx.hess, t[: p.n])
        wx = jnp.concatenate([ht, jnp.zeros((p.nw - p.n,), ht.dtype)])
        return wx + t * ctx.pr_diag


class SparseCondensedKKT(SparseKKT):
    """Lifted-KKT condensed system with pair-map JᵀDJ assembly.

    Requires every constraint to carry a slack (all-inequality — the
    RelaxEquality preset, condensed.jl:68-70)."""

    def __init__(self, prob, opts):
        super().__init__(prob, opts)
        p = prob
        assert p.n_eq == 0, (
            "SparseCondensedKKT requires all constraints to be inequalities "
            "(use equality_treatment=RELAX / the SPARSE_CONDENSED preset)"
        )
        # pair map over the *model* jacobian entries (slack entries excluded:
        # they enter D/Σs analytically) — built by the native C++ symbolic
        # module (madnlp_tpu/native/symbolic.cpp) with a numpy fallback
        from ..native import jtdj_pair_map

        rows = np.asarray(p.model.jac_rows)
        cols = np.asarray(p.model.jac_cols)
        pr, pc, pa, pb, pk = jtdj_pair_map(rows, cols, p.m)
        self.pair_r = jnp.asarray(pr)
        self.pair_c = jnp.asarray(pc)
        self.pair_a = jnp.asarray(pa)
        self.pair_b = jnp.asarray(pb)
        self.pair_k = jnp.asarray(pk)
        self.nnz_jac = len(rows)  # model entries (before slack augmentation)

    def sys_size(self) -> int:
        return self.prob.n

    def _diag_buffer(self, pr_diag, du_diag):
        p = self.prob
        sigma_s = pr_diag[p.n :]
        sigma_d = du_diag  # all rows are inequalities
        return sigma_s / (1.0 - sigma_d * sigma_s)

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu):
        p = self.prob
        pr_diag, du_diag = self.aug_diagonals(reg, du_diag, dl, du_, zl, zu)
        D = self._diag_buffer(pr_diag, du_diag)
        jv = jac[: self.nnz_jac]  # model entries; slack tail excluded
        K = jnp.zeros((p.n, p.n))
        idx = jnp.arange(p.n)
        K = K.at[idx, idx].add(pr_diag[: p.n])
        K = K.at[self.hr, self.hc].add(hess)
        off = jnp.where(self.h_offdiag, hess, 0.0)
        K = K.at[self.hc, self.hr].add(off)
        # JᵀDJ via the pair map — one fused scatter-add
        w = D[self.pair_k] * jv[self.pair_a] * jv[self.pair_b]
        K = K.at[self.pair_r, self.pair_c].add(w)
        factor = self._factorize_matrix(K)
        return KKTContext(
            hess=hess, jac=jac, pr_diag=pr_diag, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    def is_inertia_correct(self, pos, zero, neg):
        return (zero == 0) & (neg == 0)

    def solve(self, ctx: KKTContext, b: KKTVec) -> KKTVec:
        """Condensed solve (src/IPM/factorization.jl:143-167) with segment
        J products."""
        p = self.prob
        n = p.n
        w = self.reduce_rhs(ctx, b)
        wx = w.xp[:n]
        ws = w.xp[n:]
        wz = w.y
        sigma_s = ctx.pr_diag[n:]
        D = self._diag_buffer(ctx.pr_diag, ctx.du_diag)
        jv = ctx.jac[: self.nnz_jac]
        jr = self.jr[: self.nnz_jac]
        jc = self.jc[: self.nnz_jac]

        buffer = D * (wz + ws / sigma_s)
        xx = wx.at[jc].add(jv * buffer[jr])
        dx = self._backsolve(ctx.factor, xx)
        jdx = jnp.zeros((p.m,), dx.dtype).at[jr].add(jv * dx[jc])
        dz = -buffer + D * jdx
        ds_out = (ws + dz) / sigma_s
        w = w._replace(xp=jnp.concatenate([dx, ds_out]), y=dz)
        return self.finish_aug_solve(ctx, w, b.zl, b.zu)
