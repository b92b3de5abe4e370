"""Schur-complement KKT system for two-stage (block-arrowhead) problems —
TPU re-design of ``SchurComplementKKTSystem``
(``/root/reference/src/KKT/Schur/schur.jl``; GPU batched variant
``lib/MadNLPGPU/ext/MadNLPGPUCUDAExt/cuda_schur.jl``).

    K = [ A_1                C_1 ]      A_k: per-scenario KKT block
        [      ⋱              ⋮  ]           (vars v_k + slacks s_k + duals)
        [           A_N      C_N ]      C_k: coupling block vs d
        [ C_1ᵀ  …   C_Nᵀ      S₀ ]      S₀ = H_dd + Σ_d

Where the reference factorizes scenario blocks in a Julia thread loop and
the GPU port uses one batched cuDSS call, here **all N blocks factorize as
one vmapped blocked-LDLᵀ** — a single batched kernel on the MXU — and the
Schur complement ``S = S₀ − Σ_k C_kᵀ A_k⁻¹ C_k`` is one batched GEMM +
reduction.  With the scenario axis sharded over a device mesh, that
reduction is exactly a ``psum`` and everything else is embarrassingly
parallel (SURVEY.md §3.5: the two reduction points are the only
cross-device communication).

Block extraction from the flat masked state arrays uses *static* numpy
index maps computed at construction (the reference's symbolic
classification, schur.jl:286-700, reduced to reshapes/gathers that XLA
folds away).

Inertia via Haynsworth: inertia(K) = Σ_k inertia(A_k) + inertia(S).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.instances.twostage import TwoStageStructure
from ..ops import dense_solvers as ds
from ..ops import ldlt
from .dense import DenseKKT, EquilibratedFactor, KKTContext
from .vec import KKTVec


class SchurFactor(NamedTuple):
    Lb: jax.Array     # (N, bs', bs') batched unit-lower factors (padded)
    db: jax.Array     # (N, bs') batched pivots
    G: jax.Array      # (N, bs, nd)  A_k⁻¹ C_k
    S_fac: object  # EquilibratedFactor of the (nd, nd) Schur complement


class SchurBandedFactor(NamedTuple):
    """Factor payload when the per-scenario blocks run the flagship
    block-banded LDLᵀ (``schur_block_solver="banded"``) — the single-chip
    composition of the two flagship mechanisms: banded factorization
    inside each block, Schur scenario decomposition (and its mesh
    sharding) across blocks (reference analogue: per-scenario MUMPS under
    Schur, src/KKT/Schur/schur.jl:953-1001)."""

    band: jax.Array   # (N, nbp, bw+1, b, b) batched banded factors
    invL: jax.Array   # (N, nbp, b, b)
    d: jax.Array      # (N, nb·b) batched pivots
    G: jax.Array      # (N, bs, nd)  A_k⁻¹ C_k (original block coords)
    S_fac: object  # EquilibratedFactor of the (nd, nd) Schur complement


class SchurKKT(DenseKKT):
    """``scenario_sharding``: optional ``NamedSharding`` with a single mesh
    axis for the leading (scenario) dimension of all batched block arrays.
    The sharding constraints make XLA GSPMD partition the batched
    factorizations/backsolves across the mesh and turn the two Schur
    reductions into ``all-reduce``s over ICI — the 'annotate shardings, let
    the compiler insert collectives' recipe, replacing the reference's
    threaded scenario loop (schur.jl:953-988)."""

    def __init__(self, prob, opts, structure: TwoStageStructure,
                 scenario_sharding=None):
        super().__init__(prob, opts)
        self.ts = structure
        self.scenario_sharding = scenario_sharding
        N, nv, nd, ms = structure.N, structure.nv, structure.nd, structure.ms
        p = prob
        assert p.n == N * nv + nd, "variable count mismatch with structure"
        assert p.m == N * ms, "constraint count mismatch with structure"
        im = p.ineq_mask.reshape(N, ms)
        assert (im == im[0]).all(), "scenario inequality patterns must match"
        self.msi = int(im[0].sum())
        self.blkp = nv + self.msi
        self.bs = self.blkp + ms
        # static index maps
        v_idx = np.arange(N * nv).reshape(N, nv)
        s_idx = p.n + np.arange(N * self.msi).reshape(N, self.msi)
        self.pcols = np.concatenate([v_idx, s_idx], axis=1)   # (N, blkp)
        self.d_idx = np.arange(N * nv, N * nv + nd)
        self.ldl_block = min(self.opts.ldl_block_size or 64, max(8, self.bs))
        self.block_banded = opts.schur_block_solver == "banded"
        if self.block_banded:
            self._init_block_band()

    # -- banded per-scenario blocks (schur_block_solver="banded") ----------

    def _init_block_band(self):
        """Symbolic phase of the banded block backend: recover the
        per-scenario block sparsity by a two-point numeric probe (the
        dense callback exposes no symbolic pattern; two generic points
        make a coincidental structural-nonzero-evaluating-to-zero a
        measure-zero²-probability event, and the f64 Richardson operator
        — which uses the exact dense KKT — would surface any miss as a
        non-contracting refinement), interleave-order it
        (ops/banded.py:kkt_interleaved_ordering), and precompute the
        dense-block → band-storage gather."""
        from ..ipm.problem import Scaling
        from ..ops.banded import BandStructure, kkt_interleaved_ordering

        p, ts = self.prob, self.ts
        N, nv, ms = ts.N, ts.nv, ts.ms
        blkp, bs = self.blkp, self.bs
        rng = np.random.default_rng(7)
        scal = Scaling(jnp.ones(()), jnp.ones((p.m,)))
        Hp = np.zeros((nv, nv), bool)
        Jpat = np.zeros((ms, blkp), bool)
        for trial in range(2):
            w0 = jnp.asarray(rng.uniform(0.4, 1.3, p.nw))
            y = jnp.asarray(rng.standard_normal(p.m))
            jac = np.asarray(p.eval_jac(scal, w0))
            hess = np.asarray(p.eval_lag_hess(scal, w0, y))
            for k in range(N):
                Hp |= hess[k * nv : (k + 1) * nv, k * nv : (k + 1) * nv] != 0
                Jpat |= jac[k * ms : (k + 1) * ms][:, self.pcols[k]] != 0
        hr, hc = np.nonzero(Hp | np.eye(nv, dtype=bool))
        jr, jc = np.nonzero(Jpat)
        perm = kkt_interleaved_ordering(hr, hc, jr, jc, blkp, ms)
        diag = np.arange(bs)
        rows = np.concatenate([diag, blkp + jr, hr])
        cols = np.concatenate([diag, jc, hc])
        b = 32 if bs <= 512 else 64
        bb = BandStructure(rows, cols, bs, block=b, perm=perm)
        self.bband = bb
        # dense-block → band gather: band[j, k, r, c] = Ap[(j+k)b+r, jb+c]
        # in permuted coords; out-of-range scalar indices read the padding
        # identity (matches BandStructure.assemble's pad_idx)
        j = np.arange(bb.nbp)[:, None, None, None]
        k = np.arange(bb.bw + 1)[None, :, None, None]
        r = np.arange(b)[None, None, :, None]
        c = np.arange(b)[None, None, None, :]
        R = (j + k) * b + r
        C = j * b + c
        valid = (R < bs) & (C < bs)
        padeye = (~valid) & (R == C) & (R < bb.nb * b)
        self._bb_gr = jnp.asarray(perm[np.clip(R, 0, bs - 1)])
        self._bb_gc = jnp.asarray(perm[np.clip(C, 0, bs - 1)])
        self._bb_valid = jnp.asarray(valid)
        self._bb_padeye = jnp.asarray(padeye)
        self._bb_perm = jnp.asarray(bb.perm)
        self._bb_iperm = jnp.asarray(bb.iperm)

    def _extract_band(self, A):
        """(N, bs, bs) dense blocks → (N, nbp, bw+1, b, b) band storage."""
        vals = A[:, self._bb_gr, self._bb_gc]
        return jnp.where(
            self._bb_valid[None], vals,
            self._bb_padeye[None].astype(A.dtype),
        )

    def sys_size(self) -> int:
        return self.prob.nw + self.prob.m

    def _shard(self, x):
        if self.scenario_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self.scenario_sharding)

    # -- block extraction --------------------------------------------------

    def _blocks(self, hess, jac, pr_diag, du_diag):
        ts = self.ts
        N, nv, nd, ms = ts.N, ts.nv, ts.nd, ts.ms
        blkp, bs = self.blkp, self.bs
        Nnv = N * nv
        pcols = jnp.asarray(self.pcols)
        d_idx = jnp.asarray(self.d_idx)

        Hr = hess[:Nnv, :Nnv].reshape(N, nv, N, nv)
        Hvv = Hr[jnp.arange(N), :, jnp.arange(N), :]          # (N, nv, nv)
        Hvd = hess[:Nnv, Nnv:].reshape(N, nv, nd)             # (N, nv, nd)
        Hdd = hess[Nnv:, Nnv:]                                # (nd, nd)

        Jr = jac.reshape(N, ms, self.prob.nw)
        Jp = jnp.take_along_axis(Jr, pcols[:, None, :], axis=2)   # (N, ms, blkp)
        Jd = Jr[:, :, d_idx]                                      # (N, ms, nd)

        pr_p = pr_diag[pcols]                                  # (N, blkp)
        pr_d = pr_diag[d_idx]
        du = du_diag.reshape(N, ms)

        A = jnp.zeros((N, bs, bs), hess.dtype)
        A = A.at[:, :nv, :nv].set(Hvv)
        idx = jnp.arange(blkp)
        A = A.at[:, idx, idx].add(pr_p)
        A = A.at[:, blkp:, :blkp].set(Jp)
        A = A.at[:, :blkp, blkp:].set(jnp.swapaxes(Jp, 1, 2))
        jdx = jnp.arange(ms)
        A = A.at[:, blkp + jdx, blkp + jdx].set(du)

        C = jnp.zeros((N, bs, nd), hess.dtype)
        C = C.at[:, :nv, :].set(Hvd)
        C = C.at[:, blkp:, :].set(Jd)

        S0 = Hdd + jnp.diag(pr_d)
        return A, C, S0

    # -- assembly + factorization (schur.jl:927-1001) ----------------------

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu, rr=False):
        p = self.prob
        pr_diag, du_diag = self.aug_diagonals(reg, du_diag, dl, du_, zl, zu)
        A, C, S0 = self._blocks(hess, jac, pr_diag, du_diag)
        dt = self.fact_dtype
        A = self._shard(A.astype(dt))
        Cf = self._shard(C.astype(dt))
        if self.block_banded:
            from ..ops.banded import banded_factorize, banded_solve

            band = self._shard(self._extract_band(A))
            fac = jax.vmap(lambda bd: banded_factorize(self.bband, bd))(band)
            Cp = Cf[:, self._bb_perm, :]
            Gp = jax.vmap(lambda f, c: banded_solve(self.bband, f, c))(fac, Cp)
            G = self._shard(Gp[:, self._bb_iperm, :])          # (N, bs, nd)
            S = S0 - jnp.einsum("kij,kil->jl", Cf, G).astype(S0.dtype)
            S_fac = self._factorize_matrix(S)
            factor = SchurBandedFactor(
                band=self._shard(fac.band), invL=self._shard(fac.invL),
                d=self._shard(fac.d), G=G, S_fac=S_fac,
            )
            return KKTContext(
                hess=hess, jac=jac, pr_diag=pr_diag, du_diag=du_diag,
                reg=reg, dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
            )

        def fac_arrays(a):
            f = ldlt.ldlt_factorize(a, block=self.ldl_block)
            return f.L, f.d

        Lb, db = jax.vmap(fac_arrays)(A)
        Lb, db = self._shard(Lb), self._shard(db)
        G = self._shard(
            jax.vmap(
                lambda L, d, c: ldlt.ldlt_solve(ldlt.LDLFactor(L, d, self.bs), c)
            )(Lb, db, Cf)
        )                                                      # (N, bs, nd)
        # S = S0 − Σ_k C_kᵀ A_k⁻¹ C_k  (one einsum; psum under sharding)
        S = S0 - jnp.einsum("kij,kil->jl", Cf, G).astype(S0.dtype)
        S_fac = self._factorize_matrix(S)
        factor = SchurFactor(Lb=Lb, db=db, G=G, S_fac=S_fac)
        return KKTContext(
            hess=hess, jac=jac, pr_diag=pr_diag, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    def zero_context(self):
        p = self.prob
        base = super().zero_context()
        N, bs, nd = self.ts.N, self.bs, self.ts.nd
        dt = self.fact_dtype
        bsp = max(1, -(-bs // self.ldl_block)) * self.ldl_block
        if self.block_banded:
            bb = self.bband
            factor = SchurBandedFactor(
                band=jnp.zeros((N, bb.nbp, bb.bw + 1, bb.b, bb.b), dt),
                invL=jnp.zeros((N, bb.nbp, bb.b, bb.b), dt),
                d=jnp.ones((N, bb.nb * bb.b), dt),
                G=jnp.zeros((N, bs, nd), dt),
                S_fac=EquilibratedFactor(
                    inner=ds.zero_factor(
                        self.solver, nd, dt, self.opts.ldl_block_size or 64,
                        hykkt_backend=self._hykkt_backend(),
                        solve_mode=self.solve_mode,
                        cg_tol=self.opts.hykkt_cg_tol,
                        cg_maxiter=self.opts.hykkt_cg_maxiter,
                    ),
                    d=jnp.ones((nd,)),
                ),
            )
            return base._replace(factor=factor)
        factor = SchurFactor(
            Lb=jnp.zeros((N, bsp, bsp), dt),
            db=jnp.zeros((N, bsp), dt),
            G=jnp.zeros((N, bs, nd), dt),
            S_fac=EquilibratedFactor(
                inner=ds.zero_factor(
                    self.solver, nd, dt, self.opts.ldl_block_size or 64,
                    hykkt_backend=self._hykkt_backend(),
                    solve_mode=self.solve_mode,
                    cg_tol=self.opts.hykkt_cg_tol,
                    cg_maxiter=self.opts.hykkt_cg_maxiter,
                ),
                d=jnp.ones((nd,)),
            ),
        )
        return base._replace(factor=factor)

    # -- inertia (Haynsworth additivity) -----------------------------------

    def inertia(self, ctx: KKTContext):
        f = ctx.factor
        bs = self.bs
        if self.block_banded:
            from ..ops.banded import BandedFactor, banded_inertia

            pos_b, zero_b, neg_b = jax.vmap(
                lambda bd, il, d: banded_inertia(
                    self.bband, BandedFactor(bd, il, d)
                )
            )(f.band, f.invL, f.d)
        else:
            pos_b, zero_b, neg_b = jax.vmap(
                lambda L, d: ldlt.ldlt_inertia(ldlt.LDLFactor(L, d, bs))
            )(f.Lb, f.db)
        ps, zs, ns_ = ds.inertia(f.S_fac.inner)
        return (
            jnp.sum(pos_b) + ps,
            jnp.sum(zero_b) + zs,
            jnp.sum(neg_b) + ns_,
        )

    def has_inertia(self):
        return True

    # -- solve (schur.jl:1007-1109) ----------------------------------------

    def solve(self, ctx: KKTContext, b: KKTVec) -> KKTVec:
        p = self.prob
        ts = self.ts
        f: SchurFactor = ctx.factor
        dt = self.fact_dtype
        w = self.reduce_rhs(ctx, b)
        pcols = jnp.asarray(self.pcols)
        d_idx = jnp.asarray(self.d_idx)

        r_p = w.xp[pcols]                               # (N, blkp)
        r_y = w.y.reshape(ts.N, ts.ms)
        r_k = self._shard(jnp.concatenate([r_p, r_y], axis=1).astype(dt))  # (N, bs)
        r_d = w.xp[d_idx].astype(dt)

        if self.block_banded:
            from ..ops.banded import BandedFactor, banded_solve

            t = jax.vmap(
                lambda bd, il, d, rr: banded_solve(
                    self.bband, BandedFactor(bd, il, d), rr
                )
            )(f.band, f.invL, f.d, r_k[:, self._bb_perm])
            t = t[:, self._bb_iperm]                    # forward eliminate
        else:
            solve_b = jax.vmap(
                lambda L, d, rr: ldlt.ldlt_solve(
                    ldlt.LDLFactor(L, d, self.bs), rr
                )
            )
            t = solve_b(f.Lb, f.db, r_k)                # forward eliminate
        rd2 = r_d - jnp.einsum("kij,ki->j", f.G, r_k)   # reduction (psum point)
        dd = self._backsolve(f.S_fac, rd2)              # dense coupling solve
        blk = t - jnp.einsum("kij,j->ki", f.G, dd)      # back-substitute

        xp = jnp.zeros_like(w.xp)
        xp = xp.at[pcols].set(blk[:, : self.blkp].astype(w.xp.dtype))
        xp = xp.at[d_idx].set(dd.astype(w.xp.dtype))
        y = blk[:, self.blkp :].reshape(-1).astype(w.y.dtype)
        w = w._replace(xp=xp, y=y)
        return self.finish_aug_solve(ctx, w, b.zl, b.zu)
