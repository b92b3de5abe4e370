"""Dense reduced-augmented KKT system (TPU re-design of the reference's
``DenseKKTSystem``, ``/root/reference/src/KKT/Dense/augmented.jl``).

The assembled matrix is the reduced system of ``src/KKT/KKTsystem.jl:38-58``:

    [ W + Σx + δwI      0          Aₑᵀ  Aᵢᵀ ] [Δx]
    [ 0                Σs + δwI     0   -I  ] [Δs]
    [ Aₑ                0          -δcI  0  ] [Δy]
    [ Aᵢ               -I           0  -δcI ] [Δz]

stored as one (nw+m, nw+m) symmetric dense matrix; the bound duals (ν, w)
are eliminated and recovered analytically (kernels.jl:182-204).  Assembly is
pure tensor algebra (diag embeddings + one concat), built fresh every
factorization — there is no in-place "transfer", XLA fuses the construction
into the factorization's first touch.

Sign conventions follow ``madnlp_tpu.ipm.kernels`` (positive slacks
``dl = x - xl``, ``du = xu - x``); the algebra was re-derived in those terms
and is verified by the KKT round-trip contract test
(tests/test_kkt.py, mirroring lib/MadNLPTests/src/MadNLPTests.jl:53-110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import dense_solvers as ds
from ..ops.refine import solve_gmres, solve_refine
from ..utils.options import LinearSolver, MadNLPOptions
from .vec import KKTVec


class EquilibratedFactor(NamedTuple):
    """Factor of D·K·D plus the Ruiz scaling vector d.  ``smw`` is the
    optional Sherman–Morrison–Woodbury payload ``(E, T, S_lu)`` used when
    the Hessian carries a compact L-BFGS low-rank part
    (reference: src/IPM/factorization.jl:76-140): the assembled matrix is
    K₀ (σ-diagonal only) and solves are corrected as
    ``x = x₀ − T·S⁻¹·Eᵀx₀`` with ``T = K₀⁻¹Ẽ``, ``S = C + ẼᵀK₀⁻¹Ẽ``,
    ``C = diag(−I, I)``, ``Ẽ = [U V]`` zero-padded to the system size."""

    inner: ds.DenseFactor
    d: jax.Array
    smw: tuple = None
    opband: object = None   # unscaled f64 operator band (banded path): the
    # iterative-refinement operator as block-banded mat-vecs (no scatters)


class KKTContext(NamedTuple):
    """Per-iteration numeric payload of the KKT system."""

    hess: jax.Array      # (n, n) Lagrangian Hessian (x block)
    jac: jax.Array       # (m, nw) augmented Jacobian [J, -E]
    pr_diag: jax.Array   # (nw,) primal diagonal  Σ + reg
    du_diag: jax.Array   # (m,) dual diagonal (≤ 0)
    reg: jax.Array       # (nw,) primal regularization part of pr_diag
    dl: jax.Array        # (nw,) masked x - xl
    du_: jax.Array       # (nw,) masked xu - x
    zl: jax.Array        # (nw,)
    zu: jax.Array        # (nw,)
    factor: ds.DenseFactor


class DenseKKT:
    """Static wrapper: holds the problem structure + options, provides pure
    functions over :class:`KKTContext`."""

    def __init__(self, prob, opts: MadNLPOptions):
        self.prob = prob
        self.opts = opts
        self.solver = opts.linear_solver
        if prob.m == 0 and self.solver in (
            LinearSolver.BLOCK_CHOLESKY, LinearSolver.HYKKT
        ):
            # no dual block to eliminate — plain Cholesky is the same method
            self.solver = LinearSolver.CHOLESKY
        # Mixed precision (the TPU strategy for emulated f64): factorize in
        # `opts.dtype`, keep the operator + Richardson refinement in f64.
        self.fact_dtype = jnp.dtype(opts.dtype)
        sm = opts.solve_mode
        if sm is None:
            import jax as _jax

            sm = "trisolve" if _jax.default_backend() == "cpu" else "inverse"
        self.solve_mode = sm
        # optional NamedSharding for single-problem tensor parallelism of
        # the dense KKT factorization (MadNLPSolver(kkt_sharding=...)):
        # the factor carry is mesh-constrained and GSPMD partitions the
        # trailing GEMMs / inserts panel collectives (ops/ldlt.py)
        self.dense_sharding = None

    def _factorize_matrix(self, K, d_analytic=None, split=None, rr=False):
        """Factorize with a symmetric conditioning scaling D K D (congruence
        — preserves inertia by Sylvester's law).  IPM KKT matrices have
        diagonals spanning ~1/μ², which breaks the f32-factorize +
        f64-refine recipe; the scaling drops the condition number into the
        convergent range (the same enabler used by GPU condensed-IPM work).

        Strategies (opts.kkt_scaling):
        * "ruiz" — 3 sweeps of d ← d/√(row-inf-norm) (default);
        * "k25"  — the analytic √Ξ scaling of the K2.5 formulation
          (scaled_augmented.jl:2-30), supplied by the KKT system via
          ``d_analytic``;
        * "none".
        """
        mode = self.opts.kkt_scaling
        if mode == "k25" and d_analytic is not None:
            d = d_analytic
        elif mode == "ruiz":
            d = jnp.ones((K.shape[0],), K.dtype)
            for _ in range(3):
                Ks = K * (d[:, None] * d[None, :])
                r = jnp.max(jnp.abs(Ks), axis=1)
                # zero rows keep d = 1 (TPU f64 is double-word f32: a
                # diverging scaling overflows at ~1e38 and poisons K)
                d = jnp.where(r > 0.0, d / jnp.sqrt(jnp.maximum(r, 1e-32)), 1.0)
        else:
            d = jnp.ones((K.shape[0],), K.dtype)
        Kf = (K * (d[:, None] * d[None, :])).astype(self.fact_dtype)
        gamma = self.opts.hykkt_gamma
        if gamma is None:
            gamma = 1e4 if self.fact_dtype == jnp.float64 else 1e3
        inner = ds.factorize(
            Kf, self.solver, block=self.opts.ldl_block_size or 64,
            solve_mode=self.solve_mode, split=split, rr=rr,
            gamma=gamma, cg_tol=self.opts.hykkt_cg_tol,
            cg_maxiter=self.opts.hykkt_cg_maxiter,
            hykkt_backend=self._hykkt_backend(),
            sharding=self.dense_sharding,
        )
        return EquilibratedFactor(inner=inner, d=d)

    def _k25_scaling(self, dl, du_, size_dual: int):
        """√Ξ over the primal block, 1 over the dual block
        (kernels.jl:61-63 scaling_factor)."""
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        s = jnp.where(lb, jnp.sqrt(dl), 1.0) * jnp.where(ub, jnp.sqrt(du_), 1.0)
        return jnp.concatenate([s, jnp.ones((size_dual,))])

    def _backsolve(self, factor: "EquilibratedFactor", rhs):
        # K x = b  ⟺  (DKD)(D⁻¹x) = D b
        d = factor.d if rhs.ndim == 1 else factor.d[:, None]
        scaled = (d * rhs).astype(self.fact_dtype)
        out = ds.solve(factor.inner, scaled).astype(rhs.dtype)
        return self._apply_smw(factor, d * out)

    # -- compact L-BFGS low-rank correction (SMW) ---------------------------

    def _apply_smw(self, factor: "EquilibratedFactor", x0):
        if factor.smw is None:
            return x0
        E, T, S_lu = factor.smw
        n = E.shape[0]
        squeeze = x0.ndim == 1
        xm = x0[:, None] if squeeze else x0
        y = E.T @ xm[:n]
        z = jax.scipy.linalg.lu_solve(S_lu, y)
        xm = xm - T @ z
        return xm[:, 0] if squeeze else xm

    def _attach_smw(self, factor: "EquilibratedFactor", lr) -> "EquilibratedFactor":
        """Precompute the SMW payload for the low-rank Hessian part
        ``ΔW = V Vᵀ − U Uᵀ = E C Eᵀ`` at factorization time: 2p backsolves
        (one multi-RHS solve) + one small dense LU."""
        p_mem = lr.U.shape[1]
        n = lr.U.shape[0]
        N = self.sys_size()
        E = jnp.concatenate([lr.U, lr.V], axis=1)            # (n, 2p)
        Epad = jnp.zeros((N, 2 * p_mem), E.dtype).at[:n].set(E)
        T = self._backsolve(factor, Epad)                    # K₀⁻¹ Ẽ
        C = jnp.diag(
            jnp.concatenate([-jnp.ones((p_mem,)), jnp.ones((p_mem,))])
        )
        S = C + E.T @ T[:n]
        S_lu = jax.scipy.linalg.lu_factor(S)
        return factor._replace(smw=(E, T, S_lu))

    def _zero_smw(self, n: int, p_mem: int):
        """Structure-matching zero SMW payload (pytree templates)."""
        N = self.sys_size()
        return (
            jnp.zeros((n, 2 * p_mem)),
            jnp.zeros((N, 2 * p_mem)),
            (
                jnp.eye(2 * p_mem),
                jnp.arange(2 * p_mem, dtype=jnp.int32),
            ),
        )

    def sys_size(self) -> int:
        """Dimension of the assembled matrix."""
        return self.prob.nw + self.prob.m

    def _split(self):
        """Primal/dual block boundary for the range-space factorizations."""
        if self.solver in (LinearSolver.BLOCK_CHOLESKY, LinearSolver.HYKKT):
            return self.prob.nw
        return None

    def _hykkt_backend(self) -> str:
        be = self.opts.hykkt_backend
        if be is None:
            import jax as _jax

            be = "native" if _jax.default_backend() == "cpu" else "ldl"
        return be

    def zero_context(self) -> "KKTContext":
        """A structurally-correct all-zero context (factor shapes included) —
        used to seed the persisted per-iteration context in the State."""
        p = self.prob
        N = self.sys_size()
        factor = EquilibratedFactor(
            inner=ds.zero_factor(
                self.solver, N, self.fact_dtype,
                block=self.opts.ldl_block_size or 64, split=self._split(),
                hykkt_backend=self._hykkt_backend(),
                solve_mode=self.solve_mode,
                cg_tol=self.opts.hykkt_cg_tol,
                cg_maxiter=self.opts.hykkt_cg_maxiter,
            ),
            d=jnp.ones((N,)),
        )
        return KKTContext(
            hess=p.hess_template(),
            jac=p.jac_template(),
            pr_diag=jnp.ones((p.nw,)),
            du_diag=jnp.zeros((p.m,)),
            reg=jnp.ones((p.nw,)),
            dl=jnp.ones((p.nw,)),
            du_=jnp.ones((p.nw,)),
            zl=jnp.zeros((p.nw,)),
            zu=jnp.zeros((p.nw,)),
            factor=factor,
        )

    # -- diagonals (set_aug_diagonal!, kernels.jl:4-27) --------------------

    def aug_diagonals(self, reg, du_diag, dl, du_, zl, zu):
        p = self.prob
        lb = jnp.asarray(p.lb_mask)
        ub = jnp.asarray(p.ub_mask)
        pr_diag = (
            reg
            + jnp.where(lb, zl / dl, 0.0)
            + jnp.where(ub, zu / du_, 0.0)
        )
        return pr_diag, du_diag

    # -- assembly + factorization -----------------------------------------

    def build_and_factorize(
        self, hess, jac, reg, du_diag, dl, du_, zl, zu, rr: bool = False
    ) -> KKTContext:
        p = self.prob
        pr_diag, du_diag = self.aug_diagonals(reg, du_diag, dl, du_, zl, zu)
        n, nw, m = p.n, p.nw, p.m
        W = jnp.zeros((nw, nw), hess.dtype).at[:n, :n].set(hess)
        W = W + jnp.diag(pr_diag)
        K = jnp.block(
            [
                [W, jac.T],
                [jac, jnp.diag(du_diag)],
            ]
        ) if m > 0 else W
        factor = self._factorize_matrix(
            K, self._k25_scaling(dl, du_, m), split=self._split(), rr=rr
        )
        return KKTContext(
            hess=hess, jac=jac, pr_diag=pr_diag, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    # -- inertia -----------------------------------------------------------

    def inertia(self, ctx: KKTContext):
        return ds.inertia(ctx.factor.inner)

    def is_inertia_correct(self, pos, zero, neg):
        """num_pos == num_variables && num_zero == 0 (KKTsystem.jl:242-244)."""
        return (zero == 0) & (pos == self.prob.nw)

    def has_inertia(self) -> bool:
        return ds.has_inertia(self.solver)

    # -- solve -------------------------------------------------------------

    def reduce_rhs(self, ctx: KKTContext, w: KKTVec) -> KKTVec:
        """Fold bound-dual rows into the primal RHS (kernels.jl:182-195)."""
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        xp = (
            w.xp
            + jnp.where(lb, w.zl / ctx.dl, 0.0)
            + jnp.where(ub, w.zu / ctx.du_, 0.0)
        )
        return w._replace(xp=xp)

    def finish_aug_solve(self, ctx: KKTContext, w: KKTVec, pzl, pzu) -> KKTVec:
        """Recover Δν, Δw from the reduced solution (kernels.jl:198-204)."""
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        dzl = jnp.where(lb, (pzl - ctx.zl * w.xp) / ctx.dl, 0.0)
        dzu = jnp.where(ub, (ctx.zu * w.xp - pzu) / ctx.du_, 0.0)
        return w._replace(zl=dzl, zu=dzu)

    def solve(self, ctx: KKTContext, b: KKTVec) -> KKTVec:
        """solve_kkt! for the reduced dense system
        (src/IPM/factorization.jl:41-46)."""
        m = self.prob.m
        w = self.reduce_rhs(ctx, b)
        if m > 0:
            rhs = jnp.concatenate([w.xp, w.y])
            sol = self._backsolve(ctx.factor, rhs)
            w = w._replace(xp=sol[: self.prob.nw], y=sol[self.prob.nw :])
        else:
            w = w._replace(xp=self._backsolve(ctx.factor, w.xp))
        return self.finish_aug_solve(ctx, w, b.zl, b.zu)

    # -- operator application (for iterative refinement) -------------------

    def mul(self, ctx: KKTContext, v: KKTVec) -> KKTVec:
        """w = K v with the *unreduced* operator (factorization.jl:303-324 +
        _kktmul!, kernels.jl:161-180), in positive-slack convention."""
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        n = p.n
        hv = ctx.hess @ v.xp[:n]
        wx = jnp.concatenate([hv, jnp.zeros((p.nw - n,), hv.dtype)])
        wx = wx + ctx.reg * v.xp
        if p.m > 0:
            wx = wx + ctx.jac.T @ v.y
            wy = ctx.jac @ v.xp + ctx.du_diag * v.y
        else:
            wy = v.y
        wx = wx - jnp.where(lb, v.zl, 0.0) + jnp.where(ub, v.zu, 0.0)
        wzl = jnp.where(lb, ctx.zl * v.xp + ctx.dl * v.zl, 0.0)
        wzu = jnp.where(ub, ctx.zu * v.xp - ctx.du_ * v.zu, 0.0)
        return KKTVec(xp=wx, y=wy, zl=wzl, zu=wzu)

    def mul_hess_blk(self, ctx: KKTContext, t):
        """wx = (W + Σ) t for the inertia-free curvature test
        (factorization.jl:326-331)."""
        p = self.prob
        n = p.n
        ht = ctx.hess @ t[:n]
        wx = jnp.concatenate([ht, jnp.zeros((p.nw - n,), ht.dtype)])
        return wx + t * ctx.pr_diag

    # -- refined solve -----------------------------------------------------

    def strip_context(self, ctx: KKTContext) -> KKTContext:
        """Drop iteration-local heavyweight payloads before the context is
        persisted into the solver State (overridden by the banded path to
        strip the ~20 MB f64 operator band: it is only consumed by ``mul``
        during the refinement of the SAME iteration, and carrying it
        through the solve loop's switch/cond boundaries costs copies)."""
        return ctx

    def solve_refine(self, ctx: KKTContext, b: KKTVec, mu=None):
        """Refined solve; ``mu`` (optional, traced) enables the μ-aware
        stopping target (RichardsonOptions.mu_scaled): refinement beyond
        O(μ) cannot change the accepted IPM step, so the effective tol is
        ``max(tol, min(mu_tol_cap, mu_tol_factor·μ))`` — ~1 Richardson
        sweep/iteration saved at the flagship with an identical
        trajectory (GMRES keeps the static tol: jax gmres needs a
        concrete tolerance)."""
        rich = self.opts.iterator == "richardson"
        refine = solve_refine if rich else solve_gmres
        tol = self.opts.richardson_tol
        ro = self.opts.richardson
        if rich and mu is not None and ro.mu_scaled:
            tol = jnp.maximum(tol, jnp.minimum(ro.mu_tol_cap,
                                               ro.mu_tol_factor * mu))
        return refine(
            lambda w: self.solve(ctx, w),
            lambda x: self.mul(ctx, x),
            b,
            max_iter=ro.max_iter,
            tol=tol,
            acceptable_tol=self.opts.richardson_acceptable_tol,
        )

    def jtprod(self, jac, y):
        """jacl = Aᵀ y over the full primal space."""
        if self.prob.m == 0:
            return jnp.zeros((self.prob.nw,), jac.dtype)
        return jac.T @ y
