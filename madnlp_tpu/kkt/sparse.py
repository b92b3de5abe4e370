"""Sparse-callback KKT systems — static-scatter assembly from COO value
arrays (TPU re-design of ``SparseKKTSystem`` / ``SparseCondensedKKTSystem``,
``/root/reference/src/KKT/Sparse/{augmented,condensed}.jl``).

The reference's symbolic phase builds index maps once (``coo_to_csc`` +
``dptr/hptr/jptr``, condensed.jl:201-301) and then every assembly is a
scatter through those maps — already the perfect formulation for XLA: here
the maps are host-side numpy arrays baked into the trace, and assemblies
are single fused ``scatter-add``s.

Storage/factorization: dense scatter assembly by default, or — with
``linear_solver=BANDED`` — the true sparse direct factorization
(block-banded LDLᵀ, ``ops/banded.py``; fused Pallas VMEM kernels on TPU,
``ops/pallas_banded.py``), where assembly scatters straight into band
storage through host-precomputed flat maps.

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

from ..ops.banded import (
    BandStructure,
    banded_factorize,
    banded_inertia,
    banded_solve,
    banded_symmetrize,
    banded_symv,
    ruiz_band,
    ruiz_coo,
    scale_band,
)
from ..ipm.quasi_newton import LowRankHessian
from ..utils.options import HessianApproximation, LinearSolver
from .dense import DenseKKT, EquilibratedFactor, KKTContext
from .vec import KKTVec


def _sorted_scatter_map(idx: np.ndarray):
    """(gather_order, sorted_targets) for a static scatter map — TPU
    scatter-adds with sorted target indices lower to a fast path, so every
    hot scatter gathers its values through a host-precomputed sort first
    and passes ``indices_are_sorted=True``."""
    idx = np.asarray(idx)
    order = np.argsort(idx, kind="stable")
    return jnp.asarray(order), jnp.asarray(idx[order])


def resolve_banded_config(N: int, W: int, opts, platform: str):
    """Jointly resolve (block size b, banded backend) for a band of scalar
    bandwidth ``W`` on ``platform`` — the backend-feasibility guard the
    reference's smart presets always provide (src/IPM/options.jl:209-228:
    a resolved configuration is always a *working* one).

    Rules, in order:

    1. an explicit ``banded_backend="xla"`` never needs a check, and
       "pallas_interpret" (the CPU interpreter — no Mosaic alignment or
       scoped-VMEM constraints) is exempt too; explicit "pallas" goes
       through the same feasibility search as "auto" (an unrunnable
       config is never returned);
    2. "auto" on TPU wants the streaming Pallas kernels, which require
       ``b % 128 == 0`` (Mosaic lane-aligned HBM DMA) AND the scoped-VMEM
       feasibility of `ops.pallas_banded_stream.stream_fits_vmem` — the
       window/temporary footprint grows as O((bw·b)²), so wide bands
       (case118x4 ring: W=779 → bw=4 at b=256 → 17.9 MB > the 16 MB
       scoped limit, the BENCH_r04 rc=1) must re-block smaller;
    3. candidate blocks are the preset b plus smaller multiples of 128 —
       smaller b shrinks the window toward W² while keeping the kernel;
    4. if the user pinned ``banded_block_size``, it is never overridden —
       infeasible geometry falls back to the XLA fori_loop backend, which
       has no VMEM scratch at all.

    Pure host-side function of (N, W, opts, platform) so the CPU test
    suite can assert feasibility of every bench-default geometry without
    a TPU (tests/test_vmem_guard.py).
    """
    from ..ops.pallas_banded_stream import stream_fits_vmem

    backend = opts.banded_backend
    if backend == "auto":
        backend = "pallas" if platform == "tpu" else "xla"
    b0 = opts.resolved_banded_block(N)
    if backend != "pallas":
        return b0, backend

    def geom(b):
        bw = max(1, -(-W // b)) if W > 0 else 1
        nbp = max(1, -(-N // b)) + bw
        return bw, nbp

    if opts.banded_block_size is not None:
        candidates = [b0]
    else:
        candidates = [b0] + [c for c in (256, 128) if c < b0]
    for b in candidates:
        if b % 128 != 0:
            continue  # Mosaic: HBM DMA slices must be 128-lane aligned
        bw, nbp = geom(b)
        if stream_fits_vmem(b, bw, nbp):
            return b, backend
    # no feasible Pallas geometry — the XLA band loop always works
    return b0, "xla"


class SparseKKT(DenseKKT):
    """Reduced augmented KKT with scatter assembly from sparse callbacks."""

    # the assembled band equals the augmented system [W+Σ Jᵀ; J D] — enables
    # the scatter-free banded refinement operator (banded_symv)
    _band_is_augmented = True

    def __init__(self, prob, opts):
        super().__init__(prob, opts)
        p = prob
        self.jr = jnp.asarray(p.jac_rows_aug)
        self.jc = jnp.asarray(p.jac_cols_aug)
        self.jt_order, self.jc_sorted = _sorted_scatter_map(p.jac_cols_aug)
        self.jp_order, self.jr_sorted = _sorted_scatter_map(p.jac_rows_aug)
        # cumsum segment-sum maps for jtprod/jprod (see jtprod docstring):
        # boundaries of each output's contributor range in sorted order,
        # plus the row/col index pre-composed with the sort
        jt_order_np = np.asarray(self.jt_order)
        jc_sorted_np = np.asarray(self.jc_sorted)
        self._jt_rows_sorted = jnp.asarray(
            np.asarray(p.jac_rows_aug)[jt_order_np])
        self._jt_starts = jnp.asarray(
            np.searchsorted(jc_sorted_np, np.arange(p.nw)))
        self._jt_ends = jnp.asarray(
            np.searchsorted(jc_sorted_np, np.arange(p.nw) + 1))
        jp_order_np = np.asarray(self.jp_order)
        jr_sorted_np = np.asarray(self.jr_sorted)
        self._jp_cols_sorted = jnp.asarray(
            np.asarray(p.jac_cols_aug)[jp_order_np])
        self._jp_starts = jnp.asarray(
            np.searchsorted(jr_sorted_np, np.arange(p.m)))
        self._jp_ends = jnp.asarray(
            np.searchsorted(jr_sorted_np, np.arange(p.m) + 1))
        # compact L-BFGS: the Hessian block is σI (+ SMW low-rank at solve
        # time) — the assembled pattern is just the diagonal
        self.lowrank = (
            opts.hessian_approximation == HessianApproximation.COMPACT_LBFGS
        )
        hr, hc = self._hess_pattern()
        self.hr = jnp.asarray(hr)
        self.hc = jnp.asarray(hc)
        self.h_offdiag = jnp.asarray(hr != hc)
        self.hr_order, self.hr_sorted = _sorted_scatter_map(hr)
        self.hc_order, self.hc_sorted = _sorted_scatter_map(hc)
        self.banded = opts.linear_solver == LinearSolver.BANDED
        self.arrow = opts.linear_solver == LinearSolver.BLOCK_ARROW
        self.mf = opts.linear_solver == LinearSolver.MULTIFRONTAL
        self.sparse_direct = self.banded or self.arrow or self.mf
        if self.banded:
            self._init_band_structure()
        elif self.arrow:
            self._init_arrow_structure()
        elif self.mf:
            self._init_nd_structure()

    def _hess_pattern(self):
        p = self.prob
        if self.lowrank:
            diag = np.arange(p.n, dtype=np.int64)
            return diag, diag
        return np.asarray(p.hess_rows), np.asarray(p.hess_cols)

    # -- block-banded backend (true sparse factorization) -------------------

    def _band_pattern(self):
        """Lower-COO pattern of the assembled matrix in ORIGINAL ordering.
        Each symmetric entry appears exactly once."""
        p = self.prob
        N = p.nw + p.m
        diag = np.arange(N, dtype=np.int64)
        hr, hc = self._hess_pattern()
        rows = np.concatenate([diag, p.nw + np.asarray(p.jac_rows_aug), hr])
        cols = np.concatenate([diag, np.asarray(p.jac_cols_aug), hc])
        return rows, cols, N

    def _band_ordering(self):
        """Quasidefinite-preserving interleaved ordering (see
        ops/banded.py:kkt_interleaved_ordering) for the augmented system."""
        from ..ops.banded import kkt_interleaved_ordering

        p = self.prob
        hr, hc = self._hess_pattern()
        return kkt_interleaved_ordering(
            hr, hc, p.jac_rows_aug, p.jac_cols_aug, p.nw, p.m,
        )

    def _init_band_structure(self):
        import jax as _jax

        rows, cols, N = self._band_pattern()
        perm = self._band_ordering()
        # joint (block, backend) resolution with scoped-VMEM feasibility
        # (resolve_banded_config): bandwidth W is permutation-determined,
        # independent of the block size, so it can steer the choice
        iperm = np.empty(N, dtype=np.int64)
        iperm[perm] = np.arange(N)
        W = int(np.abs(iperm[rows] - iperm[cols]).max(initial=0))
        block, backend = resolve_banded_config(
            N, W, self.opts, _jax.default_backend()
        )
        self.bstruct = BandStructure(rows, cols, N, block=block, perm=perm)
        band_idx = self.bstruct.map(rows, cols)
        self.band_order, self.band_idx_sorted = _sorted_scatter_map(band_idx)
        # gather-formulation assembly (round 4): the sorted scatter-add
        # was the single largest slice of the on-chip factorize (4.7 of
        # 5.6 ms at nb=600) — TPU scatters serialize; static gathers don't
        self._band_gather = self.bstruct.gather_assembly(band_idx)
        self._bperm = jnp.asarray(self.bstruct.perm)
        self._biperm = jnp.asarray(self.bstruct.iperm)
        # backend: fused streaming Pallas kernels on TPU (band in HBM,
        # rolling bw+1-column window in VMEM); backend choice was resolved
        # jointly with the block size above
        self.banded_backend_resolved = backend
        if backend in ("pallas", "pallas_interpret"):
            import functools

            from ..ops import pallas_banded_stream as pb

            interp = backend == "pallas_interpret"
            self._band_factorize = functools.partial(
                pb.pallas_banded_factorize_stream, interpret=interp
            )
            self._band_solve = functools.partial(
                pb.pallas_banded_solve_stream, interpret=interp
            )
        else:
            self._band_factorize = banded_factorize
            self._band_solve = banded_solve
        # SPIKE/nested-dissection-over-band partitioning (ops/spike.py):
        # cuts the sequential pivot chain of the banded factorize/solve by
        # P at the cost of ~3x the flops — replaces the per-column
        # factorize/solve above (interiors run the XLA banded kernel
        # under vmap)
        self._spike = None
        nparts = self.opts.banded_partitions
        if nparts:
            from ..ops.spike import SpikeStructure, spike_solve

            p = self.prob
            rows, cols, N = self._band_pattern()
            dual_idx = (
                p.nw + np.arange(p.m)
                if (self._band_is_augmented and p.m)
                else None
            )
            try:
                sp = SpikeStructure(
                    rows, cols, N, self.bstruct.perm, self.bstruct.b,
                    max(nparts, 0), dual_idx=dual_idx,
                )
            except AssertionError:
                sp = None
            if sp is not None and (nparts > 0 or sp.P >= 3):
                self._spike = sp
                self._spike_rows = jnp.asarray(rows)
                self._spike_cols = jnp.asarray(cols)
                self._spike_order, self._spike_idx_sorted = \
                    _sorted_scatter_map(sp.map(rows, cols))
                self._band_solve = (
                    lambda _bs, f, rhs: spike_solve(sp, f, rhs)
                )

    # -- block-arrowhead backend (batched nested-dissection factorization) --

    def _init_arrow_structure(self):
        from ..ops.blockarrow import ArrowStructure

        rows, cols, N = self._band_pattern()
        self.astruct = ArrowStructure(
            rows, cols, N,
            perm=self._band_ordering(),
            nparts=self.opts.arrow_nparts,
            ldl_block=self.opts.ldl_block_size or 64,
        )
        # optional NamedSharding over the block axis: the batched block
        # factorizations run device-local and the Schur-complement einsum
        # all-reduces over the mesh — single-problem model parallelism
        # (set via MadNLPSolver(arrow_sharding=...))
        self.arrow_sharding = None
        fidx = self.astruct.map(rows, cols)
        self.arrow_order, self.arrow_idx_sorted = _sorted_scatter_map(fidx)
        self._ar_rows = jnp.asarray(rows)
        self._ar_cols = jnp.asarray(cols)
        self._ar_rowmap = _sorted_scatter_map(rows)
        self._ar_colmap = _sorted_scatter_map(cols)

    def _arrow_factorize_coo(self, vals, d_analytic=None):
        """Ruiz/K2.5 congruence scaling on the COO values, one fused sorted
        scatter into (blocks, couplings, separator) storage, then the batched
        arrowhead factorization (ops/blockarrow.py)."""
        from ..ops.blockarrow import arrow_factorize

        ast = self.astruct
        mode = self.opts.kkt_scaling
        if mode == "k25" and d_analytic is not None:
            d = d_analytic
        elif mode == "ruiz":
            d = ruiz_coo(
                vals, self._ar_rows, self._ar_cols, ast.N,
                row_map=self._ar_rowmap, col_map=self._ar_colmap,
            )
        else:
            d = jnp.ones((ast.N,), vals.dtype)
        sv = vals * d[self._ar_rows] * d[self._ar_cols]
        Ablk, C, Asep = ast.assemble(
            self.arrow_idx_sorted, sv[self.arrow_order], sorted_indices=True
        )
        Ablk = Ablk.astype(self.fact_dtype)
        C = C.astype(self.fact_dtype)
        if self.arrow_sharding is not None:
            import jax as _jax

            Ablk = _jax.lax.with_sharding_constraint(Ablk, self.arrow_sharding)
            C = _jax.lax.with_sharding_constraint(C, self.arrow_sharding)
        inner = arrow_factorize(ast, Ablk, C, Asep.astype(self.fact_dtype))
        return EquilibratedFactor(inner=inner, d=d)

    # -- multifrontal backend (multilevel nested-dissection LDLᵀ) ------------

    def _init_nd_structure(self):
        from ..ops.ndtree import NDStructure

        rows, cols, N = self._band_pattern()
        self.ndstruct = NDStructure(
            rows, cols, N,
            perm=self._band_ordering(),
            leaf_size=self.opts.nd_leaf_size,
            ldl_block=self.opts.ldl_block_size or 64,
            max_levels=self.opts.nd_max_levels,
        )
        fidx = self.ndstruct.map(rows, cols)
        self.nd_order, self.nd_idx_sorted = _sorted_scatter_map(fidx)
        self._nd_rows = jnp.asarray(rows)
        self._nd_cols = jnp.asarray(cols)
        self._nd_rowmap = _sorted_scatter_map(rows)
        self._nd_colmap = _sorted_scatter_map(cols)

    def _nd_factorize_coo(self, vals, d_analytic=None):
        """Ruiz/K2.5 congruence scaling on the COO values, one fused sorted
        scatter into the per-level front buffers, then the level-batched
        multifrontal factorization (ops/ndtree.py)."""
        from ..ops.ndtree import nd_factorize

        nds = self.ndstruct
        mode = self.opts.kkt_scaling
        if mode == "k25" and d_analytic is not None:
            d = d_analytic
        elif mode == "ruiz":
            d = ruiz_coo(
                vals, self._nd_rows, self._nd_cols, nds.N,
                row_map=self._nd_rowmap, col_map=self._nd_colmap,
            )
        else:
            d = jnp.ones((nds.N,), vals.dtype)
        sv = vals * d[self._nd_rows] * d[self._nd_cols]
        bufs = nds.assemble(
            self.nd_idx_sorted, sv[self.nd_order], sorted_indices=True
        )
        bufs = [b.astype(self.fact_dtype) for b in bufs]
        inner = nd_factorize(nds, bufs)
        return EquilibratedFactor(inner=inner, d=d)

    def _sparse_factorize_coo(self, vals, d_analytic=None):
        """Dispatch to the configured sparse direct factorization."""
        if self.arrow:
            return self._arrow_factorize_coo(vals, d_analytic)
        if self.mf:
            return self._nd_factorize_coo(vals, d_analytic)
        return self._banded_factorize_coo(vals, d_analytic)

    def _banded_factorize_coo(self, vals, d_analytic=None):
        """ONE sorted scatter-assembly of the raw f64 band; everything else
        (Ruiz, congruence scaling, refinement operator) reuses it with
        static-slice ops — no further scatters in the hot path."""
        bs = self.bstruct
        N = bs.N
        mode = self.opts.kkt_scaling
        raw = self._band_gather(vals, vals.dtype)
        raw_sym = banded_symmetrize(bs, raw)
        # NOTE round-4 measured negative result (benchmarks probe,
        # /tmp-class factorize split): running Ruiz/scale in f32 is
        # SLOWER on chip than f64 (0.39 vs 0.02 ms — the f64 band
        # reductions are already bandwidth-trivial); the factorize wall
        # was the scatter-add ASSEMBLY (4.7 of 5.6 ms), fixed by the
        # gather-formulation below, not by precision games.
        if mode == "k25" and d_analytic is not None:
            d = d_analytic
            d_perm = jnp.concatenate(
                [d[self._bperm], jnp.ones((bs.nbp * bs.b - N,), d.dtype)]
            ).reshape(bs.nbp, bs.b)
        elif mode == "ruiz":
            d_perm = ruiz_band(bs, raw_sym)
            d = d_perm.reshape(-1)[self._biperm]
        else:
            d = jnp.ones((N,), vals.dtype)
            d_perm = jnp.ones((bs.nbp, bs.b), vals.dtype)
        opband = raw_sym if self._band_is_augmented else None
        if self._spike is not None:
            from ..ops.spike import spike_factorize

            sv = vals * d[self._spike_rows] * d[self._spike_cols]
            bufs = self._spike.assemble(
                self._spike_idx_sorted, sv[self._spike_order],
                self.fact_dtype, sorted_indices=True,
            )
            inner = spike_factorize(self._spike, bufs)
            return EquilibratedFactor(inner=inner, d=d, opband=opband)
        band = scale_band(bs, raw, d_perm).astype(self.fact_dtype)
        inner = self._band_factorize(bs, band)
        return EquilibratedFactor(inner=inner, d=d, opband=opband)

    def _backsolve(self, factor, rhs):
        if self.arrow:
            from ..ops.blockarrow import arrow_solve

            d = factor.d if rhs.ndim == 1 else factor.d[:, None]
            scaled = (d * rhs).astype(self.fact_dtype)
            out = arrow_solve(self.astruct, factor.inner, scaled)
            return self._apply_smw(factor, d * out.astype(rhs.dtype))
        if self.mf:
            from ..ops.ndtree import nd_solve

            d = factor.d if rhs.ndim == 1 else factor.d[:, None]
            scaled = (d * rhs).astype(self.fact_dtype)
            out = nd_solve(self.ndstruct, factor.inner, scaled)
            return self._apply_smw(factor, d * out.astype(rhs.dtype))
        if not self.banded:
            return super()._backsolve(factor, rhs)
        d = factor.d if rhs.ndim == 1 else factor.d[:, None]
        scaled = (d * rhs).astype(self.fact_dtype)
        xp = self._band_solve(self.bstruct, factor.inner, scaled[self._bperm])
        out = xp[self._biperm].astype(rhs.dtype)
        return self._apply_smw(factor, d * out)

    def strip_context(self, ctx):
        """See DenseKKT.strip_context: the f64 operator band is
        iteration-local — never read from the persisted state."""
        if self.banded and self._band_is_augmented:
            return ctx._replace(factor=ctx.factor._replace(opband=None))
        return ctx

    def inertia(self, ctx):
        if self.arrow:
            from ..ops.blockarrow import arrow_inertia

            return arrow_inertia(self.astruct, ctx.factor.inner)
        if self.mf:
            from ..ops.ndtree import nd_inertia

            return nd_inertia(self.ndstruct, ctx.factor.inner)
        if not self.banded:
            return super().inertia(ctx)
        if self._spike is not None:
            from ..ops.spike import spike_inertia

            return spike_inertia(self._spike, ctx.factor.inner)
        return banded_inertia(self.bstruct, ctx.factor.inner)

    def zero_context(self):
        zero_smw = (
            self._zero_smw(self.prob.n, self.opts.quasi_newton_options.max_history)
            if self.lowrank
            else None
        )
        if self.arrow or self.mf:
            p = self.prob
            struct = self.astruct if self.arrow else self.ndstruct
            factor = EquilibratedFactor(
                inner=struct.zero_factor(self.fact_dtype),
                d=jnp.ones((struct.N,)),
                smw=zero_smw,
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
        if not self.banded:
            ctx = super().zero_context()
            return ctx._replace(factor=ctx.factor._replace(smw=zero_smw))
        p = self.prob
        bs = self.bstruct
        # the operator band is iteration-local (strip_context): the
        # persisted template carries None
        opband = None
        inner_zero = (
            self._spike.zero_factor(self.fact_dtype)
            if self._spike is not None
            else bs.zero_factor(self.fact_dtype)
        )
        factor = EquilibratedFactor(
            inner=inner_zero,
            d=jnp.ones((bs.N,)),
            smw=zero_smw,
            opband=opband,
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

    # -- sparse products ---------------------------------------------------

    def jtprod(self, jac_vals, y):
        """jacl = Aᵀy as a cumsum segment-sum, not a scatter-add.

        TPU scatter-adds serialize (~0.17 µs/element — the 15k-entry
        scatter here was 1.9 ms/iter at nb=600, round-4 steplogic probe);
        with the contributions host-sorted by output column the segment
        sums are prefix differences at static boundaries: one cumsum +
        two static gathers.  Summation error is eps·|prefix| ≈ 1e-13 —
        far below the 1e-8 duals tolerance (and the golden-rule tests
        pin trajectory parity)."""
        p = self.prob
        if p.m == 0:
            return jnp.zeros((p.nw,), jac_vals.dtype)
        contrib = jac_vals[self.jt_order] * y[self._jt_rows_sorted]
        cs = jnp.concatenate([
            jnp.zeros((1,), contrib.dtype), jnp.cumsum(contrib)
        ])
        return cs[self._jt_ends] - cs[self._jt_starts]

    def jprod(self, jac_vals, v):
        """J·v by the same cumsum segment-sum formulation as jtprod."""
        p = self.prob
        if p.m == 0:
            return jnp.zeros((p.m,), jac_vals.dtype)
        contrib = jac_vals[self.jp_order] * v[self._jp_cols_sorted]
        cs = jnp.concatenate([
            jnp.zeros((1,), contrib.dtype), jnp.cumsum(contrib)
        ])
        return cs[self._jp_ends] - cs[self._jp_starts]

    def hess_mul(self, hess_vals, v):
        """(n,) symmetric product from the lower-triangular values (or the
        compact L-BFGS operator B = diag − UUᵀ + VVᵀ)."""
        p = self.prob
        if isinstance(hess_vals, LowRankHessian):
            lr = hess_vals
            return (
                lr.diag * v
                - lr.U @ (lr.U.T @ v)
                + lr.V @ (lr.V.T @ v)
            )
        out = jnp.zeros((p.n,), hess_vals.dtype)
        out = out.at[self.hr_sorted].add(
            (hess_vals * v[self.hc])[self.hr_order], indices_are_sorted=True
        )
        off = jnp.where(self.h_offdiag, hess_vals, 0.0)
        return out.at[self.hc_sorted].add(
            (off * v[self.hr])[self.hc_order], indices_are_sorted=True
        )

    # -- assembly ----------------------------------------------------------

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu, rr=False):
        p = self.prob
        pr_diag, du_diag = self.aug_diagonals(reg, du_diag, dl, du_, zl, zu)
        hv = hess.diag if isinstance(hess, LowRankHessian) else hess
        if self.sparse_direct:
            vals = jnp.concatenate([pr_diag, du_diag, jac, hv])
            factor = self._sparse_factorize_coo(
                vals, self._k25_scaling(dl, du_, p.m)
            )
        else:
            N = p.nw + p.m
            K = jnp.zeros((N, N))
            idx = jnp.arange(p.nw)
            K = K.at[idx, idx].add(pr_diag)
            if p.m:
                jdx = p.nw + jnp.arange(p.m)
                K = K.at[jdx, jdx].add(du_diag)
                K = K.at[p.nw + self.jr, self.jc].add(jac)
                K = K.at[self.jc, p.nw + self.jr].add(jac)
            K = K.at[self.hr, self.hc].add(hv)
            off = jnp.where(self.h_offdiag, hv, 0.0)
            K = K.at[self.hc, self.hr].add(off)
            factor = self._factorize_matrix(
                K, self._k25_scaling(dl, du_, p.m), split=self._split(),
                rr=rr,
            )
        if isinstance(hess, LowRankHessian):
            factor = self._attach_smw(factor, hess)
        return KKTContext(
            hess=hess, jac=jac, pr_diag=pr_diag, du_diag=du_diag, reg=reg,
            dl=dl, du_=du_, zl=zl, zu=zu, factor=factor,
        )

    # -- operator / solve --------------------------------------------------

    def mul(self, ctx: KKTContext, v: KKTVec) -> KKTVec:
        p = self.prob
        lb, ub = jnp.asarray(p.lb_mask), jnp.asarray(p.ub_mask)
        if self.banded and self._band_is_augmented:
            # scatter-free refinement operator: the augmented product comes
            # from the stored f64 operator band (batched MXU mat-vecs), the
            # Σ/bound-dual terms are corrected elementwise
            vfull = jnp.concatenate([v.xp, v.y])
            kv_p = banded_symv(
                self.bstruct, ctx.factor.opband, vfull[self._bperm]
            )
            kv = kv_p[self._biperm]
            sigma = (
                jnp.where(lb, ctx.zl / ctx.dl, 0.0)
                + jnp.where(ub, ctx.zu / ctx.du_, 0.0)
            )
            wx = kv[: p.nw] - sigma * v.xp
            if isinstance(ctx.hess, LowRankHessian):
                lr = ctx.hess
                vx = v.xp[: p.n]
                corr = -lr.U @ (lr.U.T @ vx) + lr.V @ (lr.V.T @ vx)
                wx = wx.at[: p.n].add(corr)
            wx = wx - jnp.where(lb, v.zl, 0.0) + jnp.where(ub, v.zu, 0.0)
            wy = kv[p.nw :] if p.m > 0 else v.y
            wzl = jnp.where(lb, ctx.zl * v.xp + ctx.dl * v.zl, 0.0)
            wzu = jnp.where(ub, ctx.zu * v.xp - ctx.du_ * v.zu, 0.0)
            return KKTVec(xp=wx, y=wy, zl=wzl, zu=wzu)
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

    _band_is_augmented = False  # band holds the n×n condensed matrix

    def __init__(self, prob, opts):
        super().__init__(prob, opts)
        p = prob
        assert p.n_eq == 0, (
            "SparseCondensedKKT requires all constraints to be inequalities "
            "(use equality_treatment=RELAX / the SPARSE_CONDENSED preset)"
        )
        from ..utils.options import LinearSolver as _LS

        if self.solver in (_LS.BLOCK_CHOLESKY, _LS.HYKKT):
            # the condensed matrix is plain SPD (no dual block)
            self.solver = _LS.CHOLESKY
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

    def _split(self):
        return None

    def _band_ordering(self):
        return None  # condensed matrix is SPD: plain RCM is stable

    def _band_pattern(self):
        """Lower-COO pattern of the condensed matrix K = W + Σx + JᵀDJ.
        Pair records are deduped to one per unordered entry pair (the dense
        path adds both ordered records at mirrored positions; band storage
        keeps the lower triangle only)."""
        p = self.prob
        from ..native import jtdj_pair_map

        rows = np.asarray(p.model.jac_rows)
        cols = np.asarray(p.model.jac_cols)
        pr, pc, pa, pb, pk = jtdj_pair_map(rows, cols, p.m)
        keep = pa <= pb
        self.bpair_a = jnp.asarray(pa[keep])
        self.bpair_b = jnp.asarray(pb[keep])
        self.bpair_k = jnp.asarray(pk[keep])
        # duplicate COO records (edge-local AD jacobians emit one record per
        # edge) can pair two DISTINCT entries a≠b sharing one column: the
        # product lands on the DIAGONAL of K, which the band symmetrization
        # never mirrors — count those pairs twice to recover both orders of
        # the full pair map (the dense path keeps both orders explicitly)
        dup_diag = (pr[keep] == pc[keep]) & (pa[keep] != pb[keep])
        self.bpair_w = jnp.asarray(np.where(dup_diag, 2.0, 1.0))
        diag = np.arange(p.n, dtype=np.int64)
        hr, hc = self._hess_pattern()
        rows_all = np.concatenate([diag, hr, pr[keep]])
        cols_all = np.concatenate([diag, hc, pc[keep]])
        return rows_all, cols_all, p.n

    def sys_size(self) -> int:
        return self.prob.n

    def _diag_buffer(self, pr_diag, du_diag):
        p = self.prob
        sigma_s = pr_diag[p.n :]
        sigma_d = du_diag  # all rows are inequalities
        return sigma_s / (1.0 - sigma_d * sigma_s)

    def build_and_factorize(self, hess, jac, reg, du_diag, dl, du_, zl, zu, rr=False):
        p = self.prob
        pr_diag, du_diag = self.aug_diagonals(reg, du_diag, dl, du_, zl, zu)
        D = self._diag_buffer(pr_diag, du_diag)
        jv = jac[: self.nnz_jac]  # model entries; slack tail excluded
        hv = hess.diag if isinstance(hess, LowRankHessian) else hess
        if self.sparse_direct:
            w = (
                self.bpair_w
                * D[self.bpair_k] * jv[self.bpair_a] * jv[self.bpair_b]
            )
            vals = jnp.concatenate([pr_diag[: p.n], hv, w])
            factor = self._sparse_factorize_coo(vals)
        else:
            K = jnp.zeros((p.n, p.n))
            idx = jnp.arange(p.n)
            K = K.at[idx, idx].add(pr_diag[: p.n])
            K = K.at[self.hr, self.hc].add(hv)
            off = jnp.where(self.h_offdiag, hv, 0.0)
            K = K.at[self.hc, self.hr].add(off)
            # JᵀDJ via the pair map — one fused scatter-add
            w = D[self.pair_k] * jv[self.pair_a] * jv[self.pair_b]
            K = K.at[self.pair_r, self.pair_c].add(w)
            factor = self._factorize_matrix(K)
        if isinstance(hess, LowRankHessian):
            factor = self._attach_smw(factor, hess)
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
