"""Solver driver — the analogue of ``madnlp`` / ``solve!``
(``/root/reference/src/IPM/solver.jl:9-12,131-209``).

Two execution modes:

* **Hosted loop** (default, for interactive use): a Python outer loop calls
  the jitted per-phase steps, enabling per-iteration logging, wall-time
  checks and user callbacks.  One host sync per IPM iteration — negligible
  vs. a factorization.
* **Fully-jitted solve** (:meth:`MadNLPSolver.solve_jitted`): the entire
  state machine runs inside a single ``lax.while_loop`` — zero host round
  trips; this is the form used for benchmarking, ``vmap`` batching over
  problem instances, and sharded execution.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kkt.condensed_dense import DenseCondensedKKT
from ..kkt.dense import DenseKKT
from ..models.model import SparseNLPModel
from ..utils import log as logfmt
from ..utils.options import KKTSystem, LinearSolver, MadNLPOptions, PrintLevel
from ..utils.status import Status, get_status_output
from . import kernels as K
from .problem import build_problem
from .state import State
from .step import Kernel, _i32

_ACTIVE = (int(Status.REGULAR), int(Status.RESTORE), int(Status.ROBUST))


@dataclasses.dataclass
class ExecutionStats:
    """Result container (reference: MadNLPExecutionStats, src/IPM/utils.jl)."""

    status: Status
    solution: np.ndarray
    objective: float
    constraints: np.ndarray
    multipliers: np.ndarray
    multipliers_L: np.ndarray
    multipliers_U: np.ndarray
    iter: int
    counters: dict
    dual_feas: float
    primal_feas: float
    solve_time: float

    def __repr__(self):
        return (
            f"ExecutionStats(status={self.status.name}, objective={self.objective:.8g}, "
            f"iter={self.iter}, primal_feas={self.primal_feas:.2e}, "
            f"dual_feas={self.dual_feas:.2e}, time={self.solve_time:.3f}s)"
        )


class MadNLPSolver:
    def __init__(
        self,
        model,
        options: Optional[MadNLPOptions] = None,
        schur_structure=None,
        schur_sharding=None,
        arrow_sharding=None,
        kkt_sharding=None,
        **kwargs,
    ):
        opts = options if options is not None else MadNLPOptions.create(**kwargs)
        if opts.kkt_system == KKTSystem.SCALED_SPARSE:
            # K2.5 (ScaledSparseKKTSystem, scaled_augmented.jl) = the
            # augmented system under the analytic sqrt(Xi) congruence
            # scaling — here that is the SPARSE system with kkt_scaling="k25"
            opts = dataclasses.replace(
                opts, kkt_system=KKTSystem.SPARSE, kkt_scaling="k25"
            )
        resolved = opts.resolve(dense_callback=model.is_dense, m=model.m)
        if isinstance(model, SparseNLPModel) and resolved.kkt_system in (
            KKTSystem.DENSE,
            KKTSystem.DENSE_CONDENSED,
            KKTSystem.SCHUR,
        ):
            if resolved.kkt_system == KKTSystem.SCHUR and schur_structure is None:
                # structural detection needs the sparse pattern — run it
                # before densification
                from ..kkt.detect import detect_two_stage

                schur_structure = detect_two_stage(model)
            # dense KKT systems consume the densified sparse model
            model = model.to_dense()
        self.model = model
        self.opts = resolved
        self.prob = build_problem(model, self.opts)
        if self.opts.ldl_block_size is None:
            # measured MXU optimum: 128-wide panels once the KKT system is
            # big enough to fill them (nb=600 ACOPF: 9.3 -> 10.7 iter/s),
            # 64 below that (less padding on small systems)
            self.opts = dataclasses.replace(
                self.opts,
                ldl_block_size=128 if self.prob.nw + self.prob.m >= 1024 else 64,
            )
        # pick the default linear solver once n_eq is known: condensed systems
        # are SPD without equality rows -> Cholesky; otherwise LDLᵀ; large
        # sparse problems with a narrow RCM band -> the banded sparse direct
        # factorization (the reference's density-based smart preset,
        # src/IPM/options.jl:209-228, extended with a bandwidth criterion)
        if self.opts.linear_solver is None or opts.linear_solver is None:
            kkt_sys = self.opts.kkt_system
            if kkt_sys in (KKTSystem.DENSE_CONDENSED, KKTSystem.SPARSE_CONDENSED):
                lin = (
                    LinearSolver.CHOLESKY
                    if self.prob.n_eq == 0
                    else LinearSolver.LDL
                )
            else:
                lin = LinearSolver.LDL
            if self.prob.is_sparse and kkt_sys in (
                KKTSystem.SPARSE,
                KKTSystem.SPARSE_CONDENSED,
                KKTSystem.SPARSE_UNREDUCED,
            ):
                lin = self._sparse_preset(lin)
            self.opts = dataclasses.replace(self.opts, linear_solver=lin)
        if self.opts.kkt_system == KKTSystem.SCHUR:
            if schur_structure is None:
                # reference analogue: explicit dims, or auto-detection from
                # scenario tags (src/KKT/Schur/schur.jl:160-235); we also
                # infer structurally from the sparse Jacobian pattern
                from ..kkt.detect import detect_two_stage

                schur_structure = detect_two_stage(model)
            if schur_structure is None:
                raise ValueError(
                    "kkt_system=SCHUR requires schur_structure="
                    "TwoStageStructure(...), a model with ExaModels-style "
                    "scenario `tags`, or a sparse model whose Jacobian "
                    "pattern exposes the two-stage blocks"
                )
            from ..kkt.schur import SchurKKT

            kkt = SchurKKT(
                self.prob, self.opts, schur_structure,
                scenario_sharding=schur_sharding,
            )
        else:
            if self.prob.is_sparse:
                from ..kkt.sparse import SparseCondensedKKT, SparseKKT
                from ..kkt.unreduced import SparseUnreducedKKT

                kkt_cls = {
                    KKTSystem.SPARSE: SparseKKT,
                    KKTSystem.SPARSE_CONDENSED: SparseCondensedKKT,
                    KKTSystem.SPARSE_UNREDUCED: SparseUnreducedKKT,
                }.get(self.opts.kkt_system)
            else:
                from ..kkt.unreduced import DenseUnreducedKKT

                kkt_cls = {
                    KKTSystem.DENSE: DenseKKT,
                    KKTSystem.DENSE_CONDENSED: DenseCondensedKKT,
                    KKTSystem.SPARSE_UNREDUCED: DenseUnreducedKKT,
                    # dense callbacks use dense storage for the condensed form
                    KKTSystem.SPARSE: DenseKKT,
                    KKTSystem.SPARSE_CONDENSED: DenseCondensedKKT,
                }.get(self.opts.kkt_system)
            if kkt_cls is None:
                raise NotImplementedError(
                    f"KKT system {self.opts.kkt_system} not implemented yet"
                )
            kkt = kkt_cls(self.prob, self.opts)
        if arrow_sharding is not None:
            assert getattr(kkt, "arrow", False), (
                "arrow_sharding requires linear_solver=BLOCK_ARROW"
            )
            kkt.arrow_sharding = arrow_sharding
        if kkt_sharding is not None:
            # single-problem tensor parallelism of one large dense KKT
            # factorization (ops/ldlt.py GSPMD-distributed blocked LDLᵀ)
            assert self.opts.linear_solver == LinearSolver.LDL and not getattr(
                kkt, "sparse_direct", False
            ), "kkt_sharding requires the dense LDL path"
            kkt.dense_sharding = kkt_sharding
        if self.prob.is_sparse and self.opts.hessian_approximation.name in (
            "BFGS",
            "DAMPED_BFGS",
        ):
            raise NotImplementedError(
                "full-memory BFGS requires dense Hessian storage; use "
                "COMPACT_LBFGS (low-rank + SMW over the sparse KKT) or the "
                "dense callback path (model.to_dense())"
            )
        self.kernel = Kernel(self.prob, self.opts, kkt=kkt)
        self._init_fn = jax.jit(self.kernel.initialize)
        self._regular = jax.jit(self.kernel.regular_step)
        self._restore = jax.jit(self.kernel.restore_step)
        self._robust = jax.jit(self.kernel.robust_step)
        self._solve_jit = None
        self._post_jit = None
        self._solve_batch_jit = None
        self._whole_fn = None
        self._reinit_fn = None
        self._output_fh = None
        self.state: Optional[State] = None

    # ------------------------------------------------------------------

    def _sparse_preset(self, fallback):
        """Bandwidth-based preset for sparse callbacks: large systems whose
        quasidefinite-interleaved RCM ordering yields a narrow band use the
        banded sparse direct factorization; everything else keeps the dense
        fallback (scatter-assembled storage).  Host-side, trace-time only."""
        p = self.prob
        N = p.nw + p.m
        if N < 1024:
            return fallback  # dense is latency-optimal at small sizes
        try:
            from ..ops.banded import kkt_interleaved_ordering

            hr = np.asarray(p.hess_rows)
            hc = np.asarray(p.hess_cols)
            perm = kkt_interleaved_ordering(
                hr, hc, p.jac_rows_aug, p.jac_cols_aug, p.nw, p.m
            )
            iperm = np.empty(N, dtype=np.int64)
            iperm[perm] = np.arange(N)
            rows = np.concatenate([p.nw + np.asarray(p.jac_rows_aug), hr])
            cols = np.concatenate([np.asarray(p.jac_cols_aug), hc])
            W = int(np.abs(iperm[rows] - iperm[cols]).max(initial=0))
            b = self.opts.resolved_banded_block(N)
            w = (-(-W // b) + 1) * b  # block bandwidth in scalars
        except Exception:
            return fallback
        # banded flops ~ N·w² vs dense N³/3: require a decisive win so the
        # sequential block-column scan never loses to one big MXU GEMM
        return LinearSolver.BANDED if w * 4 <= N else fallback

    def _print(self, msg, level=PrintLevel.NOTICE):
        """Leveled console print with optional tee to ``output_file``
        (reference: src/utils.jl logger + options.jl output_file)."""
        if self.opts.print_level <= level:
            print(msg)
        if self.opts.output_file:
            if self._output_fh is None:
                self._output_fh = open(self.opts.output_file, "a")
            if self.opts.file_print_level <= level:
                self._output_fh.write(msg + "\n")
                self._output_fh.flush()

    def _print_iter(self, st: State):
        """Ipopt-format iteration line from the in-step log snapshot —
        byte-compatible with the reference (print_iter,
        src/IPM/utils.jl:161-188; formatters in utils/log.py)."""
        if self.opts.print_level > PrintLevel.INFO and not self.opts.output_file:
            return
        row = np.asarray(st.log_row)
        k = int(row[0])
        if k % 10 == 0:
            self._print(logfmt.ITER_HEADER, PrintLevel.INFO)
        obj_scale = float(st.scal.obj_scale)
        self._print(
            logfmt.format_iter(
                k,
                row[11] != 0.0,
                row[1] / obj_scale,
                row[2], row[3], row[4],
                float(np.log10(max(row[5], 1e-300))),
                row[6], row[7],
                int(row[8]), int(row[9]),
                K.FTYPE_CHARS.get(int(row[10]), " "),
            ),
            PrintLevel.INFO,
        )

    def _print_summary(self, st: State, stats: "ExecutionStats"):
        """EXIT summary — byte-compatible with the reference
        (print_summary, src/IPM/utils.jl:190-219)."""
        obj_scale = float(st.scal.obj_scale)
        c = stats.counters
        cviol = float(np.max(np.abs(np.asarray(st.c)), initial=0.0))
        for line in logfmt.format_summary(
            stats.iter,
            float(st.obj_val),
            float(st.obj_val) / obj_scale,
            stats.dual_feas,
            stats.primal_feas,
            cviol,
            float(st.inf_compl),
            obj_scale,
            c["obj_cnt"], c["grad_cnt"], c["con_cnt"], c["jac_cnt"],
            c["hess_cnt"], c["factorization_cnt"], c["backsolve_cnt"],
            init_time=getattr(self, "_init_time", float("nan")),
            total_time=stats.solve_time,
        ):
            self._print(line)

    # ------------------------------------------------------------------

    def solve(
        self,
        params=None,
        max_wall_time: Optional[float] = None,
        intermediate_callback=None,
    ) -> ExecutionStats:
        """Solve (or warm-start re-solve if already solved once).

        ``intermediate_callback(info: dict) -> bool`` is invoked once per
        IPM iteration (the reference's `AbstractUserCallback`,
        src/utils.jl:4-14); returning False aborts with
        USER_REQUESTED_STOP."""
        t0 = time.time()
        max_wt = max_wall_time if max_wall_time is not None else self.opts.max_wall_time
        theta = () if params is None else params
        if self.state is not None and int(self.state.status) != int(Status.INITIAL):
            # warm start: resolve from the previous state (solver.jl:153-155)
            if self._reinit_fn is None:
                self._reinit_fn = jax.jit(self.kernel.reinitialize)
            st = self._reinit_fn(self.state, theta)
        else:
            st = self._init_fn(theta)
            jax.block_until_ready(st.status)
            self._init_time = time.time() - t0
            self._print_init()
        status = int(st.status)
        while status in _ACTIVE:
            if intermediate_callback is not None:
                info = {
                    "iter": int(st.k),
                    "objective": float(st.obj_val) * self.prob.sign
                    / float(st.scal.obj_scale),
                    "inf_pr": float(st.inf_pr),
                    "inf_du": float(st.inf_du),
                    "mu": float(st.mu),
                }
                if intermediate_callback(info) is False:
                    st = st._replace(status=_i32(Status.USER_REQUESTED_STOP))
                    break
            if status == int(Status.REGULAR):
                st = self._regular(st)
            elif status == int(Status.RESTORE):
                st = self._restore(st)
            else:
                st = self._robust(st)
            self._print_iter(st)
            status = int(st.status)  # host sync (once per iteration)
            if time.time() - t0 > max_wt and status in _ACTIVE:
                status = int(Status.MAXIMUM_WALLTIME_EXCEEDED)
                st = st._replace(status=_i32(status))
        self.state = st
        stats = self._stats(st, time.time() - t0)
        if int(st.status) >= int(Status.SOLVE_SUCCEEDED):
            self._print_summary(st, stats)
        self._print(
            f"EXIT: {get_status_output(stats.status, self.opts.tol, self.opts.acceptable_tol)}"
        )
        return stats

    def _print_init(self):
        """print_init — byte-compatible with the reference
        (src/IPM/utils.jl:139-160)."""
        if self.opts.print_level > PrintLevel.NOTICE:
            return
        p = self.prob
        model = p.model
        if getattr(model, "is_dense", True):
            nnzj = model.m * model.n
            nnzh = model.n * (model.n + 1) // 2
        else:
            nnzj = len(model.jac_rows)
            nnzh = len(model.hess_rows)
        lb, ub = p.lb_mask[: p.n], p.ub_mask[: p.n]
        n_free = int((~(p.fixed_mask)).sum()) if p.fixed_mask.any() else p.n
        lcon = np.asarray(model.lcon) if p.m else np.zeros(0)
        ucon = np.asarray(model.ucon) if p.m else np.zeros(0)
        ineq = p.ineq_mask
        c_lb = (lcon > -np.inf) & ~(ucon < np.inf) & ineq
        c_ub = ~(lcon > -np.inf) & (ucon < np.inf) & ineq
        c_both = (lcon > -np.inf) & (ucon < np.inf) & ineq
        for line in logfmt.format_init(
            nnzj, nnzh, n_free,
            int((lb & ~ub).sum()), int((lb & ub).sum()), int((~lb & ub).sum()),
            p.n_eq, p.ns,
            int(c_lb.sum()), int(c_both.sum()), int(c_ub.sum()),
        ):
            self._print(line)

    def solve_jitted(self, params=None) -> ExecutionStats:
        """Whole solve as one XLA computation (no host round trips)."""
        t0 = time.time()
        self._build_solve_jit()
        st = self._solve_jit(() if params is None else params)
        st.status.block_until_ready()
        self.state = st
        return self._stats(st, time.time() - t0)

    @staticmethod
    def _make_loop(kern):
        """(cond, body, whole) of the whole-solve state machine for a
        given kernel (src/IPM/solver.jl:162-166 encoded as a status int)."""

        def cond(st):
            return (
                (st.status == _i32(Status.REGULAR))
                | (st.status == _i32(Status.RESTORE))
                | (st.status == _i32(Status.ROBUST))
            )

        def body(st):
            branch = jnp.where(
                st.status == _i32(Status.REGULAR), 0,
                jnp.where(st.status == _i32(Status.RESTORE), 1, 2),
            )
            return jax.lax.switch(
                branch,
                [kern.regular_step, kern.restore_step, kern.robust_step],
                st,
            )

        def whole(theta):
            return jax.lax.while_loop(cond, body, kern.initialize(theta))

        return cond, body, whole

    def _build_solve_jit(self):
        if self._solve_jit is None:
            cond, body, whole = self._make_loop(self.kernel)
            self._loop_cond, self._loop_body = cond, body
            self._whole_fn = whole
            self._solve_jit = jax.jit(whole)
        return self._whole_fn


    def solve_batch(self, params_batch, sharding=None, chunk_size="auto",
                    probe_iters="auto"):
        """Solve a batch of same-structure instances with one ``vmap``-ed XLA
        computation — the analogue of cuDSS uniform batching
        (ext/MadNLPGPUCUDAExt/cudss.jl:139-148) lifted to the whole solver.

        ``params_batch``: pytree stacked along a leading batch axis.
        ``sharding``: optional ``jax.sharding.NamedSharding`` for the batch
        axis (data-parallel over a device mesh).

        ``chunk_size``: solve the batch in vmapped chunks via ``lax.map`` —
        a straggler instance then only stalls its own chunk instead of the
        whole batch (the batched while_loop runs every lane to the slowest
        instance's iteration count).  The default ``"auto"`` picks the
        largest divisor of the batch size ≤ 16 — measured sweet spot on
        both CPU (B=64 QPs: 10.6 → 29.6 inst/s) and TPU (B=64 ACOPF:
        1.28 → 2.84 inst/s); pass ``None`` to force one bulk-synchronous
        vmap (required when ``sharding`` splits the batch over devices —
        chunking would serialize the shards).

        ``probe_iters``: when chunking, run this many bulk-synchronous
        masked IPM steps for the *whole* batch first, sort instances by
        their remaining error (inf_pr+inf_du+inf_compl+μ — a predictor of
        iterations left), and continue each chunk from the probed states in
        sorted order.  Stragglers then share chunks instead of stalling one
        lane each, and the probe is real solver work, not a throwaway
        prediction.  Runs fully inside one jit (traced argsort + gather, no
        host round-trips).  ``"auto"`` = 3 when chunking, 0 disables.

        Returns the final batched :class:`State` in the original instance
        order; summary arrays via :func:`batch_summary`."""
        # the streaming Pallas band kernels are vmap-compatible through
        # their batch-grid custom_vmap rules (ops/pallas_banded_stream.py
        # _factorize_cv/_solve_cv) — naive vmap of a pallas_call with
        # ANY-space refs is rejected by Mosaic outright
        kern = self.kernel
        cond, body, _ = self._make_loop(kern)

        def batched_step(st):
            """One masked step of the batched state machine.  NOT
            ``vmap(body)``: vmapping ``lax.switch`` executes all three
            phase branches (regular/restore/robust) for every lane every
            iteration — measured 3× the per-lane cost at nb=600 on chip.
            The phase decision is lifted to a SCALAR any-lane-in-
            restoration predicate, so the common path runs only
            ``regular_step`` (a scalar-predicate ``lax.cond`` executes
            one branch); batches that do enter restoration pay the full
            switch only while a lane needs it."""
            special = jnp.any(
                (st.status == _i32(Status.RESTORE))
                | (st.status == _i32(Status.ROBUST))
            )
            new = jax.lax.cond(
                special,
                jax.vmap(body),
                jax.vmap(kern.regular_step),
                st,
            )
            active = jax.vmap(cond)(st)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    active.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                new, st,
            )

        def whole_batched(pb):
            st = jax.vmap(kern.initialize)(pb)
            return jax.lax.while_loop(
                lambda s: jnp.any(jax.vmap(cond)(s)), batched_step, st
            )
        B = jax.tree_util.tree_leaves(params_batch)[0].shape[0]
        if chunk_size == "auto":
            if sharding is not None or B <= 16:
                chunk_size = None
            else:
                chunk_size = max(c for c in range(1, 17) if B % c == 0)
                if chunk_size == 1:
                    chunk_size = None
        if probe_iters == "auto":
            probe_iters = 3 if chunk_size is not None else 0
        if sharding is not None:
            params_batch = jax.device_put(params_batch, sharding)
        if chunk_size is None:
            if self._solve_batch_jit is None:
                self._solve_batch_jit = jax.jit(whole_batched)
            fn = self._solve_batch_jit
        else:
            assert B % chunk_size == 0, (
                "batch size must be a multiple of chunk_size"
            )
            key = ("chunked", chunk_size, probe_iters, B)
            if getattr(self, "_solve_batch_chunked", None) is None:
                self._solve_batch_chunked = {}
            if key not in self._solve_batch_chunked:

                def chunked(pb):
                    st = jax.vmap(kern.initialize)(pb)
                    if probe_iters:
                        st = jax.lax.fori_loop(
                            0, probe_iters, lambda _, s: batched_step(s), st
                        )
                        score = st.inf_pr + st.inf_du + st.inf_compl + st.mu
                        order = jnp.argsort(score)
                        st = jax.tree_util.tree_map(lambda a: a[order], st)
                    # explicit chunk count (a "-1" reshape fails on 0-size leaves)
                    st = jax.tree_util.tree_map(
                        lambda a: a.reshape(
                            (B // chunk_size, chunk_size) + a.shape[1:]), st)
                    st = jax.lax.map(
                        lambda s: jax.lax.while_loop(
                            lambda t: jnp.any(jax.vmap(cond)(t)),
                            batched_step, s,
                        ),
                        st)
                    # explicit product (a "-1" reshape fails on 0-size leaves)
                    st = jax.tree_util.tree_map(
                        lambda a: a.reshape(
                            (a.shape[0] * a.shape[1],) + a.shape[2:]), st)
                    if probe_iters:
                        inv = jnp.argsort(order)
                        st = jax.tree_util.tree_map(lambda a: a[inv], st)
                    return st

                self._solve_batch_chunked[key] = jax.jit(chunked)
            fn = self._solve_batch_chunked[key]

        st = fn(params_batch)
        st.status.block_until_ready()
        return st

    # ------------------------------------------------------------------

    def _build_post_jit(self):
        """One jitted device computation for everything _stats needs that
        is not already in the final State: the unscaled constraint values
        and (when fixed variables exist) the gradient + Jᵀy for bound-
        multiplier recovery (update_z!, nlpmodels.jl:1075-1087).

        The previous implementation called the UN-jitted model evals
        eagerly from the host — over the axon tunnel that executed the
        whole constraint AD graph op-by-op at ~2-4 ms per op, which
        dominated every bench's measured \"solve\" wall (probe_step2:
        13 ms/iter on device vs 55 ms/iter measured through
        solve_jitted + stats)."""
        p = self.prob

        def post(st):
            theta = st.theta if p.model.is_parametric else None
            x = st.x[: p.n]
            cons = p._cons(x, theta) if p.m else jnp.zeros((0,))
            if bool(p.fixed_mask.any()):
                g = p._grad(x, theta)
                if p.m > 0:
                    _, vjp = jax.vjp(lambda xx: p._cons(xx, theta), x)
                    g = g + vjp(st.y * st.scal.con_scale)[0]
            else:
                g = jnp.zeros((0,))
            return cons, g

        return jax.jit(post)

    def _stats(self, st: State, solve_time: float) -> ExecutionStats:
        p = self.prob
        if self._post_jit is None:
            self._post_jit = self._build_post_jit()
        cons_d, g_d = self._post_jit(st)
        # one bulk host fetch instead of a dozen tunnel round-trips
        (x, con_scale, obj_scale_a, y_raw, zl_raw, zu_raw, cons, g) = (
            jax.device_get((st.x[: p.n], st.scal.con_scale,
                            st.scal.obj_scale, st.y, st.zl[: p.n],
                            st.zu[: p.n], cons_d, g_d)))
        # unscale (utils.jl:8-65 + unpack_* in nlpmodels.jl)
        obj_scale = float(obj_scale_a)
        x = np.asarray(x)
        con_scale = np.asarray(con_scale)
        y = np.asarray(y_raw) * con_scale * (p.sign / obj_scale)
        zl = np.asarray(zl_raw) / obj_scale
        zu = np.asarray(zu_raw) / obj_scale
        if p.fixed_mask.any():
            fm = p.fixed_mask
            zl[fm] = np.maximum(0.0, p.sign * g[fm])
            zu[fm] = np.maximum(0.0, -p.sign * g[fm])
        cons = np.asarray(cons) if p.m else np.zeros(0)
        (k, obj_cnt, grad_cnt, con_cnt, jac_cnt, hess_cnt, fact_cnt,
         back_cnt, t_cnt, status, obj_val, inf_du, inf_pr) = jax.device_get(
            (st.k, st.obj_cnt, st.grad_cnt, st.con_cnt, st.jac_cnt,
             st.hess_cnt, st.factorization_cnt, st.backsolve_cnt, st.t_cnt,
             st.status, st.obj_val, st.inf_du, st.inf_pr))
        counters = {
            "k": int(k),
            "obj_cnt": int(obj_cnt),
            "grad_cnt": int(grad_cnt),
            "con_cnt": int(con_cnt),
            "jac_cnt": int(jac_cnt),
            "hess_cnt": int(hess_cnt),
            "factorization_cnt": int(fact_cnt),
            "backsolve_cnt": int(back_cnt),
            "t": int(t_cnt),
        }
        return ExecutionStats(
            status=Status(int(status)),
            solution=x,
            objective=p.sign * float(obj_val) / obj_scale,
            constraints=cons,
            multipliers=y,
            multipliers_L=zl,
            multipliers_U=zu,
            iter=int(k),
            counters=counters,
            dual_feas=float(inf_du),
            primal_feas=float(inf_pr),
            solve_time=solve_time,
        )


def batch_summary(prob, st) -> dict:
    """Summary arrays for a batched solve (leading batch axis)."""
    obj_scale = np.asarray(st.scal.obj_scale)
    return {
        "status": np.asarray(st.status),
        "iter": np.asarray(st.k),
        "objective": prob.sign * np.asarray(st.obj_val) / obj_scale,
        "inf_pr": np.asarray(st.inf_pr),
        "inf_du": np.asarray(st.inf_du),
        "x": np.asarray(st.x[..., : prob.n]),
    }


def madnlp(model, **kwargs) -> ExecutionStats:
    """Build a solver and run it — mirror of ``madnlp(nlp; kwargs...)``."""
    params = kwargs.pop("params", None)
    return MadNLPSolver(model, **kwargs).solve(params=params)
