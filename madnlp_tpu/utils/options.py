"""Solver options.

The option names, defaults, and semantics mirror the reference
(``/root/reference/src/IPM/options.jl:21-204``, Ipopt-compatible).  Unlike
the reference — which routes options through three mutable structs at
runtime — options here are a single *frozen, hashable* dataclass: in JAX the
whole configuration must be static at trace time, and a hashable options
object lets the jitted solver be cached per configuration.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class KKTSystem(enum.Enum):
    """KKT formulation (reference: src/KKT/KKTsystem.jl:10-79)."""

    DENSE = "dense"                    # DenseKKTSystem: reduced augmented, dense
    DENSE_CONDENSED = "dense_condensed"  # DenseCondensedKKTSystem
    SPARSE = "sparse"                  # SparseKKTSystem (static-map sparse assembly)
    SPARSE_CONDENSED = "sparse_condensed"  # Lifted-KKT / condensed (accelerator path)
    SCALED_SPARSE = "scaled_sparse"    # K2.5 scaling
    SPARSE_UNREDUCED = "sparse_unreduced"
    SCHUR = "schur"                    # two-stage / block-arrowhead decomposition


class LinearSolver(enum.Enum):
    """Backend used to factorize the (assembled) KKT matrix.

    TPU-native equivalents of the reference's LAPACK/MUMPS/cuDSS backends
    (SURVEY.md §2.4): dense factorizations through XLA linalg and custom
    blocked kernels; no FFI sparse solvers exist on TPU, so sparse paths
    condense to SPD systems solved by (block-)Cholesky.
    """

    LDL = "ldl"            # blocked dense LDLᵀ (no pivoting) with inertia
    CHOLESKY = "cholesky"  # XLA Cholesky; inertia = success ⇒ (n, 0, 0)
    LU = "lu"              # XLA LU; no inertia
    QR = "qr"              # XLA QR; no inertia
    EVD = "evd"            # XLA eigh; exact inertia (robust fallback)
    BLOCK_ARROW = "block_arrow"  # nested-dissection block-arrowhead LDLᵀ
    # (ops/blockarrow.py): batched independent diagonal blocks + dense
    # separator Schur complement; exact inertia by Haynsworth additivity
    BANDED = "banded"      # RCM + block-banded LDLᵀ (ops/banded.py) — the
    # sparse direct factorization: O(N·w²) flops, O(N·w) memory; requires a
    # sparse-callback KKT system (SPARSE / SPARSE_CONDENSED)
    MULTIFRONTAL = "multifrontal"  # multilevel nested-dissection LDLᵀ
    # (ops/ndtree.py): level-batched multifrontal method — fill-reducing
    # general sparse factorization, O(N^1.5) flops on planar-ish graphs,
    # exact inertia; the MUMPS/ma57 capability slot
    BLOCK_CHOLESKY = "block_cholesky"  # range-space 2x2 block elimination
    # of the augmented system: cholesky(W+Σ) + cholesky of the dual Schur
    # complement A(W+Σ)⁻¹Aᵀ − C — two native XLA Choleskys and one
    # triangular multi-RHS solve, no sequential scalar loops; inertia by
    # Cholesky success.  Requires W+Σ ≻ 0 (stricter than the KKT
    # signature) and squares the conditioning in the dual block — for
    # well-conditioned SPD-Hessian problems (QPs); prefer HYKKT otherwise
    HYKKT = "hykkt"        # Golub–Greif γ-augmented hybrid (the HyKKT /
    # "hybrid condensed" method of the reference's GPU ecosystem,
    # arXiv:2405.14236): cholesky(W + Σ + γAᵀA), which is SPD exactly when
    # the KKT signature is correct — Cholesky success is a *sound* inertia
    # certificate even for indefinite W — then CG on the well-conditioned
    # (cond → 1 as γ grows) dual Schur complement.  One native Cholesky +
    # MXU GEMMs; the CG is an inner preconditioner under the f64
    # iterative refinement


class InertiaCorrection(enum.Enum):
    """Inertia correction strategy (reference: src/IPM/solver.jl:611-783)."""

    AUTO = "auto"
    BASED = "based"
    FREE = "free"
    IGNORE = "ignore"


class FixedVariableTreatment(enum.Enum):
    """reference: src/Callbacks/nlpmodels.jl:266-330 (MakeParameter), RelaxBound."""

    MAKE_PARAMETER = "make_parameter"
    RELAX_BOUND = "relax_bound"


class EqualityTreatment(enum.Enum):
    """reference: src/Callbacks/nlpmodels.jl:83-105."""

    ENFORCE = "enforce"
    RELAX = "relax"


class HessianApproximation(enum.Enum):
    """reference: src/quasi_newton.jl."""

    EXACT = "exact"
    BFGS = "bfgs"
    DAMPED_BFGS = "damped_bfgs"
    COMPACT_LBFGS = "compact_lbfgs"


class BFGSInitStrategy(enum.Enum):
    SCALAR1 = 1
    SCALAR2 = 2
    SCALAR3 = 3
    SCALAR4 = 4
    CONSTANT = 5


class BarrierUpdate(enum.Enum):
    """reference: src/IPM/barrier.jl — monotone (Fiacco-McCormick), adaptive."""

    MONOTONE = "monotone"
    QUALITY_FUNCTION = "quality_function"
    LOQO = "loqo"


class DualInitialization(enum.Enum):
    SET_ZERO = "set_zero"
    LEAST_SQUARES = "least_squares"


class PrintLevel(enum.IntEnum):
    TRACE = 1
    DEBUG = 2
    INFO = 3
    NOTICE = 4
    WARN = 5
    ERROR = 6


@dataclasses.dataclass(frozen=True)
class QuasiNewtonOptions:
    """reference: src/quasi_newton.jl:8-46."""

    init_strategy: BFGSInitStrategy = BFGSInitStrategy.SCALAR1
    max_history: int = 6
    init_value: float = 1.0
    sigma_min: float = 1e-8
    sigma_max: float = 1e8


@dataclasses.dataclass(frozen=True)
class RichardsonOptions:
    """Iterative refinement (reference: src/LinearSolvers/backsolve.jl:1-25)."""

    max_iter: int = 10
    tol: Optional[float] = None              # default: opts.tol ** (5/4)
    acceptable_tol: Optional[float] = None   # default: opts.tol ** (5/8)
    # μ-aware target (madnlp_tpu addition; inexact-IPM theory: a step
    # residual ≤ O(μ) preserves the barrier trajectory): the effective
    # per-solve tol is max(tol, min(mu_tol_cap, mu_tol_factor · μ)), so
    # early iterations stop refining ~1e2-1e3 below their own barrier
    # scale while the endgame tightens back to the reference's tol^(5/4).
    # Measured (nb=600 flagship, f32): 78 → 63 backsolves with identical
    # iteration count and objective to 1e-15; restoration-phase solves
    # always keep the exact tol.  OPT-IN (default False): on tiny
    # degenerate systems (rank-deficient all-equality shapes, n≲10) the
    # trajectory is sensitive to the last 1e-3 of step residual and the
    # looser target can reroute the solve through restoration
    # (tests/test_shape_sweep.py s37 — measured, which is why this is
    # not the default); at the nb≥600 flagship scale parity is verified
    # and the flagship bench configuration enables it.
    mu_scaled: bool = False
    mu_tol_factor: float = 1e-2
    mu_tol_cap: float = 1e-8


@dataclasses.dataclass(frozen=True)
class BarrierOptions:
    """Barrier strategy parameters (reference: src/IPM/types.jl:58-146)."""

    mu_init: float = 1e-1
    mu_min: Optional[float] = None    # default: min(1e-4, tol)/(barrier_tol_factor+1)
    mu_max: float = 1e5
    mu_linear_decrease_factor: float = 0.2
    mu_superlinear_decrease_power: float = 1.5
    # adaptive (quality function) options
    sigma_min: float = 1e-6
    sigma_max: float = 100.0
    sigma_tol: float = 1e-2
    max_gs_iter: int = 8
    # LOQO options
    gamma: float = 0.1
    r: float = 0.95
    globalization: bool = True


@dataclasses.dataclass(frozen=True)
class MadNLPOptions:
    """Interior-point options — names and defaults follow the reference table
    (src/IPM/options.jl:21-116) so they are Ipopt-compatible."""

    # Primary
    tol: float = 1e-8
    kkt_system: Optional[KKTSystem] = None        # None -> smart preset
    linear_solver: Optional[LinearSolver] = None  # None -> smart preset

    # Output
    print_level: PrintLevel = PrintLevel.WARN
    output_file: str = ""
    file_print_level: PrintLevel = PrintLevel.INFO

    # Termination
    acceptable_tol: float = 1e-6
    acceptable_iter: int = 15
    diverging_iterates_tol: float = 1e20
    max_iter: int = 3000
    max_wall_time: float = 1e6
    s_max: float = 100.0

    # NLP
    kappa_d: float = 1e-5
    fixed_variable_treatment: Optional[FixedVariableTreatment] = None
    equality_treatment: Optional[EqualityTreatment] = None
    bound_relax_factor: float = 1e-8
    jacobian_constant: bool = False
    hessian_constant: bool = False
    hessian_approximation: HessianApproximation = HessianApproximation.EXACT
    quasi_newton_options: QuasiNewtonOptions = QuasiNewtonOptions()
    inertia_correction_method: InertiaCorrection = InertiaCorrection.AUTO
    inertia_free_tol: float = 0.0
    default_primal_regularization: float = 0.0
    default_dual_regularization: float = 0.0

    # Initialization
    dual_initialized: bool = False
    dual_initialization_method: Optional[DualInitialization] = None
    constr_mult_init_max: float = 1e3
    bound_push: float = 1e-2
    bound_fac: float = 1e-2
    nlp_scaling: bool = True
    nlp_scaling_max_gradient: float = 100.0

    # Hessian perturbation (inertia-correction ladder, solver.jl:636-666)
    min_hessian_perturbation: float = 1e-20
    first_hessian_perturbation: float = 1e-4
    max_hessian_perturbation: float = 1e20
    perturb_inc_fact_first: float = 1e2
    perturb_inc_fact: float = 8.0
    perturb_dec_fact: float = 1.0 / 3.0
    jacobian_regularization_exponent: float = 0.25
    jacobian_regularization_value: float = 1e-8

    # Restoration
    soft_resto_pderror_reduction_factor: float = 0.9999
    required_infeasibility_reduction: float = 0.9

    # Line search
    obj_max_inc: float = 5.0
    max_soc: int = 4
    alpha_min_frac: float = 0.05
    s_theta: float = 1.1
    s_phi: float = 2.3
    eta_phi: float = 1e-4
    kappa_soc: float = 0.99
    gamma_theta: float = 1e-5
    gamma_phi: float = 1e-5
    delta: float = 1.0
    kappa_sigma: float = 1e10
    barrier_tol_factor: float = 10.0
    rho: float = 1000.0

    # Barrier
    barrier: BarrierUpdate = BarrierUpdate.MONOTONE
    barrier_options: BarrierOptions = BarrierOptions()
    tau_min: float = 0.99

    # Iterative refinement
    iterator: str = "richardson"   # "richardson" | "gmres" (Krylov variant)
    richardson: RichardsonOptions = RichardsonOptions()

    # madnlp_tpu-specific
    dtype: str = "float64"         # "float64" | "float32" (factorization dtype)
    solve_mode: Optional[str] = None  # "trisolve" | "inverse" | None (auto:
    # "inverse" on TPU — backsolves become MXU mat-vecs; "trisolve" on CPU)
    kkt_scaling: str = "ruiz"      # "ruiz" | "k25" | "none" — conditioning
    # scaling applied inside the factorization (congruence; preserves
    # inertia).  "k25" is the analytic sqrt(Xi) scaling of the K2.5
    # formulation (Ghannad/Orban/Saunders; reference
    # src/KKT/Sparse/scaled_augmented.jl) expressed as an equilibration.
    filter_capacity: int = 128     # filter kept as a fixed-capacity array (jit)
    ldl_block_size: Optional[int] = None  # block size of the blocked LDLᵀ
    # kernel; None = auto (128 for KKT dimension >= 1024, else 64 — the
    # measured optimum on the TPU MXU at nb=600 ACOPF scale)
    banded_block_size: Optional[int] = None  # block size of the block-banded
    # LDLᵀ; None = auto (256 for systems ≥ 2048, 128 for ≥ 1024, else 64 —
    # measured on chip at nb=600 ACOPF (N=2674): 32→14.0, 64→16.2,
    # 128→17.7, 256→18.4, 512→16.4 iter/s; wider panels shorten the
    # sequential block-column chain until panel compute dominates)

    def resolved_banded_block(self, N: int) -> int:
        b = self.banded_block_size
        if b is None:
            return 256 if N >= 2048 else (128 if N >= 1024 else 64)
        return b
    banded_partitions: int = 0     # SPIKE/arrowhead-over-band partitioning of
    # the banded factorization (ops/spike.py): 0 = off, -1 = auto (enable
    # when the band is long relative to its width, N ≥ 16·w, with
    # P ≈ √(N/w)), >0 = explicit partition count.  Cuts the sequential
    # pivot chain (the latency wall of the banded kernel) to ≈ 2√(N·w)
    # for ~3× the flops; pays off at nb ≥ 3000 ACOPF scale.
    banded_backend: str = "auto"   # "auto" | "xla" | "pallas" — "auto" uses
    # the fused Pallas VMEM kernels (ops/pallas_banded.py) on TPU when the
    # band fits VMEM, the XLA fori_loop otherwise
    schur_block_solver: str = "dense"  # "dense" | "banded" — factorization
    # of the per-scenario A_k blocks of the Schur KKT (kkt/schur.py).
    # "banded" runs the flagship block-banded LDLᵀ *inside* each scenario
    # block (vmapped over the scenario axis, shardable over a mesh): the
    # per-block pattern is recovered by a two-point numeric probe at
    # setup, RCM+interleave ordered, and the dense-assembled blocks are
    # gathered into band storage — O(bs·w²) per block instead of O(bs³)
    # when scenario networks are large (models/instances/scopf.py).
    arrow_nparts: int = 0          # number of diagonal blocks of the
    # block-arrowhead factorization (0 = auto: p ≈ (N/w)^(3/5) balancing
    # block vs separator flops)
    nd_leaf_size: int = 0          # target leaf size of the multifrontal
    # nested-dissection tree (0 = auto: max(128, ldl_block_size))
    nd_max_levels: int = 10        # depth cap of the dissection tree
    hykkt_gamma: Optional[float] = None  # γ of the HYKKT augmentation
    # K_γ = W+γAᵀA (applied to the Ruiz-equilibrated matrix, whose rows are
    # O(1); larger γ → better-conditioned dual CG but worse-conditioned
    # Cholesky).  None = auto: 1e4 in f64, 1e3 in f32 (the f32 Cholesky
    # stops being a usable preconditioner near cond ~ 1/sqrt(eps))
    hykkt_cg_tol: float = 1e-8     # relative residual target of the dual CG
    hykkt_cg_maxiter: int = 200    # CG iteration cap (loose: the CG is a
    # preconditioner under the f64 iterative refinement)
    hykkt_backend: Optional[str] = None  # "native" (XLA cholesky) |
    # "ldl" (blocked LDLᵀ on K_γ; same SPD certificate) | None = auto:
    # "ldl" on TPU — native cholesky at KKT sizes faults the device
    # inside large whole-solver programs — "native" on CPU

    # -- derived helpers --------------------------------------------------
    def resolve(self, *, dense_callback: bool, m: int) -> "MadNLPOptions":
        """Fill in smart presets (reference: src/IPM/options.jl:209-228 and
        the GPU preset flip in lib/MadNLPGPU/ext/MadNLPGPUCUDAExt/cuda.jl:5-22)."""
        kkt = self.kkt_system
        if kkt is None:
            # smart preset (options.jl:209-228): dense callbacks condense
            kkt = KKTSystem.DENSE_CONDENSED if dense_callback else KKTSystem.SPARSE
        lin = self.linear_solver
        if lin is None:
            lin = (
                LinearSolver.CHOLESKY
                if kkt in (KKTSystem.DENSE_CONDENSED, KKTSystem.SPARSE_CONDENSED)
                else LinearSolver.LDL
            )
        fixed = self.fixed_variable_treatment
        if fixed is None:
            fixed = (
                FixedVariableTreatment.RELAX_BOUND
                if kkt == KKTSystem.SPARSE_CONDENSED
                else FixedVariableTreatment.MAKE_PARAMETER
            )
        eq = self.equality_treatment
        if eq is None:
            eq = (
                EqualityTreatment.RELAX
                if kkt == KKTSystem.SPARSE_CONDENSED
                else EqualityTreatment.ENFORCE
            )
        dual_init = self.dual_initialization_method
        if dual_init is None:
            dual_init = (
                DualInitialization.SET_ZERO
                if kkt == KKTSystem.SPARSE_CONDENSED
                else DualInitialization.LEAST_SQUARES
            )
        return dataclasses.replace(
            self,
            kkt_system=kkt,
            linear_solver=lin,
            fixed_variable_treatment=fixed,
            equality_treatment=eq,
            dual_initialization_method=dual_init,
        )

    @property
    def mu_min(self) -> float:
        mu_min = self.barrier_options.mu_min
        if mu_min is None:
            # reference: src/IPM/types.jl:72-74
            mu_min = min(1e-4, self.tol) / (self.barrier_tol_factor + 1.0)
        return mu_min

    @property
    def richardson_tol(self) -> float:
        t = self.richardson.tol
        return self.tol ** 1.25 if t is None else t

    @property
    def richardson_acceptable_tol(self) -> float:
        t = self.richardson.acceptable_tol
        return self.tol ** 0.625 if t is None else t

    @classmethod
    def create(cls, **kwargs) -> "MadNLPOptions":
        """Tolerant constructor mirroring the reference's option routing
        (src/IPM/options.jl:243-299): unknown keys warn-and-ignore instead
        of raising, and enum-valued options accept their string names
        (``kkt_system="sparse"``, ``linear_solver="banded"``, ...)."""
        import typing
        import warnings

        fields = {f.name: f for f in dataclasses.fields(cls)}
        clean = {}
        for k, v in kwargs.items():
            f = fields.get(k)
            if f is None:
                warnings.warn(
                    f"option '{k}' is not recognized and will be ignored",
                    stacklevel=3,
                )
                continue
            if isinstance(v, str):
                ann = f.type
                if isinstance(ann, str):
                    ann = typing.get_type_hints(cls).get(k, ann)
                for t in typing.get_args(ann) or (ann,):
                    if isinstance(t, type) and issubclass(t, enum.Enum):
                        try:
                            v = t[v.upper()] if not isinstance(v, t) else v
                        except KeyError:
                            v = t(v.lower())
                        break
                    # numeric/bool fields tolerate string values too (AMPL
                    # option strings, env vars, CLI key=value arguments)
                    if t is bool and isinstance(v, str):
                        v = v.lower() in ("1", "true", "yes", "on")
                        break
                    if t in (int, float) and isinstance(v, str):
                        try:
                            v = t(v)
                        except ValueError:
                            pass
                        break
            clean[k] = v
        return cls(**clean)
