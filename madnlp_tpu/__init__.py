"""madnlp_tpu — a TPU-native nonlinear programming solver built in JAX.

Filter line-search interior-point method (Ipopt-class) with the capability
set of MadNLP.jl, re-designed TPU-first: static-shape masked vectorization,
jittable pure-function iteration steps, blocked MXU factorizations, and
`shard_map`/`vmap` scaling for structured and batched problems.
"""

from . import _config  # noqa: F401  (enables x64 by default)

from .models.model import DenseNLPModel, SparseNLPModel, NLPModel, create_model
from .models.frontends import from_scipy, host_model
from .models.nl import read_nl, solve_nl, write_sol
from .utils.options import (
    MadNLPOptions,
    KKTSystem,
    LinearSolver,
    InertiaCorrection,
    BarrierUpdate,
    FixedVariableTreatment,
    EqualityTreatment,
    HessianApproximation,
    PrintLevel,
)
from .utils.status import Status, is_success
from .ipm.solver import MadNLPSolver, ExecutionStats, madnlp

__version__ = "0.1.0"

__all__ = [
    "DenseNLPModel", "SparseNLPModel", "NLPModel", "create_model",
    "from_scipy", "host_model", "read_nl", "solve_nl", "write_sol",
    "MadNLPOptions", "KKTSystem", "LinearSolver", "InertiaCorrection",
    "BarrierUpdate", "FixedVariableTreatment", "EqualityTreatment",
    "HessianApproximation", "PrintLevel", "Status", "is_success",
    "MadNLPSolver", "ExecutionStats", "madnlp",
]
