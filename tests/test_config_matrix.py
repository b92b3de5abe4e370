"""Configuration-matrix behavior tests — the analogue of the reference's
14-config matrix in test/madnlp_test.jl:1-141 ({KKT system × linear solver
× inertia mode × fixed-variable mode} through the behavior suite)."""

import numpy as np
import pytest

from madnlp_tpu import (
    FixedVariableTreatment,
    InertiaCorrection,
    KKTSystem,
    LinearSolver,
    Status,
    madnlp,
)
from madnlp_tpu.models.instances import dummy_qp

CONFIGS = [
    dict(kkt_system=KKTSystem.DENSE, linear_solver=LinearSolver.LDL),
    dict(kkt_system=KKTSystem.DENSE, linear_solver=LinearSolver.EVD),
    dict(
        kkt_system=KKTSystem.DENSE,
        linear_solver=LinearSolver.LU,
        inertia_correction_method=InertiaCorrection.FREE,
    ),
    dict(
        kkt_system=KKTSystem.DENSE_CONDENSED,
        inertia_correction_method=InertiaCorrection.IGNORE,
    ),
    dict(
        kkt_system=KKTSystem.DENSE_CONDENSED,
        fixed_variable_treatment=FixedVariableTreatment.RELAX_BOUND,
    ),
    dict(kkt_system=KKTSystem.SPARSE_CONDENSED, tol=1e-6),
    dict(kkt_system=KKTSystem.DENSE, solve_mode="inverse", dtype="float32"),
    dict(kkt_system=KKTSystem.DENSE, kkt_scaling="k25", iterator="gmres"),
    dict(kkt_system=KKTSystem.DENSE, linear_solver=LinearSolver.BLOCK_CHOLESKY),
    dict(
        kkt_system=KKTSystem.DENSE_CONDENSED,
        linear_solver=LinearSolver.BLOCK_CHOLESKY,
        solve_mode="inverse",
        dtype="float32",
    ),
    dict(kkt_system=KKTSystem.DENSE, linear_solver=LinearSolver.HYKKT),
    dict(
        kkt_system=KKTSystem.DENSE_CONDENSED,
        linear_solver=LinearSolver.HYKKT,
        solve_mode="inverse",
        dtype="float32",
    ),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: "-".join(
    f"{k}={getattr(v, 'name', v)}" for k, v in c.items()
))
def test_config(cfg):
    model = dummy_qp.build(25, 6, fixed_variables=[2], equality_cons=[1])
    ref = madnlp(dummy_qp.build(25, 6, fixed_variables=[2], equality_cons=[1]))
    stats = madnlp(model, **cfg)
    assert stats.status in (
        Status.SOLVE_SUCCEEDED,
        Status.SOLVED_TO_ACCEPTABLE_LEVEL,
    ), (cfg, stats)
    tol = cfg.get("tol", 1e-8)
    np.testing.assert_allclose(
        stats.solution, ref.solution, atol=100 * np.sqrt(tol)
    )


def test_hykkt_restoration_path():
    """HYKKT's robust-restoration mode (direct dual elimination, no γ/CG)
    must still drive the RR machinery: infeasibility is detected."""
    import jax.numpy as jnp

    from madnlp_tpu import create_model

    inf_m = create_model(
        obj=lambda x: x[0], cons=lambda x: jnp.array([x[0]]),
        n=1, m=1, x0=[0.0], lvar=[1.0], lcon=[0.0], ucon=[0.5],
    )
    stats = madnlp(inf_m, print_level="error",
                   linear_solver=LinearSolver.HYKKT)
    assert stats.status == Status.INFEASIBLE_PROBLEM_DETECTED
