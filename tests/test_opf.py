"""Synthetic ACOPF — the benchmark problem family (BASELINE.md): full AC
power-flow equalities, condensed and Lifted-KKT paths, batched scenarios."""

import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu import KKTSystem, MadNLPSolver, Status, madnlp
from madnlp_tpu.ipm.solver import batch_summary
from madnlp_tpu.models.instances import opf


def test_acopf_dense_condensed():
    stats = madnlp(opf.build(nb=30, seed=1))
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert stats.primal_feas < 1e-8


def test_acopf_lifted_kkt():
    ref = madnlp(opf.build(nb=30, seed=1))
    stats = madnlp(
        opf.build(nb=30, seed=1),
        kkt_system=KKTSystem.SPARSE_CONDENSED,
        tol=1e-6,
    )
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert abs(stats.objective - ref.objective) < 1e-4


def test_acopf_mixed_precision():
    ref = madnlp(opf.build(nb=30, seed=2))
    stats = madnlp(opf.build(nb=30, seed=2), dtype="float32")
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert stats.iter == ref.iter  # f32 factor + f64 refinement: same path
    assert abs(stats.objective - ref.objective) < 1e-6


def test_acopf_multi_scenario_batch():
    """Perturbed-load scenarios vmapped through the whole solver (the
    multi-scenario ACOPF configuration from BASELINE.json)."""
    model = opf.build(nb=20, seed=3, parametric=True)
    solver = MadNLPSolver(model)
    scales = jnp.asarray([0.95, 1.0, 1.02, 1.05])
    st = solver.solve_batch(scales)
    summ = batch_summary(solver.prob, st)
    assert (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()
    # heavier load -> more expensive generation
    assert np.all(np.diff(summ["objective"]) > 0)


def test_analytic_derivatives_match_ad():
    """The closed-form polar dSbus/d2Sbus derivatives must equal JAX AD to
    machine precision, and produce the identical solve trajectory."""
    import jax.numpy as jnp

    ma = opf.build(nb=25, seed=3, analytic=True)
    mr = opf.build(nb=25, seed=3, analytic=False)
    rng = np.random.default_rng(0)
    for _ in range(2):
        x = jnp.asarray(mr.x0 + 0.1 * rng.standard_normal(mr.n))
        y = jnp.asarray(rng.standard_normal(mr.m))
        np.testing.assert_allclose(
            np.asarray(ma.jac(x)), np.asarray(mr.jac(x)), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ma.lag_hess(x, y, 0.7)),
            np.asarray(mr.lag_hess(x, y, 0.7)),
            atol=1e-11,
        )
    sa = madnlp(opf.build(nb=25, seed=3, analytic=True), print_level="error")
    sr = madnlp(opf.build(nb=25, seed=3, analytic=False), print_level="error")
    assert sa.status == Status.SOLVE_SUCCEEDED
    assert sa.iter == sr.iter
    assert sa.objective == pytest.approx(sr.objective, rel=1e-10)
