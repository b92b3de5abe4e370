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
