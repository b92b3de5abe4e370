"""μ-aware Richardson stopping (RichardsonOptions.mu_scaled — opt-in).

Inexact-IPM refinement: the per-solve stopping target is
``max(tol, min(mu_tol_cap, mu_tol_factor·μ))`` instead of the reference's
fixed ``tol^(5/4)`` (src/LinearSolvers/backsolve.jl:27-76), so early
iterations stop refining ~1e2 below their own barrier scale.  The contract
this file pins: at representative scales the option saves backsolves
WITHOUT changing the trajectory (identical iteration counts, matching
objectives) — the property the flagship bench configuration relies on.
"""

import jax.numpy as jnp
import pytest

from madnlp_tpu import LinearSolver, MadNLPSolver, Status
from madnlp_tpu.models.instances import opf
from madnlp_tpu.utils.options import RichardsonOptions


def _solve(model, mu_scaled):
    sv = MadNLPSolver(
        model,
        dtype="float32",
        linear_solver=LinearSolver.BANDED,
        richardson=RichardsonOptions(mu_scaled=mu_scaled),
    )
    return sv.solve_jitted()


def test_mu_scaled_parity_and_savings():
    model = opf.build_sparse(nb=48, seed=0)
    ref = _solve(model, False)
    st = _solve(model, True)
    assert ref.status == st.status == Status.SOLVE_SUCCEEDED
    # trajectory parity: identical iteration count, objective to f64 noise
    assert int(st.iter) == int(ref.iter)
    assert abs(float(st.objective) - float(ref.objective)) <= 1e-8 * (
        1.0 + abs(float(ref.objective))
    )
    # the point of the option: strictly fewer refinement sweeps
    assert int(st.counters["backsolve_cnt"]) < int(ref.counters["backsolve_cnt"])


def test_mu_scaled_tightens_at_endgame():
    """The effective tol must return to the base tol as μ → 0 (the
    endgame's step accuracy is what the final KKT residuals inherit)."""
    model = opf.build_sparse(nb=24, seed=1)
    st = _solve(model, True)
    assert st.status == Status.SOLVE_SUCCEEDED
    # solved to the solver's own tol: primal/dual feasibility at 1e-8
    assert float(st.primal_feas) <= 1e-7
    assert float(st.dual_feas) <= 1e-7
