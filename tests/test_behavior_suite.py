"""The reference behavior suite (`test_madnlp`, MadNLPTests.jl:112-456):
pathological models with reference solutions/multipliers."""

import numpy as np
import pytest

from madnlp_tpu import MadNLPOptions, Status, madnlp
from madnlp_tpu.models.instances import suite


def test_lootsma():
    stats = madnlp(suite.lootsma())
    assert stats.status == Status.SOLVE_SUCCEEDED
    tol = np.sqrt(1e-8)
    np.testing.assert_allclose(
        stats.solution[1:], suite.LOOTSMA_SOLUTION, atol=tol, rtol=tol
    )
    np.testing.assert_allclose(
        stats.multipliers, suite.LOOTSMA_MULTIPLIERS, atol=tol, rtol=tol
    )
    np.testing.assert_allclose(stats.multipliers_L[1:], 0.0, atol=tol)
    np.testing.assert_allclose(stats.multipliers_U[1:], 0.0, atol=tol)


def test_eigmina():
    stats = madnlp(suite.eigmina())
    assert stats.status == Status.SOLVE_SUCCEEDED
    # minimal "eigenvalue" is 1 (x_101 = 1 at the optimum)
    np.testing.assert_allclose(stats.objective, 1.0, atol=1e-6)


def test_nls():
    stats = madnlp(suite.nls())
    assert stats.status == Status.SOLVE_SUCCEEDED
    # optimum lies on the bound corner: complementarity (z·d ≈ tol) leaves
    # the iterate ~sqrt(tol) inside the bound
    np.testing.assert_allclose(stats.solution, [1.0, 1.0], atol=1e-3)
    assert stats.objective < 1e-7


def test_infeasible():
    stats = madnlp(suite.infeasible())
    assert stats.status == Status.INFEASIBLE_PROBLEM_DETECTED


def test_unbounded():
    stats = madnlp(suite.unbounded())
    assert stats.status == Status.DIVERGING_ITERATES
