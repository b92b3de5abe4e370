"""COPS-family benchmark instances: structural variety beyond power grids
(pairwise objectives + many small equalities, collocation chains, large
bound-constrained discretized PDEs)."""

import numpy as np
import pytest

from madnlp_tpu import Status, madnlp
from madnlp_tpu.models.instances import cops


def test_elec():
    model = cops.elec(np_=15, seed=0)
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    p = np.asarray(stats.solution).reshape(15, 3)
    # every electron exactly on the sphere
    assert np.abs(np.sum(p * p, axis=1) - 1.0).max() < 1e-7
    # known Thomson global minimum for N=15 is ~ 80.6702; local minima are
    # close, so only require the right energy neighborhood
    assert 80.0 < stats.objective < 82.0


def test_chain():
    model = cops.chain(nh=50)
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    # COPS reference optimum 5.06852 (continuous); trapezoid at nh=50 is
    # within O(h^2)
    assert stats.objective == pytest.approx(5.0685, abs=2e-2)
    u = np.asarray(stats.solution)
    # length and endpoint equality constraints hold at the slopes solution
    arc = np.sqrt(1 + u * u)
    h = 1.0 / 50
    assert 0.5 * h * np.sum(arc[:-1] + arc[1:]) == pytest.approx(4.0, abs=1e-7)
    y_end = 1.0 + 0.5 * h * np.sum(u[:-1] + u[1:])
    assert y_end == pytest.approx(3.0, abs=1e-7)


def test_torsion():
    model = cops.torsion(nx=16)
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert stats.objective < 0.0  # energy decreases from v=0
    v = np.asarray(stats.solution).reshape(17, 17)
    dist = model.uvar.reshape(17, 17)
    assert (v <= dist + 1e-6).all() and (v >= -dist - 1e-6).all()
    # the plastic (active-bound) ring near the boundary for c=5
    assert v[1, 8] == pytest.approx(dist[1, 8], abs=1e-4)
    assert v[8, 8] > 0.2  # elastic core lifted well off zero


def test_minsurf_obstacle():
    model = cops.minsurf(nx=16)
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    v = np.asarray(stats.solution).reshape(17, 17)
    assert np.abs(v[0, :]).max() < 1e-8  # boundary fixed
    assert v[8, 8] >= 1.0 - 1e-6         # obstacle active at centre
    assert stats.objective > 1.0          # flat square has area exactly 1
    # tightening the mesh should not move the area much
    coarse = madnlp(cops.minsurf(nx=8))
    assert abs(coarse.objective - stats.objective) < 0.5
