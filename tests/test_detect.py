"""Two-stage structure auto-detection (kkt/detect.py) — tag-based parity
with the reference (src/KKT/Schur/schur.jl:160-235) plus the structural
Jacobian-pattern inference the reference doesn't have."""

import numpy as np
import pytest

from madnlp_tpu import KKTSystem, MadNLPSolver, Status
from madnlp_tpu.kkt.detect import detect_two_stage, from_jac_structure, from_tags
from madnlp_tpu.models.instances import twostage


def _tags(ts):
    return dict(
        ns=ts.N,
        var_scenario=np.concatenate(
            [np.repeat(np.arange(1, ts.N + 1), ts.nv), np.zeros(ts.nd, int)]),
        con_scenario=np.repeat(np.arange(1, ts.N + 1), ts.ms),
    )


def test_from_tags_roundtrip():
    model, ts = twostage.build(N=4, nv=6, nd=3, ms=3)
    model.tags = _tags(ts)
    assert from_tags(model) == ts


def test_from_tags_validation():
    model, ts = twostage.build(N=2, nv=3, nd=2, ms=2)
    tags = _tags(ts)
    bad = dict(tags, con_scenario=np.array([0, 1, 2, 2]))
    model.tags = bad
    with pytest.raises(ValueError, match="design-only"):
        from_tags(model)
    # non-canonical variable order
    vs = tags["var_scenario"].copy()
    vs[0], vs[-1] = vs[-1], vs[0]
    model.tags = dict(tags, var_scenario=vs)
    with pytest.raises(ValueError, match="canonical"):
        from_tags(model)


def _twostage_jac_pattern(N, nv, nd, ms):
    rows, cols = [], []
    for k in range(N):
        r = np.repeat(np.arange(k * ms, (k + 1) * ms), nv + nd)
        c = np.tile(np.concatenate(
            [np.arange(k * nv, (k + 1) * nv),
             np.arange(N * nv, N * nv + nd)]), ms)
        rows.append(r)
        cols.append(c)
    return np.concatenate(rows), np.concatenate(cols)


def test_structural_detection():
    N, nv, nd, ms = 8, 5, 3, 4
    jr, jc = _twostage_jac_pattern(N, nv, nd, ms)
    ts = from_jac_structure(jr, jc, N * nv + nd, N * ms)
    assert (ts.N, ts.nv, ts.nd, ts.ms) == (N, nv, nd, ms)


def test_structural_rejects_cross_scenario_hessian():
    N, nv, nd, ms = 4, 5, 3, 4
    jr, jc = _twostage_jac_pattern(N, nv, nd, ms)
    n, m = N * nv + nd, N * ms
    # hessian entry coupling scenario 0 and scenario 2 variables
    hr, hc = np.array([2 * nv + 1]), np.array([1])
    assert from_jac_structure(jr, jc, n, m, hess_rows=hr, hess_cols=hc) is None
    # block-diagonal + design hessian is fine
    hr2 = np.array([0, 2 * nv + 1, N * nv + 1])
    hc2 = np.array([0, 2 * nv, 1])
    ts = from_jac_structure(jr, jc, n, m, hess_rows=hr2, hess_cols=hc2)
    assert ts is not None and ts.N == N


def test_structural_rejects_uncoupled():
    # diagonal jacobian with no design tail: not two-stage
    jr = jc = np.arange(12)
    assert from_jac_structure(jr, jc, 12, 12) is None


def test_solver_auto_detects_from_tags():
    model, ts = twostage.build(N=4, nv=6, nd=3, ms=3, seed=1)
    ref = MadNLPSolver(model, kkt_system=KKTSystem.SCHUR,
                       schur_structure=ts).solve()
    model2, _ = twostage.build(N=4, nv=6, nd=3, ms=3, seed=1)
    model2.tags = _tags(ts)
    st = MadNLPSolver(model2, kkt_system=KKTSystem.SCHUR).solve()
    assert st.status == Status.SOLVE_SUCCEEDED
    assert st.iter == ref.iter
    np.testing.assert_allclose(st.solution, ref.solution, atol=1e-9)
