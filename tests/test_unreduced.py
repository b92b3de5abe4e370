"""Unreduced KKT system (bound duals in-matrix, √z symmetrization) — must
match the reduced reference exactly (golden rule)."""

import numpy as np
import pytest

from madnlp_tpu import KKTSystem, Status, madnlp
from madnlp_tpu.models.instances import dummy_qp, hs15


@pytest.mark.parametrize(
    "model_fn",
    [
        lambda: hs15.build(x0=(1.0, 1.0)),
        lambda: dummy_qp.build(20, 5),
        lambda: dummy_qp.build(20, 5, equality_cons=[1, 3]),
        lambda: dummy_qp.build(20, 5, fixed_variables=[2]),
    ],
)
def test_unreduced_matches_reduced(model_fn):
    ref = madnlp(model_fn())
    s = madnlp(model_fn(), kkt_system=KKTSystem.SPARSE_UNREDUCED)
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-7)
    # multipliers can split non-uniquely between y and the bound duals when
    # constraint rows align with active bounds; assert optimality instead
    assert s.dual_feas < 1e-7 and s.primal_feas < 1e-7
    np.testing.assert_allclose(s.multipliers, ref.multipliers, atol=5e-2)
