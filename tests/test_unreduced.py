"""Unreduced KKT system (bound duals in-matrix, √z symmetrization) — must
match the reduced reference exactly (golden rule)."""

import numpy as np
import pytest

from madnlp_tpu import KKTSystem, Status, madnlp
from madnlp_tpu.models.instances import dummy_qp, hs15


@pytest.mark.parametrize(
    "model_fn,iter_slack",
    [
        (lambda: hs15.build(x0=(1.0, 1.0)), 0),
        (lambda: dummy_qp.build(20, 5), 0),
        (lambda: dummy_qp.build(20, 5, equality_cons=[1, 3]), 0),
        # fixed variables: dual-degenerate (zeroed jac column) — the
        # unreduced trajectory may differ by an iteration
        (lambda: dummy_qp.build(20, 5, fixed_variables=[2]), 1),
    ],
)
def test_unreduced_matches_reduced(model_fn, iter_slack):
    ref = madnlp(model_fn())
    s = madnlp(model_fn(), kkt_system=KKTSystem.SPARSE_UNREDUCED)
    assert s.status == Status.SOLVE_SUCCEEDED
    assert abs(s.iter - ref.iter) <= iter_slack
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-7)
    # multipliers can split non-uniquely between y and the bound duals when
    # constraint rows align with active bounds; assert optimality instead
    assert s.dual_feas < 1e-7 and s.primal_feas < 1e-7
    if iter_slack == 0:
        np.testing.assert_allclose(s.multipliers, ref.multipliers, atol=5e-2)


def test_sparse_unreduced_matches_reference():
    """Sparse-storage unreduced system (SparseUnreducedKKT): bound-dual rows
    interleaved after their variables in the banded ordering."""
    import numpy as np
    from madnlp_tpu import KKTSystem, LinearSolver, Status, madnlp
    from madnlp_tpu.kkt.unreduced import SparseUnreducedKKT
    from madnlp_tpu.models.instances import sparse_qp

    ref = madnlp(sparse_qp.build(n=120, m=30, n_eq=4), kkt_system=KKTSystem.SPARSE)
    for lin in (LinearSolver.LDL, LinearSolver.BANDED):
        s = madnlp(
            sparse_qp.build(n=120, m=30, n_eq=4),
            kkt_system=KKTSystem.SPARSE_UNREDUCED,
            linear_solver=lin,
        )
        assert s.status == Status.SOLVE_SUCCEEDED
        np.testing.assert_allclose(s.solution, ref.solution, atol=1e-7)


def test_sparse_unreduced_banded_f32():
    import numpy as np
    from madnlp_tpu import KKTSystem, LinearSolver, Status, madnlp
    from madnlp_tpu.models.instances import opf

    s = madnlp(
        opf.build_sparse(nb=30, seed=1),
        kkt_system=KKTSystem.SPARSE_UNREDUCED,
        linear_solver=LinearSolver.BANDED,
        dtype="float32",
    )
    assert s.status == Status.SOLVE_SUCCEEDED
