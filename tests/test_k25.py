"""K2.5 scaled formulation (Ghannad/Orban/Saunders; reference
src/KKT/Sparse/scaled_augmented.jl) expressed as the analytic √Ξ
equilibration strategy."""

import numpy as np

from madnlp_tpu import KKTSystem, MadNLPSolver, Status, madnlp
from madnlp_tpu.models.instances import dummy_qp, hs15, opf


def test_k25_matches_default():
    ref = madnlp(dummy_qp.build(20, 5))
    s = madnlp(dummy_qp.build(20, 5), kkt_scaling="k25")
    assert s.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-8)


def test_k25_enables_f32_on_acopf():
    """f32 factorization of the augmented ACOPF system converges to 1e-8
    under the K2.5 scaling (conditioning-bounded formulation)."""
    s = MadNLPSolver(
        opf.build_sparse(nb=60, seed=0),
        kkt_system=KKTSystem.SPARSE,
        dtype="float32",
        kkt_scaling="k25",
        max_iter=100,
    ).solve()
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.dual_feas < 1e-8


def test_no_scaling_option():
    s = madnlp(hs15.build(), kkt_scaling="none")
    assert s.status == Status.SOLVE_SUCCEEDED


def test_scaled_sparse_kkt_system_alias():
    """KKTSystem.SCALED_SPARSE (the reference's ScaledSparseKKTSystem,
    scaled_augmented.jl) resolves to the augmented system with the analytic
    K2.5 scaling."""
    from madnlp_tpu import Status
    from madnlp_tpu.models.instances import dummy_qp

    st = madnlp(dummy_qp.build(20, 5), kkt_system="scaled_sparse")
    ref = madnlp(dummy_qp.build(20, 5), kkt_scaling="k25")
    assert st.status == Status.SOLVE_SUCCEEDED
    assert st.iter == ref.iter
