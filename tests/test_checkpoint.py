"""Checkpoint / resume: interrupt a solve mid-way, save the state pytree,
restore into a fresh solver, and finish to the same optimum."""

import numpy as np

from madnlp_tpu import MadNLPSolver, Status
from madnlp_tpu.models.instances import dummy_qp
from madnlp_tpu.utils.checkpoint import load_state, save_state
from madnlp_tpu.utils.status import Status as S


def test_checkpoint_resume(tmp_path):
    ref = MadNLPSolver(dummy_qp.build(20, 5)).solve()

    # run 4 iterations, checkpoint
    solver = MadNLPSolver(dummy_qp.build(20, 5))
    st = solver._init_fn()
    for _ in range(4):
        st = solver._regular(st)
    path = str(tmp_path / "ckpt")
    save_state(st, path)

    # restore into a brand-new solver and continue the hosted loop
    solver2 = MadNLPSolver(dummy_qp.build(20, 5))
    st2 = load_state(path, solver2._init_fn())
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(st.x))
    while int(st2.status) in (int(S.REGULAR), int(S.RESTORE), int(S.ROBUST)):
        st2 = solver2._regular(st2)
    assert int(st2.status) == int(Status.SOLVE_SUCCEEDED)
    solver2.state = st2
    stats = solver2._stats(st2, 0.0)
    np.testing.assert_allclose(stats.solution, ref.solution, atol=1e-9)
    assert stats.iter == ref.iter  # identical trajectory across the resume


def test_checkpoint_cross_config_ctx_layout(tmp_path):
    """A state saved under the monotone barrier (scalar-stub ctx,
    ipm/step.py persist_context) must load into an adaptive-barrier
    solver's template (full ctx payload) and vice versa: the ctx leaves
    are recomputed at the next factorization, so load_state keeps the
    template's value when shapes differ (ADVICE r4 regression)."""
    from madnlp_tpu.utils.options import BarrierUpdate

    solver = MadNLPSolver(dummy_qp.build(20, 5))  # monotone default
    st = solver._init_fn()
    for _ in range(2):
        st = solver._regular(st)
    path = str(tmp_path / "ckpt_mono")
    save_state(st, path)

    adaptive = MadNLPSolver(
        dummy_qp.build(20, 5), barrier=BarrierUpdate.QUALITY_FUNCTION
    )
    st2 = load_state(path, adaptive._init_fn())
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(st.x))
    # and the reverse direction: full payload saved, stub template
    path2 = str(tmp_path / "ckpt_adap")
    sta = adaptive._init_fn()
    sta = adaptive._regular(sta)
    save_state(sta, path2)
    st3 = load_state(path2, solver._init_fn())
    np.testing.assert_array_equal(np.asarray(st3.x), np.asarray(sta.x))


def test_gmres_iterator_matches():
    from madnlp_tpu import madnlp

    ref = madnlp(dummy_qp.build(15, 4))
    s = madnlp(dummy_qp.build(15, 4), iterator="gmres")
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-9)
