"""Adaptive barrier strategies — analogue of the reference regression test
(test/madnlp_test.jl:262-276): adaptive barriers reach the same optimum as
the monotone reference."""

import numpy as np
import pytest

from madnlp_tpu import BarrierUpdate, Status, madnlp
from madnlp_tpu.models.instances import dummy_qp, hs15


@pytest.mark.parametrize(
    "barrier", [BarrierUpdate.QUALITY_FUNCTION, BarrierUpdate.LOQO]
)
@pytest.mark.parametrize(
    "model_fn", [lambda: hs15.build(x0=(1.0, 1.0)), lambda: dummy_qp.build(20, 5)]
)
def test_adaptive_barrier_matches_monotone(barrier, model_fn):
    ref = madnlp(model_fn())
    stats = madnlp(model_fn(), barrier=barrier)
    assert stats.status in (
        Status.SOLVE_SUCCEEDED,
        Status.SOLVED_TO_ACCEPTABLE_LEVEL,
    ), stats
    np.testing.assert_allclose(stats.solution, ref.solution, atol=1e-6)


def test_adaptive_faster_or_equal_on_qp():
    # adaptive rules typically cut iterations on well-behaved QPs
    mono = madnlp(dummy_qp.build(30, 8))
    qf = madnlp(dummy_qp.build(30, 8), barrier=BarrierUpdate.QUALITY_FUNCTION)
    assert qf.status == Status.SOLVE_SUCCEEDED
    assert qf.iter <= mono.iter + 5  # sanity bound, not a strict speed claim
