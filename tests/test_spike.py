"""Partitioned (SPIKE/nested-dissection-over-band) banded LDLᵀ — ops/spike.py.

Contract: the partitioned factorization must reproduce direct solves to
roundoff, report exact inertia (Haynsworth), and — golden rule — leave
IPM trajectories bit-identical in iteration count (reference test
discipline: test/madnlp_dense.jl:8-53 analogue)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madnlp_tpu.ops.spike import (
    SpikeStructure,
    spike_factorize,
    spike_inertia,
    spike_solve,
)


def _random_banded(N, W, seed=0, indefinite=False):
    """Random symmetric banded matrix (dense, plus its lower COO)."""
    rng = np.random.default_rng(seed)
    A = np.zeros((N, N))
    for i in range(N):
        for j in range(max(0, i - W), i + 1):
            A[i, j] = A[j, i] = rng.normal() * 0.3
    diag = np.abs(A).sum(axis=1) + 1.0  # strictly diagonally dominant
    if indefinite:
        sign = np.where(rng.uniform(size=N) < 0.3, -1.0, 1.0)
        diag = diag * sign
    A[np.arange(N), np.arange(N)] = diag
    rows, cols = np.tril_indices(N)
    keep = A[rows, cols] != 0.0
    return A, rows[keep], cols[keep]


def _make(A, rows, cols, N, block, nparts, dtype=jnp.float64):
    st = SpikeStructure(rows, cols, N, np.arange(N, dtype=np.int64),
                        block, nparts)
    vals = jnp.asarray(A[rows, cols])
    bufs = st.assemble(st.map(rows, cols), vals, dtype)
    return st, bufs


@pytest.mark.parametrize(
    "N,W,block,nparts,indefinite",
    [
        (900, 24, 32, 4, False),
        (900, 24, 32, 0, True),    # auto partition count
        (1000, 40, 64, 3, True),   # ragged: identity padding in play
        (512, 8, 16, 6, False),
    ],
)
def test_spike_matches_dense(N, W, block, nparts, indefinite):
    A, rows, cols = _random_banded(N, W, seed=N + W, indefinite=indefinite)
    st, bufs = _make(A, rows, cols, N, block, nparts)
    f = spike_factorize(st, bufs)

    rhs = jnp.asarray(np.random.default_rng(1).normal(size=(N, 3)))
    x = spike_solve(st, f, rhs)
    np.testing.assert_allclose(A @ np.asarray(x), np.asarray(rhs),
                               rtol=1e-8, atol=1e-8)

    # exact inertia (Haynsworth additivity) vs eigenvalues
    ev = np.linalg.eigvalsh(A)
    pos, zero, neg = spike_inertia(st, f)
    assert int(pos) == int((ev > 0).sum())
    assert int(neg) == int((ev < 0).sum())
    assert int(zero) == 0


def test_spike_jittable_and_shapes():
    N, W, block = 800, 16, 32
    A, rows, cols = _random_banded(N, W, seed=7)
    st, bufs = _make(A, rows, cols, N, block, 4, dtype=jnp.float32)

    f = jax.jit(lambda b: spike_factorize(st, b))(bufs)
    rhs = jnp.asarray(np.random.default_rng(2).normal(size=N), jnp.float32)
    x = jax.jit(lambda f, r: spike_solve(st, f, r))(f, rhs)
    assert x.shape == (N,)
    res = np.abs(A @ np.asarray(x, np.float64) - np.asarray(rhs, np.float64))
    assert res.max() < 1e-3  # f32 factorization


def test_spike_golden_rule_opf():
    """Whole-solver golden rule: banded_partitions must not change the
    trajectory (identical iteration counts, objective to 1e-10)."""
    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.models.instances import opf

    model = opf.build_sparse(nb=120, seed=0)
    ref = MadNLPSolver(model, linear_solver=LinearSolver.BANDED).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED

    model2 = opf.build_sparse(nb=120, seed=0)
    sp = MadNLPSolver(
        model2, linear_solver=LinearSolver.BANDED, banded_partitions=3
    ).solve()
    assert sp.status == Status.SOLVE_SUCCEEDED
    assert sp.iter == ref.iter, "golden rule: identical iteration counts"
    assert sp.objective == pytest.approx(ref.objective, rel=1e-10)


def test_spike_golden_rule_case57_f32():
    """Real network, mixed-precision flagship config (f32 factorization +
    Ruiz + f64 refinement) with partitioning."""
    import os

    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.models import matpower

    case = matpower.parse_case(os.path.join(
        os.path.dirname(__file__), "data", "case57.m"))
    model = matpower.build_acopf(case, sparse=True)
    ref = MadNLPSolver(
        model, dtype="float32", linear_solver=LinearSolver.BANDED
    ).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED

    model2 = matpower.build_acopf(case, sparse=True)
    sp = MadNLPSolver(
        model2, dtype="float32", linear_solver=LinearSolver.BANDED,
        banded_partitions=2,
    ).solve()
    assert sp.status == Status.SOLVE_SUCCEEDED
    assert sp.iter == ref.iter
    assert sp.objective == pytest.approx(ref.objective, rel=1e-8)
