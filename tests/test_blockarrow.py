"""Block-arrowhead LDLᵀ (ops/blockarrow.py) — contract + golden-rule tests.

Mirrors the reference's linear-solver contract (factorize/solve/inertia,
lib/MadNLPTests/src/MadNLPTests.jl:24-51) and the iteration-count golden
rule used throughout the suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu import KKTSystem, LinearSolver, MadNLPSolver, Status
from madnlp_tpu.kkt.sparse import _sorted_scatter_map
from madnlp_tpu.models.instances import opf, sparse_qp
from madnlp_tpu.ops.blockarrow import (
    ArrowStructure,
    arrow_factorize,
    arrow_inertia,
    arrow_solve,
)


def _random_quasidef(N=300, w=9, seed=0):
    """Random symmetric matrix with banded-ish pattern and mixed inertia."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(N):
        rows.append(i)
        cols.append(i)
        vals.append(5.0 + rng.random() if i % 3 else -(2.0 + rng.random()))
        for j in range(max(0, i - w), i):
            if rng.random() < 0.4:
                rows.append(i)
                cols.append(j)
                vals.append(0.3 * rng.standard_normal())
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    K = np.zeros((N, N))
    K[rows, cols] += vals
    K[cols, rows] += vals
    K[np.arange(N), np.arange(N)] /= 2.0
    return rows, cols, vals, K


def _factor(struct, rows, cols, vals):
    fidx = struct.map(rows, cols)
    order, idx_sorted = _sorted_scatter_map(fidx)
    Ablk, C, Asep = struct.assemble(
        jnp.asarray(idx_sorted), jnp.asarray(vals)[order], sorted_indices=True
    )
    return arrow_factorize(struct, Ablk, C, Asep)


@pytest.mark.parametrize("nparts", [0, 3, 8])
def test_arrow_solve_and_inertia(nparts):
    rows, cols, vals, K = _random_quasidef()
    N = K.shape[0]
    struct = ArrowStructure(rows, cols, N, nparts=nparts)
    f = _factor(struct, rows, cols, vals)

    rng = np.random.default_rng(1)
    b = rng.standard_normal(N)
    x = np.asarray(arrow_solve(struct, f, jnp.asarray(b)))
    assert np.linalg.norm(K @ x - b) / np.linalg.norm(b) < 1e-12

    B = rng.standard_normal((N, 4))
    X = np.asarray(arrow_solve(struct, f, jnp.asarray(B)))
    assert np.linalg.norm(K @ X - B) / np.linalg.norm(B) < 1e-12

    ev = np.linalg.eigvalsh(K)
    pos, zero, neg = (int(v) for v in arrow_inertia(struct, f))
    assert (pos, zero, neg) == (int((ev > 0).sum()), 0, int((ev < 0).sum()))


def test_arrow_jittable():
    rows, cols, vals, K = _random_quasidef(N=120, w=5)
    struct = ArrowStructure(rows, cols, K.shape[0], nparts=4)
    fidx = struct.map(rows, cols)
    order, idx_sorted = _sorted_scatter_map(fidx)

    @jax.jit
    def solve(v, b):
        Ablk, C, Asep = struct.assemble(
            jnp.asarray(idx_sorted), v[order], sorted_indices=True
        )
        f = arrow_factorize(struct, Ablk, C, Asep)
        return arrow_solve(struct, f, b)

    b = np.random.default_rng(2).standard_normal(K.shape[0])
    x = np.asarray(solve(jnp.asarray(vals), jnp.asarray(b)))
    assert np.linalg.norm(K @ x - b) / np.linalg.norm(b) < 1e-12


@pytest.mark.parametrize(
    "model_fn",
    [
        lambda: sparse_qp.build(n=80, m=30, seed=1),
        lambda: opf.build_sparse(nb=30, seed=0),
    ],
)
def test_arrow_golden_iteration_counts(model_fn):
    """BLOCK_ARROW must reproduce the dense-LDL reference trajectory."""
    ref = MadNLPSolver(
        model_fn(), kkt_system=KKTSystem.SPARSE, linear_solver=LinearSolver.LDL
    ).solve()
    arw = MadNLPSolver(
        model_fn(),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BLOCK_ARROW,
    ).solve()
    assert ref.status == arw.status == Status.SOLVE_SUCCEEDED
    assert ref.iter == arw.iter
    np.testing.assert_allclose(ref.solution, arw.solution, atol=1e-7)


def test_arrow_f32_and_unreduced():
    model = opf.build_sparse(nb=30, seed=0)
    ref = MadNLPSolver(
        model, kkt_system=KKTSystem.SPARSE, linear_solver=LinearSolver.LDL
    ).solve()
    f32 = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BLOCK_ARROW,
        dtype="float32",
    ).solve()
    assert f32.status == Status.SOLVE_SUCCEEDED
    assert f32.iter == ref.iter
    unr = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SPARSE_UNREDUCED,
        linear_solver=LinearSolver.BLOCK_ARROW,
    ).solve()
    assert unr.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(unr.solution, ref.solution, atol=1e-7)
