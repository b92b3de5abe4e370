"""Unit tests for the blocked LDLᵀ and the dense-solver dispatch layer.

Differential-tested against numpy (the SURVEY.md §4 strategy: serial
reference implementations stand in for the Julia originals)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu.ops import ldlt
from madnlp_tpu.ops import dense_solvers as ds
from madnlp_tpu.utils.options import LinearSolver


def random_symmetric(n, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    if spd:
        A = A @ A.T + n * np.eye(n)
    return A


@pytest.mark.parametrize("n", [1, 5, 64, 130])
def test_ldlt_roundtrip(n):
    A = random_symmetric(n, seed=n, spd=True)
    b = np.random.default_rng(1).standard_normal(n)
    f = ldlt.ldlt_factorize(jnp.asarray(A), block=32)
    x = ldlt.ldlt_solve(f, jnp.asarray(b))
    np.testing.assert_allclose(A @ np.asarray(x), b, rtol=1e-9, atol=1e-9)


def test_ldlt_indefinite_inertia():
    # Saddle-point matrix: [[H, J'], [J, 0]] with H SPD (n=6), J (2,6) full
    # rank has inertia (6, 0, 2).
    rng = np.random.default_rng(3)
    H = random_symmetric(6, seed=7, spd=True)
    J = rng.standard_normal((2, 6))
    K = np.block([[H, J.T], [J, np.zeros((2, 2))]])
    f = ldlt.ldlt_factorize(jnp.asarray(K), block=4)
    pos, zero, neg = ldlt.ldlt_inertia(f)
    assert int(pos) == 6 and int(zero) == 0 and int(neg) == 2
    # solve also matches numpy
    b = rng.standard_normal(8)
    x = ldlt.ldlt_solve(f, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, b), rtol=1e-8, atol=1e-8)


def test_ldlt_matches_eigh_inertia():
    for seed in range(5):
        A = random_symmetric(20, seed=seed)
        w = np.linalg.eigvalsh(A)
        f = ldlt.ldlt_factorize(jnp.asarray(A), block=8)
        pos, zero, neg = ldlt.ldlt_inertia(f)
        assert int(pos) == int(np.sum(w > 0))
        assert int(neg) == int(np.sum(w < 0))
        assert int(zero) == 0


def test_ldlt_singular_detected():
    # Rank-deficient matrix: zero pivot must be reported, not poison result.
    A = np.zeros((4, 4))
    A[0, 0] = 2.0
    A[1, 1] = 3.0  # rows 2,3 zero
    f = ldlt.ldlt_factorize(jnp.asarray(A), block=4)
    pos, zero, neg = ldlt.ldlt_inertia(f)
    assert int(pos) == 2 and int(zero) == 2 and int(neg) == 0


def test_ldlt_multi_rhs():
    A = random_symmetric(33, seed=11, spd=True)
    B = np.random.default_rng(2).standard_normal((33, 4))
    f = ldlt.ldlt_factorize(jnp.asarray(A), block=16)
    X = ldlt.ldlt_solve(f, jnp.asarray(B))
    np.testing.assert_allclose(A @ np.asarray(X), B, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize(
    "solver",
    [LinearSolver.LDL, LinearSolver.CHOLESKY, LinearSolver.LU,
     LinearSolver.EVD, LinearSolver.QR],
)
def test_dense_solver_dispatch(solver):
    A = random_symmetric(24, seed=5, spd=True)
    b = np.random.default_rng(4).standard_normal(24)
    f = ds.factorize(jnp.asarray(A), solver)
    x = ds.solve(f, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-7, atol=1e-8)
    if ds.has_inertia(solver):
        pos, zero, neg = ds.inertia(f)
        assert int(pos) == 24 and int(zero) == 0 and int(neg) == 0


def test_cholesky_failure_inertia():
    A = -np.eye(4)  # not SPD
    f = ds.factorize(jnp.asarray(A), LinearSolver.CHOLESKY)
    pos, zero, neg = ds.inertia(f)
    assert int(pos) == 0 and int(zero) == 4  # lapack_common.jl:100-102 convention


def test_ldlt_inside_jit_and_while_carry():
    # The factor must be able to ride through jit and while_loop carries.
    A = jnp.asarray(random_symmetric(16, seed=9, spd=True))
    b = jnp.ones(16)

    @jax.jit
    def run(A, b):
        f = ds.factorize(A, LinearSolver.LDL)

        def body(carry):
            i, f, x = carry
            x = ds.solve(f, b)
            return i + 1, f, x

        def cond(carry):
            return carry[0] < 2

        _, _, x = jax.lax.while_loop(cond, body, (0, f, jnp.zeros(16)))
        return x

    x = run(A, b)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), np.asarray(b), rtol=1e-9)


def test_block_cholesky_saddle():
    """Range-space factorization of [W A'; A C] matches a direct solve and
    reports the quasidefinite inertia (nw, 0, m)."""
    rng = np.random.default_rng(7)
    nw, m = 20, 6
    W = random_symmetric(nw, seed=1, spd=True)
    A = rng.standard_normal((m, nw))
    C = -np.diag(rng.uniform(0.1, 1.0, m))
    K = np.block([[W, A.T], [A, C]])
    b = rng.standard_normal(nw + m)
    for mode in ("trisolve", "inverse"):
        f = ds.factorize(
            jnp.asarray(K), LinearSolver.BLOCK_CHOLESKY, solve_mode=mode,
            split=nw,
        )
        x = ds.solve(f, jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(K, b), rtol=1e-8, atol=1e-8
        )
        pos, zero, neg = ds.inertia(f)
        assert (int(pos), int(zero), int(neg)) == (nw, 0, m)
    # multi-RHS
    B = rng.standard_normal((nw + m, 3))
    X = ds.solve(f, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(K, B), rtol=1e-8, atol=1e-8)


def test_block_cholesky_failure_modes():
    rng = np.random.default_rng(3)
    nw, m = 10, 4
    A = rng.standard_normal((m, nw))
    # indefinite W -> W-Cholesky fails -> inertia wrong (delta_w ladder)
    W_bad = random_symmetric(nw, seed=2, spd=False) - 10 * np.eye(nw)
    K1 = np.block([[W_bad, A.T], [A, np.zeros((m, m))]])
    f1 = ds.factorize(jnp.asarray(K1), LinearSolver.BLOCK_CHOLESKY, split=nw)
    pos, zero, neg = ds.inertia(f1)
    assert int(pos) != nw or int(zero) != 0
    # SPD W with rank-deficient A and C = 0 -> Schur singular -> zeros
    W = random_symmetric(nw, seed=4, spd=True)
    A_def = np.vstack([A[:3], A[2]])        # duplicated row
    K2 = np.block([[W, A_def.T], [A_def, np.zeros((m, m))]])
    f2 = ds.factorize(jnp.asarray(K2), LinearSolver.BLOCK_CHOLESKY, split=nw)
    pos, zero, neg = ds.inertia(f2)
    assert int(pos) == nw and int(zero) > 0
