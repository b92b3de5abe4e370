"""Block-banded LDLᵀ (ops/banded.py) — the TPU-native sparse direct
factorization: kernel-level correctness vs dense reference, and the
golden rule (identical iteration counts vs the dense-storage path,
reference pattern: test/madnlp_dense.jl:8-53)."""

import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu import KKTSystem, LinearSolver, MadNLPSolver, Status, madnlp
from madnlp_tpu.models.instances import hs15, opf, sparse_qp
from madnlp_tpu.ops.banded import (
    BandStructure,
    banded_factorize,
    banded_inertia,
    banded_solve,
    ruiz_coo,
)


def _random_banded(N=97, W=11, block=8, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(N):
        for j in range(max(0, i - W), i + 1):
            if i == j or rng.random() < 0.6:
                rows.append(i)
                cols.append(j)
                v = rng.standard_normal()
                if i == j:
                    v += 5.0 * np.sign(rng.standard_normal())
                vals.append(v)
    rows, cols, vals = map(np.array, (rows, cols, vals))
    K = np.zeros((N, N))
    K[rows, cols] += vals
    K = K + np.tril(K, -1).T
    return rows, cols, vals, K


def test_banded_kernel_solve_and_inertia():
    rng = np.random.default_rng(1)
    rows, cols, vals, K = _random_banded()
    N = K.shape[0]
    st = BandStructure(rows, cols, N, block=8)
    band = st.assemble(jnp.asarray(st.map(rows, cols)), jnp.asarray(vals), jnp.float64)
    f = banded_factorize(st, band)
    B = rng.standard_normal((N, 3))
    Xp = banded_solve(st, f, jnp.asarray(B[st.perm]))
    X = np.empty((N, 3))
    X[st.perm] = np.asarray(Xp)
    assert np.abs(K @ X - B).max() < 1e-10
    w = np.linalg.eigvalsh(K)
    pos, zero, neg = banded_inertia(st, f)
    assert (int(pos), int(zero), int(neg)) == ((w > 0).sum(), 0, (w < 0).sum())


def test_banded_ruiz_equilibrates():
    rows, cols, vals, K = _random_banded(seed=3)
    N = K.shape[0]
    d = np.asarray(ruiz_coo(jnp.asarray(vals), jnp.asarray(rows), jnp.asarray(cols), N))
    Ks = d[:, None] * K * d[None, :]
    rn = np.abs(Ks).max(axis=1)
    assert rn.max() < 1.01 and rn.min() > 0.99


def test_banded_golden_rule_sparse_qp():
    ref = madnlp(sparse_qp.build(n=200, m=50), kkt_system=KKTSystem.SPARSE)
    s = madnlp(
        sparse_qp.build(n=200, m=50),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BANDED,
    )
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-8)


def test_banded_hs15():
    s = madnlp(
        hs15.build_sparse(),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BANDED,
    )
    assert s.status == Status.SOLVE_SUCCEEDED


def test_banded_f32_matches_f64_iterations():
    """The quasidefinite interleaved ordering keeps unpivoted LDLᵀ stable in
    f32: identical trajectory to f64 on sparse ACOPF."""
    runs = {}
    for dt in ("float64", "float32"):
        sv = MadNLPSolver(
            opf.build_sparse(nb=40, seed=2),
            kkt_system=KKTSystem.SPARSE,
            linear_solver=LinearSolver.BANDED,
            dtype=dt,
        )
        runs[dt] = sv.solve()
        assert runs[dt].status == Status.SOLVE_SUCCEEDED
    assert runs["float32"].iter == runs["float64"].iter
    np.testing.assert_allclose(
        runs["float32"].solution, runs["float64"].solution, atol=1e-7
    )


def test_banded_condensed():
    s = madnlp(
        sparse_qp.build(n=150, m=40, n_eq=5),
        kkt_system=KKTSystem.SPARSE_CONDENSED,
        linear_solver=LinearSolver.BANDED,
        tol=1e-6,
    )
    assert s.status == Status.SOLVE_SUCCEEDED


def test_banded_opf_matches_dense():
    ref = madnlp(opf.build_sparse(nb=40, seed=2), kkt_system=KKTSystem.SPARSE)
    s = madnlp(
        opf.build_sparse(nb=40, seed=2),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BANDED,
    )
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-8)


def test_pallas_banded_kernels_match_xla():
    """Fused Pallas VMEM kernels (ops/pallas_banded.py, interpreter mode on
    CPU) reproduce the XLA banded factorization/solve bit-for-bit at the
    solver level."""
    ref = madnlp(
        sparse_qp.build(n=100, m=25),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BANDED,
    )
    s = madnlp(
        sparse_qp.build(n=100, m=25),
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BANDED,
        banded_backend="pallas_interpret",
    )
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-9)


def test_pallas_stream_batch_grid_matches_per_element():
    """The batch-grid custom_vmap rule of the streaming kernels
    (interpret mode): vmap(factorize/solve) over a stacked batch must
    reproduce the per-element results exactly."""
    import jax

    from madnlp_tpu.ops import pallas_banded_stream as pb
    from madnlp_tpu.ops.banded import BandStructure

    rng = np.random.default_rng(3)
    N, b = 96, 32
    diag = np.arange(N)
    off = np.arange(N - 20)
    rows = np.concatenate([diag, off + 20])
    cols = np.concatenate([diag, off])
    struct = BandStructure(rows, cols, N, block=b)
    B = 3
    bands = []
    for i in range(B):
        vals = np.concatenate([
            np.full(N, 50.0 + i),                  # diagonally dominant
            rng.standard_normal(N - 20),
        ])
        idx = struct.map(rows, cols)
        bands.append(struct.assemble(jnp.asarray(idx), jnp.asarray(vals),
                                     jnp.float64))
    stack = jnp.stack(bands)

    fac_one = [pb.pallas_banded_factorize_stream(struct, bd, interpret=True)
               for bd in bands]
    fac_bat = jax.vmap(
        lambda bd: pb.pallas_banded_factorize_stream(struct, bd,
                                                     interpret=True)
    )(stack)
    nb = struct.nb
    for i in range(B):
        # compare REAL columns only: blocks nb..nbp-1 are band padding —
        # overhang steps write garbage there by design (kernel docstring)
        # and nothing ever reads them
        np.testing.assert_array_equal(np.asarray(fac_bat.band[i][:nb]),
                                      np.asarray(fac_one[i].band[:nb]))
        np.testing.assert_array_equal(np.asarray(fac_bat.invL[i][:nb]),
                                      np.asarray(fac_one[i].invL[:nb]))
        np.testing.assert_array_equal(np.asarray(fac_bat.d[i]),
                                      np.asarray(fac_one[i].d))

    rhs = jnp.asarray(rng.standard_normal((B, N)))
    x_one = [pb.pallas_banded_solve_stream(struct, fac_one[i], rhs[i],
                                           interpret=True)
             for i in range(B)]
    x_bat = jax.vmap(
        lambda f, r: pb.pallas_banded_solve_stream(struct, f, r,
                                                   interpret=True)
    )(fac_bat, rhs)
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(x_bat[i]),
                                      np.asarray(x_one[i]))
