"""Batched (vmap) and data-parallel (sharded) solving of parametric NLP
instances — the whole-solver analogue of cuDSS uniform batching
(ext/MadNLPGPUCUDAExt/cudss.jl:139-148), run on the 8-virtual-device CPU
mesh per SURVEY.md §4's multi-device testing strategy."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madnlp_tpu import MadNLPSolver, Status
from madnlp_tpu.ipm.solver import batch_summary
from madnlp_tpu.models.instances import dummy_qp


def test_batched_solve_matches_individual():
    model = dummy_qp.build_parametric(20, 5)
    solver = MadNLPSolver(model)
    rng = np.random.default_rng(7)
    qs = jnp.asarray(rng.standard_normal((4, 20)))
    st = solver.solve_batch(qs)
    summ = batch_summary(solver.prob, st)
    assert (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()
    for i in range(4):
        ref = MadNLPSolver(dummy_qp.build_parametric(20, 5)).solve(params=qs[i])
        assert ref.status == Status.SOLVE_SUCCEEDED
        np.testing.assert_allclose(summ["x"][i], ref.solution, atol=1e-7)
        assert summ["iter"][i] == ref.iter


def test_batched_solve_chunked():
    model = dummy_qp.build_parametric(16, 4)
    solver = MadNLPSolver(model)
    rng = np.random.default_rng(5)
    qs = jnp.asarray(rng.standard_normal((8, 16)))
    st_full = solver.solve_batch(qs)
    st_chunk = solver.solve_batch(qs, chunk_size=4)
    s1 = batch_summary(solver.prob, st_full)
    s2 = batch_summary(solver.prob, st_chunk)
    np.testing.assert_array_equal(s1["status"], s2["status"])
    np.testing.assert_array_equal(s1["iter"], s2["iter"])
    np.testing.assert_allclose(s1["x"], s2["x"], atol=1e-12)


def test_batched_solve_sharded_over_mesh():
    ndev = len(jax.devices())
    assert ndev == 8, "conftest should provide 8 virtual CPU devices"
    mesh = Mesh(np.array(jax.devices()), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    model = dummy_qp.build_parametric(16, 4)
    solver = MadNLPSolver(model)
    rng = np.random.default_rng(3)
    qs = jnp.asarray(rng.standard_normal((8, 16)))
    st = solver.solve_batch(qs, sharding=sharding)
    summ = batch_summary(solver.prob, st)
    assert (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()
    # same answers as the unsharded batch
    st2 = solver.solve_batch(qs)
    np.testing.assert_allclose(
        summ["x"], batch_summary(solver.prob, st2)["x"], atol=1e-10
    )


def test_parametric_sparse_acopf_batch():
    """Load-scale parametric mode over the flagship sparse+banded path
    (round-4: the batching probe's configuration — benchmarks/probe_batch):
    scale=1 must reproduce the non-parametric trajectory exactly, and a
    scenario batch must converge lane-wise."""
    from madnlp_tpu import LinearSolver
    from madnlp_tpu.models.instances import opf

    ref = MadNLPSolver(
        opf.build_sparse(nb=60, seed=0), dtype="float32",
        linear_solver=LinearSolver.BANDED,
    ).solve()
    par = MadNLPSolver(
        opf.build_sparse(nb=60, seed=0, parametric=True), dtype="float32",
        linear_solver=LinearSolver.BANDED,
    )
    one = par.solve(params=jnp.ones(()))
    assert one.iter == ref.iter
    assert one.objective == pytest.approx(ref.objective, abs=1e-8)

    st = par.solve_batch(jnp.linspace(0.95, 1.05, 4))
    summ = batch_summary(par.prob, st)
    assert (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()


def test_parametric_matpower_case57():
    """Same contract for the real-case front end (matpower parametric)."""
    import os

    from madnlp_tpu import LinearSolver
    from madnlp_tpu.models import matpower

    case = matpower.parse_case(os.path.join(
        os.path.dirname(__file__), "data", "case57.m"))
    ref = MadNLPSolver(
        matpower.build_acopf(case, sparse=True), dtype="float32",
        linear_solver=LinearSolver.BANDED,
    ).solve()
    par = MadNLPSolver(
        matpower.build_acopf(case, sparse=True, parametric=True),
        dtype="float32", linear_solver=LinearSolver.BANDED,
    )
    one = par.solve(params=jnp.ones(()))
    assert one.iter == ref.iter
    assert one.objective == pytest.approx(ref.objective, rel=1e-9)


def test_batch_vmaps_pallas_backend_via_batch_grid():
    """`solve_batch` over a Pallas-banded solver: naive vmap of a
    pallas_call with ANY-space refs is rejected by Mosaic (the r5 nb600
    probe crash), so the streaming kernels carry batch-grid custom_vmap
    rules (ops/pallas_banded_stream.py _factorize_cv/_solve_cv).  The
    batched solve must run the SAME pallas backend (interpret mode here)
    and keep parity with single solves."""
    import jax.numpy as jnp
    import numpy as np

    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.ipm.solver import batch_summary
    from madnlp_tpu.models.instances import opf

    s = MadNLPSolver(
        opf.build_sparse(nb=48, seed=0, parametric=True), dtype="float32",
        linear_solver=LinearSolver.BANDED,
        banded_backend="pallas_interpret",
    )
    scales = jnp.linspace(0.95, 1.05, 4)
    summ = batch_summary(s.prob, s.solve_batch(scales))
    assert (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()
    ref = MadNLPSolver(
        opf.build_sparse(nb=48, seed=0, parametric=True), dtype="float32",
        linear_solver=LinearSolver.BANDED,
        banded_backend="pallas_interpret",
    )
    for i in (0, 3):
        ref.state = None
        st = ref.solve(params=scales[i])
        assert st.iter == int(summ["iter"][i])
        np.testing.assert_allclose(
            st.objective, summ["objective"][i], rtol=1e-8
        )
