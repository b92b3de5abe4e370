"""Multi-host execution model (madnlp_tpu/parallel): hybrid DCN×ICI meshes,
instance-batch axis over "dp" (zero communication), Schur scenario axis over
"scen" (all-reduce at the two Schur reduction points, SURVEY.md §3.5).
Runs on the 8-virtual-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madnlp_tpu import KKTSystem, LinearSolver, MadNLPSolver, Status
from madnlp_tpu.ipm.solver import batch_summary
from madnlp_tpu.models.instances import dummy_qp, opf, twostage
from madnlp_tpu.parallel import batch_sharding, hybrid_mesh, scenario_sharding


def test_hybrid_mesh_axes():
    mesh = hybrid_mesh({"scen": 4}, {"dp": 2})
    assert mesh.axis_names == ("dp", "scen")
    assert mesh.devices.shape == (2, 4)


def test_batched_schur_on_2d_mesh():
    """Batch of two-stage instances over "dp" × scenarios over "scen" —
    the full multi-host decomposition on one mesh."""
    mesh = hybrid_mesh({"scen": 4}, {"dp": 2})
    model, ts = twostage.build(N=8, nv=6, nd=3, ms=3, n_eq=1, parametric=True)
    sv = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SCHUR,
        schur_structure=ts,
        schur_sharding=scenario_sharding(mesh),
    )
    # batched solve must agree with per-instance reference solves
    thetas = jnp.linspace(-1.0, 1.0, 4)
    stb = sv.solve_batch(thetas, sharding=batch_sharding(mesh))
    summ = batch_summary(sv.prob, stb)
    assert (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()

    ref_model, ref_ts = twostage.build(
        N=8, nv=6, nd=3, ms=3, n_eq=1, parametric=True
    )
    ref = MadNLPSolver(
        ref_model, kkt_system=KKTSystem.SCHUR, schur_structure=ref_ts
    )
    for i, th in enumerate(np.asarray(thetas)):
        ref.state = None  # fresh solve, no warm start
        st = ref.solve(params=jnp.asarray(th))
        assert st.iter == int(summ["iter"][i])
        np.testing.assert_allclose(st.objective, summ["objective"][i], rtol=1e-8)


def test_dp_batch_on_2d_mesh():
    """Instance batch on the "dp" axis of a 2D mesh (replicated over
    "scen") — the DCN data-parallel pattern."""
    mesh = hybrid_mesh({"scen": 4}, {"dp": 2})
    model = dummy_qp.build_parametric(12, 3)
    sv = MadNLPSolver(model)
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.standard_normal((6, 12)))
    stb = sv.solve_batch(qs, sharding=batch_sharding(mesh))
    summ = batch_summary(sv.prob, stb)
    assert (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()


def test_arrow_blocks_sharded_over_mesh():
    """Single-problem model parallelism: the block-arrowhead linear solver
    with its block axis sharded over the mesh — block factorizations run
    device-local, the Schur-complement reduction all-reduces.  Must match
    the unsharded solve exactly (same iteration count and solution)."""
    model = opf.build_sparse(nb=60, seed=0)
    ref = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BLOCK_ARROW,
        arrow_nparts=8,
    ).solve()
    mesh = Mesh(np.array(jax.devices()), ("blk",))
    st = MadNLPSolver(
        model,
        kkt_system=KKTSystem.SPARSE,
        linear_solver=LinearSolver.BLOCK_ARROW,
        arrow_nparts=8,
        arrow_sharding=NamedSharding(mesh, P("blk")),
    ).solve()
    assert st.status == ref.status == Status.SOLVE_SUCCEEDED
    assert st.iter == ref.iter
    np.testing.assert_allclose(st.solution, ref.solution, atol=1e-9)


def test_dense_kkt_factorization_sharded_over_mesh():
    """Single-problem tensor parallelism of ONE large dense KKT
    (MadNLPSolver(kkt_sharding=...), ops/ldlt.py GSPMD-distributed
    blocked LDLᵀ): whole solve converges with iteration parity vs the
    unsharded solver, and the factorization is genuinely distributed
    (the compiled factor lands sharded over the mesh axis).  The
    reference has no analogue — one device owns the whole KKT
    (SURVEY.md §2.5)."""
    mesh = Mesh(np.array(jax.devices()), ("kkt",))
    sharding = NamedSharding(mesh, P("kkt", None))

    ref = MadNLPSolver(opf.build(nb=40, seed=0)).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED

    solver = MadNLPSolver(opf.build(nb=40, seed=0), kkt_sharding=sharding)
    st = solver.solve()
    assert st.status == Status.SOLVE_SUCCEEDED
    assert st.iter == ref.iter
    np.testing.assert_allclose(st.solution, ref.solution, atol=1e-9)

    # the factor itself must be sharded (not constraint-then-gathered)
    from madnlp_tpu.ops.ldlt import ldlt_factorize

    rng = np.random.default_rng(0)
    A = rng.standard_normal((512, 512))
    A = jnp.asarray(A @ A.T + 512 * np.eye(512))
    f = jax.jit(lambda a: ldlt_factorize(a, block=64, sharding=sharding))(A)
    assert f.L.sharding.is_equivalent_to(sharding, 2)
