"""Multi-host execution model (madnlp_tpu/parallel): hybrid DCN×ICI meshes,
instance-batch axis over "dp" (zero communication), Schur scenario axis over
"scen" (all-reduce at the two Schur reduction points, SURVEY.md §3.5).
Runs on the 8-virtual-device CPU mesh (conftest)."""

import jax.numpy as jnp
import numpy as np

from madnlp_tpu import KKTSystem, MadNLPSolver, Status
from madnlp_tpu.ipm.solver import batch_summary
from madnlp_tpu.models.instances import dummy_qp, twostage
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
