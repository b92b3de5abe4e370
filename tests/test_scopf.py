"""Security-constrained OPF on the Schur-complement KKT — the flagship
structured configuration (BASELINE.json), with the scenario axis sharded
over the virtual device mesh."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madnlp_tpu import KKTSystem, MadNLPSolver, Status
from madnlp_tpu.models.instances import scopf


def test_scopf_schur_matches_dense():
    model, ts = scopf.build(nb=10, N=3)
    ref = MadNLPSolver(model, kkt_system=KKTSystem.DENSE).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED

    model2, ts2 = scopf.build(nb=10, N=3)
    s = MadNLPSolver(
        model2, kkt_system=KKTSystem.SCHUR, schur_structure=ts2
    ).solve()
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-8)


def test_scopf_sharded_scenarios():
    mesh = Mesh(np.array(jax.devices()), ("scen",))
    sharding = NamedSharding(mesh, P("scen"))
    model, ts = scopf.build(nb=8, N=8)
    ref = MadNLPSolver(
        model, kkt_system=KKTSystem.SCHUR, schur_structure=ts
    ).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED

    model2, ts2 = scopf.build(nb=8, N=8)
    s = MadNLPSolver(
        model2,
        kkt_system=KKTSystem.SCHUR,
        schur_structure=ts2,
        schur_sharding=sharding,
    ).solve()
    assert s.status == Status.SOLVE_SUCCEEDED
    assert s.iter == ref.iter
    np.testing.assert_allclose(s.solution, ref.solution, atol=1e-9)
    # shared generation is identical across the solve; scenario states differ
    pg = s.solution[-ts2.nd :]
    assert pg.shape == (ts2.nd,)
