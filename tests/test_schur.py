"""Schur-complement KKT tests — analogue of test/schur_test.jl: the Schur
formulation must match the plain dense KKT reference exactly (iteration
counts + solutions)."""

import numpy as np
import pytest

from madnlp_tpu import KKTSystem, MadNLPSolver, Status
from madnlp_tpu.models.instances import twostage


@pytest.mark.parametrize(
    "cfg",
    [
        dict(N=4, nv=6, nd=3, ms=3, n_eq=1),
        dict(N=8, nv=5, nd=2, ms=2, n_eq=0),
        dict(N=3, nv=6, nd=4, ms=4, n_eq=2),  # mixed eq/ineq scenarios
    ],
)
def test_schur_matches_dense(cfg):
    model, ts = twostage.build(**cfg)
    ref = MadNLPSolver(model, kkt_system=KKTSystem.DENSE).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED

    model2, ts2 = twostage.build(**cfg)
    schur = MadNLPSolver(
        model2, kkt_system=KKTSystem.SCHUR, schur_structure=ts2
    ).solve()
    assert schur.status == Status.SOLVE_SUCCEEDED
    assert schur.iter == ref.iter, "golden rule: identical iteration counts"
    np.testing.assert_allclose(schur.solution, ref.solution, atol=1e-7)
    np.testing.assert_allclose(schur.multipliers, ref.multipliers, atol=1e-6)


def test_schur_jitted_whole_solve():
    model, ts = twostage.build(N=4, nv=4, nd=2, ms=2, n_eq=1)
    solver = MadNLPSolver(model, kkt_system=KKTSystem.SCHUR, schur_structure=ts)
    stats = solver.solve_jitted()
    assert stats.status == Status.SOLVE_SUCCEEDED


def test_schur_banded_blocks_match_dense_blocks():
    """schur_block_solver="banded" (flagship block-banded LDLᵀ inside each
    scenario block, kkt/schur.py SchurBandedFactor) must reproduce the
    dense-block Schur solve exactly — same golden rule as every other
    factorization swap.  SCOPF gives blocks with genuine network sparsity
    (models/instances/scopf.py); reference analogue: per-scenario sparse
    MUMPS under Schur (src/KKT/Schur/schur.jl:953-1001)."""
    from madnlp_tpu.models.instances import scopf

    for build_args in (
        dict(N=5, nv=4, nd=2, ms=2, n_eq=1),
        None,  # scopf below
    ):
        if build_args is None:
            model, ts = scopf.build(nb=14, N=3, seed=1)
            model2, ts2 = scopf.build(nb=14, N=3, seed=1)
        else:
            model, ts = twostage.build(**build_args)
            model2, ts2 = twostage.build(**build_args)
        ref = MadNLPSolver(
            model, kkt_system=KKTSystem.SCHUR, schur_structure=ts
        ).solve()
        assert ref.status == Status.SOLVE_SUCCEEDED
        s = MadNLPSolver(
            model2, kkt_system=KKTSystem.SCHUR, schur_structure=ts2,
            schur_block_solver="banded",
        ).solve()
        assert s.status == Status.SOLVE_SUCCEEDED
        assert s.iter == ref.iter, "golden rule: identical iteration counts"
        np.testing.assert_allclose(s.solution, ref.solution, atol=1e-7)


def test_schur_banded_blocks_sharded():
    """Mode-6 composition (VERDICT r4 #8): banded per-scenario blocks AND
    the scenario axis sharded over the virtual mesh — the flagship kernel
    under the Schur decomposition, with parity vs its unsharded self."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from madnlp_tpu.models.instances import scopf

    mesh = Mesh(np.array(jax.devices()), ("scen",))
    model, ts = scopf.build(nb=9, N=8, seed=0)
    ref = MadNLPSolver(
        model, kkt_system=KKTSystem.SCHUR, schur_structure=ts,
        schur_block_solver="banded",
    ).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED
    model2, ts2 = scopf.build(nb=9, N=8, seed=0)
    sharded = MadNLPSolver(
        model2, kkt_system=KKTSystem.SCHUR, schur_structure=ts2,
        schur_block_solver="banded",
        schur_sharding=NamedSharding(mesh, P("scen")),
    ).solve()
    assert sharded.status == Status.SOLVE_SUCCEEDED
    assert sharded.iter == ref.iter
    np.testing.assert_allclose(sharded.solution, ref.solution, atol=1e-9)


def test_schur_sharded_over_mesh():
    """Scenario axis sharded over the 8-virtual-device CPU mesh; results must
    be identical to the unsharded solve (SURVEY.md §4 differential pattern)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("scen",))
    sharding = NamedSharding(mesh, P("scen"))

    model, ts = twostage.build(N=8, nv=5, nd=3, ms=3, n_eq=1)
    ref = MadNLPSolver(
        model, kkt_system=KKTSystem.SCHUR, schur_structure=ts
    ).solve()
    assert ref.status == Status.SOLVE_SUCCEEDED

    model2, ts2 = twostage.build(N=8, nv=5, nd=3, ms=3, n_eq=1)
    sharded = MadNLPSolver(
        model2,
        kkt_system=KKTSystem.SCHUR,
        schur_structure=ts2,
        schur_sharding=sharding,
    ).solve()
    assert sharded.status == Status.SOLVE_SUCCEEDED
    assert sharded.iter == ref.iter
    np.testing.assert_allclose(sharded.solution, ref.solution, atol=1e-9)
