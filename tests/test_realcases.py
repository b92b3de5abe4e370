"""Validation on REAL standard test cases (VERDICT r1 item #1).

Each case file under tests/data/ is the standard MATPOWER distribution
data (reconstructed field-for-field; the reference's own benchmark corpus
is pglib-opf, which derives from the same networks — /root/reference/
README.md:59-68, docs/src/tutorials/gpu.md:11-12).  The assert anchors
the whole solver externally: the MATPOWER-published AC-OPF optimal
objectives below are the one ground truth available without network
egress, and a single wrong digit anywhere in parser, model, derivatives,
KKT assembly, factorization, or IPM moves the objective away from them.

Published values (MATPOWER `runopf` results, widely reproduced):
  case9    5296.69  $/hr
  case14   8081.53  $/hr
  case30    576.89  $/hr
  case57  41737.79  $/hr
  case118 129660.70 $/hr
"""

import os

import numpy as np
import pytest

from madnlp_tpu import Status, madnlp
from madnlp_tpu.models import matpower

DATA = os.path.join(os.path.dirname(__file__), "data")

# name -> (published objective $/hr, max IPM iterations allowed)
# The iteration budget is a regression tripwire: a trajectory regression
# (bad inertia handling, filter bug, scaling break) shows up as an
# iteration blow-up long before it shows up as a wrong answer.
# Budgets are the MEASURED default-config counts + 3 (VERDICT r2 #6) —
# measured 2026-08 (round 3): case9=12, case14=9, case30=21, case57=12,
# case118=15; the full measured-vs-published table is in
# docs/benchmarks.md ("Real-case trajectories"), which also records why
# the comparison column is objectives, not iteration counts.
CASES = {
    "case9": (5296.69, 15),
    "case14": (8081.53, 12),
    "case30": (576.89, 24),
    "case57": (41737.79, 15),
    "case118": (129660.70, 18),
}


@pytest.mark.parametrize("name", list(CASES))
def test_real_case_published_objective(name):
    obj_pub, max_iter = CASES[name]
    case = matpower.parse_case(os.path.join(DATA, f"{name}.m"))
    model = matpower.build_acopf(case, sparse=True)
    stats = madnlp(model, print_level="error")
    assert stats.status == Status.SOLVE_SUCCEEDED
    # tol=1e-8 KKT point vs published optimum: agreement to <1e-5 rel
    # validates BOTH the data reconstruction and the solver
    assert stats.objective == pytest.approx(obj_pub, rel=1e-5)
    assert stats.iter <= max_iter


def test_tiled_case118_x4_decoupled_objective():
    """REAL data at case1354 variable count (n=1376): four independent
    copies of the verified IEEE 118-bus system solved as ONE NLP must hit
    exactly 4x the published single-area optimum — the exact external
    anchor for the large-scale real-case series (docs/benchmarks.md
    'Real-case trajectories')."""
    case = matpower.parse_case(os.path.join(DATA, "case118.m"))
    model = matpower.build_acopf(matpower.tile_case(case, 4, ties=None),
                                 sparse=True)
    assert model.n == 1376
    stats = madnlp(model, print_level="error")
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert stats.objective == pytest.approx(4 * 129660.70, rel=1e-5)
    assert stats.iter <= 18  # measured 15 (budget = measured + 3)


def test_tiled_case118_x4_ring_interconnection():
    """Genuinely coupled 4-area interconnection (tie-lines, one global
    slack).  By symmetry the optimum carries zero tie flow and equals 4x
    the single-area optimum — still externally anchored."""
    case = matpower.parse_case(os.path.join(DATA, "case118.m"))
    model = matpower.build_acopf(matpower.tile_case(case, 4, ties="ring"),
                                 sparse=True)
    stats = madnlp(model, print_level="error")
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert stats.objective == pytest.approx(4 * 129660.70, rel=1e-5)
    assert stats.iter <= 18  # measured 15


def test_tiled_case118_grid2d_and_wide_ring():
    """Structurally-diverse tilings (VERDICT r4 #4a): a 2×2 GRID coupling
    (horizontal+vertical ties — an adjacency RCM cannot flatten the way
    it does a ring) and a ring with n_tie=8 (wider per-tie coupling).
    Both keep the exact K× anchor: every tie joins the same bus of two
    copies, so the all-copies-identical configuration has zero tie flow
    and is stationary by symmetry (models/matpower.py:tile_case)."""
    case = matpower.parse_case(os.path.join(DATA, "case118.m"))
    for kw in (dict(ties="grid2d"), dict(ties="ring", n_tie=8)):
        model = matpower.build_acopf(
            matpower.tile_case(case, 4, **kw), sparse=True
        )
        stats = madnlp(model, print_level="error")
        assert stats.status == Status.SOLVE_SUCCEEDED, kw
        assert stats.objective == pytest.approx(4 * 129660.70, rel=1e-5)
        assert stats.iter <= 18  # measured 15 for both (budget +3)


def test_tiled_case118_grid2d_x9_wide_band():
    """3×3 grid of case118 (n=3096, case2869-class variable count): the
    widest band geometry in the tree (W=1717 — infeasible for ANY
    streaming-Pallas block, so on TPU the resolver's xla fallback path
    carries it; tests/test_vmem_guard.py asserts that resolution).  The
    exact 9× anchor still holds; MULTIFRONTAL and BLOCK_ARROW solve the
    same system in the same 15 iterations (measured r5) — the 2D coupling
    is the nested-dissection-shaped case."""
    from madnlp_tpu import LinearSolver

    case = matpower.parse_case(os.path.join(DATA, "case118.m"))
    model = matpower.build_acopf(
        matpower.tile_case(case, 9, ties="grid2d"), sparse=True
    )
    stats = madnlp(
        model, print_level="error", dtype="float32",
        linear_solver=LinearSolver.BANDED,  # the bench-sweep config; the
        # default preset at this width/size chooses dense (w·4 > N),
        # which is correct flops-wise but slow under the CPU test budget
    )
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert stats.objective == pytest.approx(9 * 129660.70, rel=1e-5)
    assert stats.iter <= 18  # measured 15


def test_mixed_case57_case118_interconnection():
    """Heterogeneous areas (VERDICT r4 #4a): case57 + case118 joined into
    one system (matpower.interconnect_cases) — different topologies,
    sizes and cost curves in one KKT system.

    * decoupled union: optimum EXACTLY the sum of the published optima
      (41737.79 + 129660.70) — exact external anchor;
    * chain-tied: no symmetry pins the optimum, but economics bounds it —
      the ties let areas trade, measured 0.9966× the sum (the coupled
      system is cheaper than autarky but within the short-tie band);
      pinned as a regression value.
    """
    c57 = matpower.parse_case(os.path.join(DATA, "case57.m"))
    c118 = matpower.parse_case(os.path.join(DATA, "case118.m"))
    pub_sum = 41737.79 + 129660.70

    dec = madnlp(
        matpower.build_acopf(
            matpower.interconnect_cases([c57, c118], ties=None), sparse=True
        ),
        print_level="error",
    )
    assert dec.status == Status.SOLVE_SUCCEEDED
    assert dec.objective == pytest.approx(pub_sum, rel=1e-5)
    assert dec.iter <= 19  # measured 16

    tied = madnlp(
        matpower.build_acopf(
            matpower.interconnect_cases([c57, c118], ties="chain"),
            sparse=True,
        ),
        print_level="error",
    )
    assert tied.status == Status.SOLVE_SUCCEEDED
    # economics band around the published sum + pinned measured value
    assert 0.98 * pub_sum < tied.objective < 1.0001 * pub_sum
    assert tied.objective == pytest.approx(170819.805, rel=1e-4)
    assert tied.iter <= 23  # measured 20


def test_case118_sparse_dense_parity():
    """Golden rule on the largest real case: the sparse branch-local
    derivative path must reproduce the dense-AD trajectory exactly."""
    case = matpower.parse_case(os.path.join(DATA, "case118.m"))
    sp = madnlp(matpower.build_acopf(case, sparse=True), print_level="error")
    dn = madnlp(
        matpower.build_acopf(case, sparse=False, analytic=True),
        print_level="error",
    )
    assert sp.status == Status.SOLVE_SUCCEEDED
    assert sp.iter == dn.iter
    assert sp.objective == pytest.approx(dn.objective, rel=1e-8)


def test_case30_duals_recover_lmps():
    """Sanity on multipliers: active-power balance duals (negated,
    unscaled) are locational marginal prices, which at an interior
    optimum must sit in the band spanned by the marginal generator
    costs (case30 marginal costs are ~1-4 $/MWh at the optimum)."""
    case = matpower.parse_case(os.path.join(DATA, "case30.m"))
    model = matpower.build_acopf(case, sparse=True)
    stats = madnlp(model, print_level="error")
    nb = 30
    # constraints are per-unit, objective $/hr -> $/MWh price = |y|/base
    lmp = np.abs(np.asarray(stats.multipliers[:nb])) / case["baseMVA"]
    assert lmp.min() > 0.5
    assert lmp.max() < 10.0
