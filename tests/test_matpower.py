"""MATPOWER / pglib-opf front end: parser + ACOPF builders, verified
against an independently-coded complex-arithmetic power-flow check."""

import os

import numpy as np
import pytest

from madnlp_tpu import Status, madnlp
from madnlp_tpu.models import matpower

CASE = os.path.join(os.path.dirname(__file__), "data", "case5.m")


def _ybus_and_flows(case, vm, va):
    """Independent (pure-numpy, complex) reference: bus injections S and
    branch end flows Sf/St, written from the MATPOWER makeYbus definition —
    NOT reusing any of the front end's real-arithmetic formulas."""
    base = case["baseMVA"]
    bus, gen, br = case["bus"], case["gen"], case["branch"]
    br = br[br[:, 10] > 0]
    ids = {int(b): i for i, b in enumerate(bus[:, 0])}
    f = np.array([ids[int(b)] for b in br[:, 0]])
    t = np.array([ids[int(b)] for b in br[:, 1]])
    ys = 1.0 / (br[:, 2] + 1j * br[:, 3])
    tap = np.where(br[:, 8] == 0, 1.0, br[:, 8]) * np.exp(
        1j * np.deg2rad(br[:, 9])
    )
    Yff = (ys + 1j * br[:, 4] / 2) / (tap * np.conj(tap))
    Yft = -ys / np.conj(tap)
    Ytf = -ys / tap
    Ytt = ys + 1j * br[:, 4] / 2
    nb = len(bus)
    Y = np.zeros((nb, nb), complex)
    for k in range(len(f)):
        Y[f[k], f[k]] += Yff[k]
        Y[f[k], t[k]] += Yft[k]
        Y[t[k], f[k]] += Ytf[k]
        Y[t[k], t[k]] += Ytt[k]
    Y[np.diag_indices(nb)] += (bus[:, 4] + 1j * bus[:, 5]) / base
    V = vm * np.exp(1j * va)
    S = V * np.conj(Y @ V)
    Sf = V[f] * np.conj(Yff * V[f] + Yft * V[t])
    St = V[t] * np.conj(Ytf * V[f] + Ytt * V[t])
    return S, Sf, St, f, t


def _check_solution(case, stats, nb, ng, gbus):
    base = case["baseMVA"]
    x = np.asarray(stats.solution)
    va, vm = x[:nb], x[nb : 2 * nb]
    pg, qg = x[2 * nb : 2 * nb + ng], x[2 * nb + ng : 2 * nb + 2 * ng]
    S, Sf, St, f, t = _ybus_and_flows(case, vm, va)
    Pg = np.zeros(nb)
    Qg = np.zeros(nb)
    np.add.at(Pg, gbus, pg)
    np.add.at(Qg, gbus, qg)
    Pd, Qd = case["bus"][:, 2] / base, case["bus"][:, 3] / base
    # power balance from the independent complex evaluation
    assert np.abs(np.real(S) - Pg + Pd).max() < 1e-6
    assert np.abs(np.imag(S) - Qg + Qd).max() < 1e-6
    # thermal limits hold at both ends
    rate = case["branch"][case["branch"][:, 10] > 0, 5] / base
    assert (np.abs(Sf) <= rate + 1e-6).all()
    assert (np.abs(St) <= rate + 1e-6).all()
    # bounds (up to the Ipopt-style bound_relax_factor relaxation)
    assert (vm >= 0.9 - 1e-6).all() and (vm <= 1.1 + 1e-6).all()
    assert va[0] == pytest.approx(0.0, abs=1e-9)  # ref bus fixed


def test_parse_case5():
    case = matpower.parse_case(CASE)
    assert case["baseMVA"] == 100
    assert case["bus"].shape == (5, 13)
    assert case["branch"].shape == (8, 13)
    assert len(case["gencost"]) == 3
    assert case["name"] == "case5"


def test_acopf_dense_solves_and_balances():
    case = matpower.parse_case(CASE)
    model = matpower.build_acopf(case, sparse=False)
    # 5 buses, 2 in-service gens, 7 in-service branches all rated, 1 angle-lim
    assert model.n == 2 * 5 + 2 * 2
    assert model.m == 2 * 5 + 2 * 7 + 1
    stats = madnlp(model)
    assert stats.status == Status.SOLVE_SUCCEEDED
    _check_solution(case, stats, nb=5, ng=2, gbus=np.array([0, 2]))


def test_acopf_sparse_matches_dense():
    """Golden rule: branch-local sparse derivatives must reproduce the
    dense-AD trajectory exactly (identical iteration count)."""
    case = matpower.parse_case(CASE)
    ref = madnlp(matpower.build_acopf(case, sparse=False))
    stats = madnlp(matpower.build_acopf(case, sparse=True))
    assert stats.status == Status.SOLVE_SUCCEEDED
    assert stats.iter == ref.iter
    assert stats.objective == pytest.approx(ref.objective, rel=1e-8)
    _check_solution(case, stats, nb=5, ng=2, gbus=np.array([0, 2]))


def test_acopf_no_branch_limits():
    case = matpower.parse_case(CASE)
    m0 = matpower.build_acopf(case, sparse=True, branch_limits=False)
    assert m0.m == 2 * 5
    stats = madnlp(m0)
    assert stats.status == Status.SOLVE_SUCCEEDED
    # unconstrained-by-rates cost can only be <= the rated cost
    rated = madnlp(matpower.build_acopf(case, sparse=True))
    assert stats.objective <= rated.objective + 1e-6


def test_load_acopf_path():
    model = matpower.load_acopf(CASE)
    assert model.name.startswith("acopf_case5")


def test_pwl_cost_rejected():
    case = matpower.parse_case(CASE)
    case["gencost"][0][0] = 1  # piecewise-linear model
    with pytest.raises(ValueError, match="polynomial"):
        matpower.build_acopf(case)


def test_analytic_dense_derivatives_match_ad():
    """Closed-form balance-block derivatives (general non-symmetric Ybus
    with taps/shifts) + branch-local limit derivatives must equal AD."""
    import jax.numpy as jnp

    case = matpower.parse_case(CASE)
    ma = matpower.build_acopf(case, sparse=False, analytic=True)
    mr = matpower.build_acopf(case, sparse=False, analytic=False)
    rng = np.random.default_rng(1)
    for _ in range(2):
        x = jnp.asarray(mr.x0 + 0.05 * rng.standard_normal(mr.n))
        y = jnp.asarray(rng.standard_normal(mr.m))
        np.testing.assert_allclose(
            np.asarray(ma.jac(x)), np.asarray(mr.jac(x)), atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(ma.lag_hess(x, y, 0.7)),
            np.asarray(mr.lag_hess(x, y, 0.7)),
            atol=1e-10,
        )
    sa = madnlp(ma, print_level="error")
    sr = madnlp(mr, print_level="error")
    assert sa.iter == sr.iter
    assert sa.objective == pytest.approx(sr.objective, rel=1e-9)


def _two_bus_case():
    """Minimal in-service/off-line fixture exercising the gencost Q-block
    and the angmin=angmax=0 'unconstrained' sentinel (ADVICE r1)."""
    bus = np.array([
        [1, 3, 0.0, 0.0, 0, 0, 1, 1.0, 0.0, 230, 1, 1.1, 0.9],
        [2, 1, 50.0, 10.0, 0, 0, 1, 1.0, 0.0, 230, 1, 1.1, 0.9],
    ])
    gen = np.array([
        [1, 40, 0, 30, -30, 1.0, 100, 1, 100, 0],
        [2, 10, 0, 30, -30, 1.0, 100, 0, 100, 0],  # out of service
    ])
    branch = np.array([
        # angmin = angmax = 0 -> angle difference UNCONSTRAINED (caseformat)
        [1, 2, 0.01, 0.1, 0.02, 100, 100, 100, 0, 0, 1, 0, 0],
    ])
    gencost = [
        [2, 0, 0, 2, 99.0, 0.0],  # P cost, gen 1 (survives)
        [2, 0, 0, 2, 20.0, 0.0],  # P cost, gen 2 (off-line: must be dropped)
        [2, 0, 0, 2, 1.0, 0.0],   # Q cost block (ignored)
        [2, 0, 0, 2, 2.0, 0.0],
    ]
    return dict(baseMVA=100.0, bus=bus, gen=gen, branch=branch,
                gencost=gencost, name="mini2")


def test_angle_sentinel_unconstrained():
    """angmin=angmax=0 must NOT produce a va_f==va_t equality row."""
    case = _two_bus_case()
    model = matpower.build_acopf(case, sparse=False)
    # 2 buses, 1 gen, 1 rated branch, ZERO angle rows
    assert model.m == 2 * 2 + 2 * 1


def test_gencost_qblock_with_offline_gen():
    """With a reactive-cost block AND an off-line gen, the survivor must
    keep ITS cost row, not inherit the off-line gen's."""
    case = _two_bus_case()
    d = matpower._prepare(case)
    assert d["ng"] == 1
    # cost(pg_pu) = 99 * (pg_pu * 100): linear coefficient 9900, no offset
    np.testing.assert_allclose(d["cost_coefs"][0], [0.0, 9900.0])


def test_gencost_row_count_mismatch_rejected():
    case = _two_bus_case()
    case["gencost"] = case["gencost"][:3]  # neither norig nor 2*norig
    with pytest.raises(ValueError, match="gencost"):
        matpower._prepare(case)
