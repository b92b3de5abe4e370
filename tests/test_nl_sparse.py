"""Sparse .nl template compiler tests — differential parity with the dense
importer (same expression graphs, two compilers), exact sparsity patterns,
and end-to-end solves through the sparse KKT path.  Mirrors the reference's
pattern of validating a new derivative backend against an existing one
down to iteration counts (test/madnlp_dense.jl:8-53)."""

import numpy as np
import pytest

import jax.numpy as jnp

from madnlp_tpu import madnlp
from madnlp_tpu.models.nl import read_nl
from tests.test_nl import DEFVAR_NL, HS15_NL, LP_NL


@pytest.fixture
def nl_file(tmp_path):
    def write(text, name="model.nl"):
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    return write


def chain_nl(n):
    """min Σ (x_i − 1)²  s.t.  x_i·x_{i+1} ≥ 1 — an indexed model the way
    AMPL emits one: every constraint shares a template, the objective is one
    big OPSUMLIST of identical terms."""
    m = n - 1
    lines = ["g3 1 1 0"]
    lines += [f" {n} {m} 1 0 0", f" {m} 1", " 0 0", f" {n} {n} {n}",
              " 0 0 0 1", " 0 0 0 0 0", f" {2*m} {n}", " 0 0", " 0 0 0 0 0"]
    for i in range(m):
        lines += [f"C{i}", "o2", f"v{i}", f"v{i+1}"]
    lines += ["O0 0", "o54", str(n)]
    for i in range(n):
        lines += ["o5", "o1", f"v{i}", "n1", "n2"]
    lines.append("r")
    lines += ["2 1"] * m
    lines.append("b")
    lines += ["3"] * n
    lines.append(f"x{n}")
    lines += [f"{i} 2.0" for i in range(n)]
    for i in range(m):
        lines += [f"J{i} 2", f"{i} 0", f"{i+1} 0"]
    lines += [f"G0 {n}"] + [f"{i} 0" for i in range(n)]
    return "\n".join(lines) + "\n"


def _diff_check(dense, sparse, points):
    for pt in points:
        x = jnp.asarray(pt, dtype=jnp.float64)
        np.testing.assert_allclose(sparse.obj(x), dense.obj(x), rtol=1e-13)
        np.testing.assert_allclose(sparse.grad(x), dense.grad(x),
                                   rtol=1e-12, atol=1e-13)
        if dense.m:
            np.testing.assert_allclose(sparse.cons(x), dense.cons(x),
                                       rtol=1e-13, atol=1e-14)
            np.testing.assert_allclose(sparse.jac_dense(x), dense.jac(x),
                                       rtol=1e-12, atol=1e-13)
        y = jnp.asarray(np.linspace(-1.0, 1.0, dense.m))
        np.testing.assert_allclose(
            sparse.lag_hess_dense(x, y, 0.7), dense.lag_hess(x, y, 0.7),
            rtol=1e-12, atol=1e-13)


def test_hs15_sparse_matches_dense(nl_file):
    path = nl_file(HS15_NL)
    dense = read_nl(path)
    sparse = read_nl(path, sparse=True)
    assert not sparse.is_dense
    _diff_check(dense, sparse,
                [[1.0, 1.0], [-2.0, 3.0], [0.3, 7.0], [0.5, -0.8]])


def test_hs15_sparse_solve(nl_file):
    path = nl_file(HS15_NL)
    ref = madnlp(read_nl(path), print_level="ERROR")
    st = madnlp(read_nl(path, sparse=True), print_level="ERROR")
    assert st.status.name == "SOLVE_SUCCEEDED"
    # golden rule: same trajectory as the dense import
    assert st.iter == ref.iter
    np.testing.assert_allclose(st.solution, ref.solution, atol=1e-8)


def test_defined_vars_inlined(nl_file):
    path = nl_file(DEFVAR_NL)
    dense = read_nl(path)
    sparse = read_nl(path, sparse=True)
    _diff_check(dense, sparse, [[0.7, -0.3], [2.0, 1.0]])
    st = madnlp(sparse, print_level="ERROR")
    np.testing.assert_allclose(st.solution, [0.0, 0.5], atol=1e-6)


def test_lp_no_hessian(nl_file):
    sparse = read_nl(nl_file(LP_NL), sparse=True)
    assert sparse.nnzh == 0
    assert sparse.nnzj == 2            # purely linear J segment
    st = madnlp(sparse, print_level="ERROR")
    np.testing.assert_allclose(st.solution, [1.5, 1.25], atol=1e-6)


def test_chain_grouping_and_sparsity(nl_file):
    n = 40
    sparse = read_nl(nl_file(chain_nl(n)), sparse=True)
    # one template for all constraints, one for all objective terms; the
    # zero-coefficient J records AMPL emits for nonlinear entries are dropped
    assert sparse.nnzj == 2 * (n - 1)
    # hessian: exactly n diagonal (objective) + n−1 off-diagonal (x_i x_{i+1})
    assert sparse.nnzh == n + (n - 1)
    pat = set(zip(sparse.hess_rows.tolist(), sparse.hess_cols.tolist()))
    assert all(r == c or r == c + 1 for r, c in pat)
    dense = read_nl(nl_file(chain_nl(n), "d.nl"))
    rng = np.random.default_rng(0)
    _diff_check(dense, sparse, [rng.uniform(0.5, 2.0, n) for _ in range(3)])


def test_chain_solve_sparse_kkt(nl_file):
    n = 40
    path = nl_file(chain_nl(n))
    ref = madnlp(read_nl(path), print_level="ERROR")
    st = madnlp(read_nl(path, sparse=True), print_level="ERROR")
    assert st.status.name == "SOLVE_SUCCEEDED"
    assert abs(st.objective - ref.objective) < 1e-7
    np.testing.assert_allclose(st.solution, ref.solution, atol=1e-6)
