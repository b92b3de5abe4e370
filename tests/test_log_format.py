"""Iteration-log byte parity with the reference's Ipopt-format printers
(``/root/reference/src/IPM/utils.jl:139-219``): golden-string checks of the
transcribed ``@sprintf`` formats, plus an end-to-end capture."""

import numpy as np

from madnlp_tpu import Status, madnlp
from madnlp_tpu.models.instances import hs15
from madnlp_tpu.utils import log as logfmt
from madnlp_tpu.utils.options import PrintLevel


def test_iter_header():
    assert logfmt.ITER_HEADER == (
        "iter    objective    inf_pr   inf_du inf_compl lg(mu) lg(rg) "
        "alpha_pr ir ls"
    )


def test_format_iter_golden():
    # %4i%s% 10.7e %6.2e %6.2e %7.2e %5.1f  %s  %6.2e %2i %2i%s
    line = logfmt.format_iter(
        3, False, 27.5, 1.5e-3, 2.0e-9, 5.0e-2, -1.0, 0.0, 1.0, 1, 1, "f"
    )
    assert line == (
        "   3  2.7500000e+01 1.50e-03 2.00e-09 5.00e-02  -1.0     -   "
        "1.00e+00  1  1f"
    )
    # restoration row, nonzero regularization (lg(rg) = log10(1e4) = 4.0)
    line = logfmt.format_iter(
        12, True, -0.5, 1.0e1, 2.0, 0.1, -2.0, 1.0e4, 0.5, 3, 2, "R"
    )
    assert line == (
        "  12r-5.0000000e-01 1.00e+01 2.00e+00 1.00e-01  -2.0    4.0  "
        "5.00e-01  3  2R"
    )


def test_format_time():
    assert logfmt.format_time(float("nan")) == " unavailable"
    assert logfmt.format_time(1.2345) == " 1.234 s" or logfmt.format_time(
        1.2345
    ) == " 1.235 s"  # platform rounding of %6.3f
    assert logfmt.format_time(12.3) == "12.300 s"


def test_format_init_golden():
    lines = logfmt.format_init(10, 6, 4, 1, 2, 0, 1, 3, 2, 1, 0)
    assert lines[0] == (
        "Number of nonzeros in constraint Jacobian............:       10"
    )
    assert lines[2] == (
        "Total number of variables............................:        4"
    )
    assert lines[8] == (
        "        inequality constraints with only lower bounds:        2"
    )


def test_format_summary_golden():
    lines = logfmt.format_summary(
        7, 1.0, 2.0, 1e-9, 1e-10, 5e-11, 1e-12, 0.5,
        8, 8, 8, 8, 7, 9, 30, total_time=1.5,
    )
    assert lines[1] == "Number of Iterations....: 7\n"
    assert lines[3] == (
        "Objective...............:   1.0000000000000000e+00    "
        "2.0000000000000000e+00"
    )
    assert lines[4] == (
        "Dual infeasibility......:   1.0000000000000001e-09    "
        "2.0000000000000001e-09"
    )
    # unavailable splits
    assert lines[-5] == (
        "Total wall secs in initialization                     =  unavailable"
    )
    assert lines[-1] == (
        "Total wall secs                                       =  1.500 s\n"
    )


def test_end_to_end_log(capsys):
    stats = madnlp(hs15.build(), print_level=PrintLevel.INFO)
    assert stats.status == Status.SOLVE_SUCCEEDED
    out = capsys.readouterr().out
    assert logfmt.ITER_HEADER in out
    assert "Number of nonzeros in constraint Jacobian" in out
    assert "Overall NLP error" in out
    assert "EXIT: Optimal Solution Found" in out
    # every iteration row parses back (fixed-width fields)
    rows = [
        ln for ln in out.splitlines()
        if ln[:5].strip().isdigit() and ("e+" in ln or "e-" in ln)
    ]
    assert len(rows) == stats.iter + 1
    first = rows[0]
    assert first[:5] == "   0 "
    float(first[5:19])  # objective field
