"""Ipopt-format output — byte-compatible with the reference's printers
(``/root/reference/src/IPM/utils.jl:139-219``).  Every format string below is
a verbatim transcription of the reference ``@sprintf`` formats so logs diff
clean against MadNLP's."""

from __future__ import annotations

import math

ITER_HEADER = (
    "iter    objective    inf_pr   inf_du inf_compl lg(mu) lg(rg) alpha_pr ir ls"
)


def format_iter(k, is_resto, obj, inf_pr, inf_du, inf_compl, lg_mu, del_w,
                alpha, ir, ls, ftype) -> str:
    """print_iter row (utils.jl:161-188):
    ``%4i%s% 10.7e %6.2e %6.2e %7.2e %5.1f  %s  %6.2e %2i %2i%s``."""
    rg = "   - " if del_w == 0 else "%5.1f" % math.log10(del_w)
    return "%4i%s% 10.7e %6.2e %6.2e %7.2e %5.1f  %s  %6.2e %2i %2i%s" % (
        k, "r" if is_resto else " ", obj, inf_pr, inf_du, inf_compl,
        lg_mu, rg, alpha, ir, ls, ftype,
    )


def format_init(nnzj, nnzh, n_free, n_only_lb, n_bounded, n_only_ub,
                n_eq, n_ineq, c_only_lb, c_bounded, c_only_ub) -> list:
    """print_init lines (utils.jl:139-159)."""
    return [
        "Number of nonzeros in constraint Jacobian............: %8i" % nnzj,
        "Number of nonzeros in Lagrangian Hessian.............: %8i\n" % nnzh,
        "Total number of variables............................: %8i" % n_free,
        "                     variables with only lower bounds: %8i" % n_only_lb,
        "                variables with lower and upper bounds: %8i" % n_bounded,
        "                     variables with only upper bounds: %8i" % n_only_ub,
        "Total number of equality constraints.................: %8i" % n_eq,
        "Total number of inequality constraints...............: %8i" % n_ineq,
        "        inequality constraints with only lower bounds: %8i" % c_only_lb,
        "   inequality constraints with lower and upper bounds: %8i" % c_bounded,
        "        inequality constraints with only upper bounds: %8i\n" % c_only_ub,
    ]


def format_time(t: float) -> str:
    """format_time (utils.jl:221): NaN prints ' unavailable'."""
    return " unavailable" if math.isnan(t) else "%6.3f s" % t


def format_summary(
    k, obj_scaled, obj_unscaled, inf_du, inf_pr, norm_c, inf_compl, obj_scale,
    obj_cnt, grad_cnt, con_cnt, jac_cnt, hess_cnt,
    factorization_cnt, backsolve_cnt,
    init_time=float("nan"), linear_solver_time=float("nan"),
    eval_time=float("nan"), total_time=float("nan"),
) -> list:
    """print_summary lines (utils.jl:190-219).  Time splits that an
    all-jitted solve cannot observe are reported ' unavailable' (the
    reference prints the same for NaN timers)."""
    solver_time = total_time - init_time - linear_solver_time - eval_time
    return [
        "",
        "Number of Iterations....: %i\n" % k,
        "                                   (scaled)                 (unscaled)",
        "Objective...............:  % 1.16e   % 1.16e" % (obj_scaled, obj_unscaled),
        "Dual infeasibility......:   %1.16e    %1.16e" % (inf_du, inf_du / obj_scale),
        "Constraint violation....:   %1.16e    %1.16e" % (norm_c, inf_pr),
        "Complementarity.........:   %1.16e    %1.16e" % (
            inf_compl * obj_scale, inf_compl),
        "Overall NLP error.......:   %1.16e    %1.16e\n" % (
            max(inf_du * obj_scale, norm_c, inf_compl),
            max(inf_du, inf_pr, inf_compl)),
        "Number of objective function evaluations              = %i" % obj_cnt,
        "Number of objective gradient evaluations              = %i" % grad_cnt,
        "Number of constraint evaluations                      = %i" % con_cnt,
        "Number of constraint Jacobian evaluations             = %i" % jac_cnt,
        "Number of Lagrangian Hessian evaluations              = %i" % hess_cnt,
        "Number of KKT factorizations                          = %i" % factorization_cnt,
        "Number of KKT backsolves                              = %i\n" % backsolve_cnt,
        "Total wall secs in initialization                     = %s" % format_time(init_time),
        "Total wall secs in linear solver                      = %s" % format_time(linear_solver_time),
        "Total wall secs in NLP function evaluations           = %s" % format_time(eval_time),
        "Total wall secs in solver (w/o init./fun./lin. alg.)  = %s" % format_time(solver_time),
        "Total wall secs                                       = %s\n" % format_time(total_time),
    ]
