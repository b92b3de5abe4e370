"""Solver status codes and human-readable messages.

Mirrors the 24 status codes of the reference solver
(``/root/reference/src/enums.jl:23-87``) so users migrating from MadNLP.jl
find the same exit semantics.  The numeric values are kept identical because
they encode ordering used by the driver loop (``status >= REGULAR`` means
"keep iterating", ``status <= SOLVED_TO_ACCEPTABLE_LEVEL`` means success).
"""

from __future__ import annotations

import enum


class Status(enum.IntEnum):
    SOLVE_SUCCEEDED = 1
    SOLVED_TO_ACCEPTABLE_LEVEL = 2
    SEARCH_DIRECTION_BECOMES_TOO_SMALL = 3
    DIVERGING_ITERATES = 4
    INFEASIBLE_PROBLEM_DETECTED = 5
    MAXIMUM_ITERATIONS_EXCEEDED = 6
    MAXIMUM_WALLTIME_EXCEEDED = 7

    INITIAL = 11
    REGULAR = 12
    RESTORE = 13
    ROBUST = 14
    LINESEARCH_SUCCEEDED = 15

    RESTORATION_FAILED = -1
    INVALID_NUMBER_DETECTED = -2
    ERROR_IN_STEP_COMPUTATION = -3
    NOT_ENOUGH_DEGREES_OF_FREEDOM = -4
    USER_REQUESTED_STOP = -5
    INTERNAL_ERROR = -6
    INVALID_NUMBER_OBJECTIVE = -7
    INVALID_NUMBER_GRADIENT = -8
    INVALID_NUMBER_CONSTRAINTS = -9
    INVALID_NUMBER_JACOBIAN = -10
    INVALID_NUMBER_HESSIAN_LAGRANGIAN = -11


_STATUS_OUTPUT = {
    Status.SOLVE_SUCCEEDED: "Optimal Solution Found (tol = {tol:5.1e}).",
    Status.SOLVED_TO_ACCEPTABLE_LEVEL: "Solved To Acceptable Level (tol = {acceptable_tol:5.1e}).",
    Status.SEARCH_DIRECTION_BECOMES_TOO_SMALL: "Search Direction is becoming Too Small.",
    Status.DIVERGING_ITERATES: "Iterates diverging; problem might be unbounded.",
    Status.MAXIMUM_ITERATIONS_EXCEEDED: "Maximum Number of Iterations Exceeded.",
    Status.MAXIMUM_WALLTIME_EXCEEDED: "Maximum wall-clock Time Exceeded.",
    Status.RESTORATION_FAILED: "Restoration Failed",
    Status.INFEASIBLE_PROBLEM_DETECTED: (
        "Converged to a point of local infeasibility. Problem may be infeasible."
    ),
    Status.INVALID_NUMBER_DETECTED: "Invalid number in NLP function or derivative detected.",
    Status.ERROR_IN_STEP_COMPUTATION: "Error in step computation.",
    Status.NOT_ENOUGH_DEGREES_OF_FREEDOM: "Problem has too few degrees of freedom.",
    Status.USER_REQUESTED_STOP: "Stopping optimization at current point as requested by user.",
    Status.INTERNAL_ERROR: "Internal Error.",
    Status.INVALID_NUMBER_OBJECTIVE: "Invalid number in NLP objective function detected.",
    Status.INVALID_NUMBER_GRADIENT: "Invalid number in NLP objective gradient detected.",
    Status.INVALID_NUMBER_CONSTRAINTS: "Invalid number in NLP constraint function detected.",
    Status.INVALID_NUMBER_JACOBIAN: "Invalid number in NLP constraint Jacobian detected.",
    Status.INVALID_NUMBER_HESSIAN_LAGRANGIAN: (
        "Invalid number in NLP Hessian Lagrangian detected."
    ),
}


def get_status_output(status: Status, tol: float = 1e-8, acceptable_tol: float = 1e-6) -> str:
    """Human-readable exit message (reference: src/enums.jl:44-87)."""
    template = _STATUS_OUTPUT.get(Status(status))
    if template is None:
        return f"Unknown status ({int(status)})."
    return template.format(tol=tol, acceptable_tol=acceptable_tol)


def is_success(status: Status) -> bool:
    return Status(status) in (Status.SOLVE_SUCCEEDED, Status.SOLVED_TO_ACCEPTABLE_LEVEL)
