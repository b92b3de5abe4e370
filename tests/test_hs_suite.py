"""Mini Hock–Schittkowski suite (AD models) — broad robustness coverage in
the spirit of the reference's CUTEst/MINLPTests runs (test/minlp_test.jl).
Each problem has a published optimal objective."""

import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu import Status, create_model, madnlp

INF = np.inf


def hs01():
    return create_model(
        obj=lambda x: 100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2,
        n=2, x0=[-2.0, 1.0], lvar=[-INF, -1.5],
    ), 0.0


def hs03():
    return create_model(
        obj=lambda x: x[1] + 1e-5 * (x[1] - x[0]) ** 2,
        n=2, x0=[10.0, 1.0], lvar=[-INF, 0.0],
    ), 0.0


def hs05():
    return create_model(
        obj=lambda x: jnp.sin(x[0] + x[1]) + (x[0] - x[1]) ** 2
        - 1.5 * x[0] + 2.5 * x[1] + 1.0,
        n=2, x0=[0.0, 0.0], lvar=[-1.5, -3.0], uvar=[4.0, 3.0],
    ), -1.9132229549810367


def hs06():
    return create_model(
        obj=lambda x: (1 - x[0]) ** 2,
        cons=lambda x: 10.0 * (x[1] - x[0] ** 2)[None],
        n=2, m=1, x0=[-1.2, 1.0], lcon=[0.0], ucon=[0.0],
    ), 0.0


def hs07():
    return create_model(
        obj=lambda x: jnp.log(1 + x[0] ** 2) - x[1],
        cons=lambda x: ((1 + x[0] ** 2) ** 2 + x[1] ** 2 - 4.0)[None],
        n=2, m=1, x0=[2.0, 2.0], lcon=[0.0], ucon=[0.0],
    ), -np.sqrt(3.0)


def hs14():
    return create_model(
        obj=lambda x: (x[0] - 2) ** 2 + (x[1] - 1) ** 2,
        cons=lambda x: jnp.array(
            [x[0] - 2 * x[1] + 1, -0.25 * x[0] ** 2 - x[1] ** 2 + 1]
        ),
        n=2, m=2, x0=[2.0, 2.0], lcon=[0.0, 0.0], ucon=[0.0, INF],
    ), 9 - 2.875 * np.sqrt(7)


def hs33():
    return create_model(
        obj=lambda x: (x[0] - 1) * (x[0] - 2) * (x[0] - 3) + x[2],
        cons=lambda x: jnp.array(
            [x[2] ** 2 - x[1] ** 2 - x[0] ** 2,
             x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 4.0]
        ),
        n=3, m=2, x0=[0.0, 0.0, 3.0],
        lvar=[0.0, 0.0, 0.0], uvar=[INF, INF, 5.0],
        lcon=[0.0, 0.0], ucon=[INF, INF],
    ), np.sqrt(2) - 6


def hs35():
    return create_model(
        obj=lambda x: 9 - 8 * x[0] - 6 * x[1] - 4 * x[2]
        + 2 * x[0] ** 2 + 2 * x[1] ** 2 + x[2] ** 2
        + 2 * x[0] * x[1] + 2 * x[0] * x[2],
        cons=lambda x: (3 - x[0] - x[1] - 2 * x[2])[None],
        n=3, m=1, x0=[0.5, 0.5, 0.5], lvar=[0.0] * 3,
        lcon=[0.0], ucon=[INF],
    ), 1.0 / 9.0


def hs38():
    return create_model(
        obj=lambda x: 100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        + 90 * (x[3] - x[2] ** 2) ** 2 + (1 - x[2]) ** 2
        + 10.1 * ((x[1] - 1) ** 2 + (x[3] - 1) ** 2)
        + 19.8 * (x[1] - 1) * (x[3] - 1),
        n=4, x0=[-3.0, -1.0, -3.0, -1.0],
        lvar=[-10.0] * 4, uvar=[10.0] * 4,
    ), 0.0


def hs52():
    return create_model(
        obj=lambda x: (4 * x[0] - x[1]) ** 2 + (x[1] + x[2] - 2) ** 2
        + (x[3] - 1) ** 2 + (x[4] - 1) ** 2,
        cons=lambda x: jnp.array(
            [x[0] + 3 * x[1], x[2] + x[3] - 2 * x[4], x[1] - x[4]]
        ),
        n=5, m=3, x0=[2.0] * 5, lcon=[0.0] * 3, ucon=[0.0] * 3,
    ), 1859.0 / 349.0


def hs71():
    return create_model(
        obj=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        cons=lambda x: jnp.array(
            [x[0] * x[1] * x[2] * x[3],
             x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]
        ),
        n=4, m=2, x0=[1.0, 5.0, 5.0, 1.0],
        lvar=[1.0] * 4, uvar=[5.0] * 4,
        lcon=[25.0, 40.0], ucon=[INF, 40.0],
    ), 17.0140173


PROBLEMS = [hs01, hs03, hs05, hs06, hs07, hs14, hs33, hs35, hs38, hs52, hs71]


@pytest.mark.parametrize("problem", PROBLEMS, ids=lambda p: p.__name__)
def test_hs(problem):
    model, f_star = problem()
    stats = madnlp(model)
    assert stats.status in (
        Status.SOLVE_SUCCEEDED,
        Status.SOLVED_TO_ACCEPTABLE_LEVEL,
    ), stats
    scale = max(1.0, abs(f_star))
    assert abs(stats.objective - f_star) / scale < 1e-5, (
        f"{problem.__name__}: got {stats.objective}, want {f_star}"
    )
