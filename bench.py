"""Benchmark — prints ONE JSON line with the primary metric.

Primary metric: IPM iterations/second on a synthetic case118-scale ACOPF
(the reference's headline benchmark family, BASELINE.md) — fully-jitted
solve to tol=1e-8 with mixed precision (f32 factorization + f64 Richardson
refinement; iteration counts identical to full f64).  ``vs_baseline``
compares against a host-CPU LAPACK (numpy) estimate of the same
per-iteration linear algebra (the factorizations + backsolves actually
performed, timed with numpy on the same-size condensed matrix) — the
"reference CPU linear-solver" stand-in, since the Julia reference publishes
no first-party numbers.
"""

import json
import time

import numpy as np


def main(nb=118):
    import jax
    import jax.numpy as jnp

    from madnlp_tpu import MadNLPSolver, Status
    from madnlp_tpu.models.instances import opf

    # Dense-Ybus model: on TPU the power-flow evaluation and its AD
    # derivatives are MXU matmuls, and dense KKT assembly avoids scatters
    # (TPU scatters serialize — the sparse-exec path is CPU-oriented until
    # the Pallas segment kernels land; see CLAUDE.md).
    model = opf.build(nb=nb, seed=0)
    n = model.n
    solver = MadNLPSolver(model, dtype="float32")

    # compile + warmup
    stats = solver.solve_jitted()
    assert stats.status in (Status.SOLVE_SUCCEEDED, Status.SOLVED_TO_ACCEPTABLE_LEVEL), stats
    # timed run
    t0 = time.time()
    stats = solver.solve_jitted()
    elapsed = time.time() - t0
    iters = max(stats.iter, 1)
    iter_per_s = iters / elapsed

    # host-CPU numpy estimate of the same linear-algebra volume
    nf = stats.counters["factorization_cnt"]
    nsolve = stats.counters["backsolve_cnt"] + nf  # refinement + primary solves
    size = solver.kernel.kkt.sys_size()
    A = np.random.default_rng(0).standard_normal((size, size))
    A = A @ A.T + size * np.eye(size)
    b = np.ones(size)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        L = np.linalg.cholesky(A)
    t_chol = (time.time() - t0) / reps
    import scipy.linalg as sla

    t0 = time.time()
    for _ in range(reps):
        y_ = sla.solve_triangular(L, b, lower=True)
        sla.solve_triangular(L.T, y_, lower=False)
    t_solve = (time.time() - t0) / reps
    cpu_time = nf * t_chol + nsolve * t_solve
    cpu_iter_per_s = iters / max(cpu_time, 1e-12)

    print(
        json.dumps(
            {
                "metric": "ipm_iter_per_s",
                "value": round(iter_per_s, 3),
                "unit": f"iter/s (synthetic ACOPF nb={nb} n={n} m={model.m}, "
                f"tol=1e-8 f32+IR, {iters} iters, "
                f"device={jax.devices()[0].platform})",
                "vs_baseline": round(iter_per_s / cpu_iter_per_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
