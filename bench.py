"""Benchmark — prints ONE JSON line with the primary metric.

Primary metric: IPM iterations/second on a synthetic nb=600 (case1354-
variable-count-scale) ACOPF (the reference's headline benchmark family,
BASELINE.md) — fully-jitted solve to tol=1e-8 with mixed precision (f32
factorization + Ruiz equilibration + f64 Richardson refinement; iteration
counts identical to full f64).  Measured on this chip: 10.1 iter/s,
16.1x the identical solve on the host CPU (nb=118 for comparison: 28.3
iter/s, 4.0x — the MXU advantage grows with scale).

``vs_baseline`` is the measured wall-clock ratio of the *identical* solve
run on the host CPU backend (the honest single-machine CPU reference,
since the Julia reference publishes no first-party numbers): values > 1
mean the TPU beats the CPU.
"""

import json
import time


def main(nb=600):
    import jax

    # allow both the TPU and the host CPU backend in this process
    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass

    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.models.instances import opf

    # Flagship configuration (fastest measured, benchmarks/sweep.py):
    # sparse edge-local model (ExaModels-style branch-local AD — nnz-sized
    # derivative evaluation) + RCM block-banded LDLt factorization.
    # Measured nb=600 on chip: banded 16.2 iter/s vs dense-Ybus 11.3,
    # multifrontal 8.1, HyKKT 6.4 — all with identical iteration counts.
    def make_solver(**kw):
        kw.setdefault("linear_solver", LinearSolver.BANDED)
        return MadNLPSolver(opf.build_sparse(nb=nb, seed=0), dtype="float32",
                            **kw)

    def timed_solve(solver):
        stats = solver.solve_jitted()  # compile + warm
        assert stats.status in (
            Status.SOLVE_SUCCEEDED,
            Status.SOLVED_TO_ACCEPTABLE_LEVEL,
        ), stats
        t0 = time.time()
        stats = solver.solve_jitted()
        return stats, time.time() - t0

    solver = make_solver()
    model = solver.model
    stats, t_dev = timed_solve(solver)
    iters = max(stats.iter, 1)
    iter_per_s = iters / t_dev

    device = jax.devices()[0].platform
    vs_baseline = 1.0
    if device != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                # give the CPU its best configuration: triangular solves,
                # and the XLA band loop (banded_backend auto resolves by
                # *process* default backend, which is the TPU here)
                cpu_solver = make_solver(
                    solve_mode="trisolve", banded_backend="xla"
                )
                cpu_stats, t_cpu = timed_solve(cpu_solver)
            vs_baseline = t_cpu / t_dev
        except Exception:
            vs_baseline = None  # keep the output line valid JSON

    print(
        json.dumps(
            {
                "metric": "ipm_iter_per_s",
                "value": round(iter_per_s, 3),
                "unit": f"iter/s (synthetic ACOPF nb={nb} n={model.n} "
                f"m={model.m}, tol=1e-8 f32+Ruiz+IR, {iters} iters, "
                f"device={device}, flagship sparse+banded config; "
                f"vs_baseline = cpu_wall/device_wall of the identical solve "
                f"— the banded path is latency-bound so the chip ratio is "
                f"modest; the MXU ratio on the dense-Ybus path is ~17x, "
                f"see docs/benchmarks.md)",
                "vs_baseline": (
                    round(vs_baseline, 4) if vs_baseline is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
