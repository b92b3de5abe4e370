"""Callbacks + whole-step + full-solve attribution (the tail of
probe_profile that a 40-min timeout cut off — kept separate so each
long whole-solver compile is its own process/run).

Usage:  python -m benchmarks.probe_step [nb600|case118] [backend]
"""

import json
import sys
import time

import jax


def _avg(fn, ntrials=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ntrials):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / ntrials


def main(spec="nb600", backend="pallas"):
    from benchmarks.probe_profile import make_model
    from madnlp_tpu import LinearSolver, MadNLPSolver
    from madnlp_tpu.utils.timing import timing_callbacks

    model = make_model(spec)
    solver = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED,
                          banded_backend=backend)
    kern = solver.kernel

    t0 = time.time()
    cb = timing_callbacks(solver, ntrials=10)
    print(json.dumps({"callbacks_ms":
                      {k: round(v * 1e3, 3) for k, v in cb.items()},
                      "compile_s": round(time.time() - t0, 1)}), flush=True)

    st = solver.state if solver.state is not None else solver._init_fn()
    step = jax.jit(kern.regular_step)
    t0 = time.time()
    st2 = jax.block_until_ready(step(st))
    print(json.dumps({"regular_step_compile_s": round(time.time() - t0, 1)}),
          flush=True)
    t_step = _avg(lambda: step(st), ntrials=5)
    print(json.dumps({"regular_step_ms": round(t_step * 1e3, 2)}), flush=True)

    t0 = time.time()
    stats = solver.solve_jitted()
    print(json.dumps({"solve_compile_s": round(time.time() - t0, 1)}),
          flush=True)
    t0 = time.time()
    stats = solver.solve_jitted()
    wall = time.time() - t0
    print(json.dumps({
        "solve_wall_s": round(wall, 3),
        "iters": int(stats.iter),
        "iter_per_s": round(int(stats.iter) / wall, 2),
        "status": int(stats.status),
        "counters": {k: int(v) for k, v in stats.counters.items()},
    }), flush=True)


if __name__ == "__main__":
    spec = sys.argv[1] if len(sys.argv) > 1 else "nb600"
    backend = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    main(spec, backend)
