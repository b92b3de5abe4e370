"""Marginal per-iteration cost inside the jitted loop (probe_step found
solve_wall/iter ~3x a standalone regular_step dispatch): time 1 vs 2 vs 4
chained loop-body applications in ONE dispatch — the difference is the
true on-device per-iteration cost, free of tunnel dispatch latency — and
run the solve loop for k iterations at several k to locate where the
wall grows.

Usage: python -m benchmarks.probe_step2 [nb600]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main(spec="nb600"):
    from benchmarks.probe_profile import make_model
    from madnlp_tpu import LinearSolver, MadNLPSolver

    model = make_model(spec)
    solver = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED,
                          banded_backend="pallas")
    solver._build_solve_jit()
    body = solver._loop_body
    kern = solver.kernel

    def chain(n):
        def f(st):
            for _ in range(n):
                st = body(st)
            return st
        return jax.jit(f)

    st0 = solver._init_fn()
    jax.block_until_ready(st0)

    results = {}
    for n in (1, 2, 4):
        f = chain(n)
        t0 = time.time()
        out = jax.block_until_ready(f(st0))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            out = f(st0)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / 5 * 1e3
        results[n] = ms
        print(json.dumps({f"chain{n}_ms": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
    print(json.dumps({
        "marginal_step_ms_1to2": round(results[2] - results[1], 2),
        "marginal_step_ms_2to4": round((results[4] - results[2]) / 2, 2),
    }), flush=True)

    # k-iteration solve loop: where does the per-iter wall grow?
    def run_k(k):
        def f(st):
            def bodyk(i, st):
                return body(st)
            return jax.lax.fori_loop(0, k, bodyk, st)
        return jax.jit(f)

    prev = None
    for k in (5, 10, 20, 25):
        f = run_k(k)
        t0 = time.time()
        out = jax.block_until_ready(f(st0))
        compile_s = time.time() - t0
        t0 = time.time()
        out = jax.block_until_ready(f(st0))
        wall = time.time() - t0
        msg = {"k": k, "wall_s": round(wall, 3),
               "ms_per_iter": round(wall / k * 1e3, 2),
               "compile_s": round(compile_s, 1),
               "iter_reached": int(out.k), "status": int(out.status)}
        if prev is not None:
            dk = k - prev[0]
            msg["marginal_ms"] = round((wall - prev[1]) / dk * 1e3, 2)
        prev = (k, wall)
        print(json.dumps(msg), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nb600")
