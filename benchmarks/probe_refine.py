"""Cost of one refinement sweep at a LATE-iteration state (probe_step2
found early iterations ~17-20 ms on device vs 55 ms/iter averaged over
the full solve; backsolve_cnt says sweeps ramp from ~1 to ~4 late).

Times, dispatch-corrected by 4x chaining, at the state after k iters:
  - the banded triangular solve alone (f32 kernel)
  - the f64 refinement operator mul alone
  - one full solve_refine
  - one full loop-body application (the true per-iteration cost there)

Usage: python -m benchmarks.probe_refine [nb600] [k]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _timed(f, n=5):
    out = jax.block_until_ready(f())
    t0 = time.time()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(spec="nb600", k=18):
    from benchmarks.probe_profile import make_model
    from madnlp_tpu import LinearSolver, MadNLPSolver

    model = make_model(spec)
    solver = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED,
                          banded_backend="pallas")
    solver._build_solve_jit()
    body = solver._loop_body
    kern = solver.kernel
    kkt = kern.kkt

    @jax.jit
    def advance(st):
        def bodyk(i, st):
            return body(st)
        return jax.lax.fori_loop(0, k, bodyk, st)

    st = jax.block_until_ready(advance(solver._init_fn()))
    print(json.dumps({"advanced_to_iter": int(st.k),
                      "status": int(st.status),
                      "last_ir": int(st.last_ir),
                      "backsolves_so_far": int(st.backsolve_cnt)}),
          flush=True)

    zero = jnp.zeros(())
    ctx = jax.block_until_ready(jax.jit(
        lambda st: kern._factorize(st, zero, zero))(st))
    rhs = jax.jit(lambda st: kern._aug_rhs(st, st.c, st.mu))(st)

    # dispatch-corrected: chain 4 dependent applications in one jit
    def chain4(f, x0):
        @jax.jit
        def g():
            x = x0
            for i in range(4):
                x = f(x, i)
            return x
        return g

    # 1) raw banded solve (f32 kernel), rhs perturbed per link
    from madnlp_tpu.kkt.vec import KKTVec
    flat = jnp.concatenate(list(rhs))

    g1 = chain4(lambda x, i: kkt._band_solve(
        kkt.bstruct, ctx.factor.inner,
        x.astype(kkt.fact_dtype)).astype(jnp.float64), flat[: kkt.bstruct.N])
    t = _timed(g1)
    print(json.dumps({"band_solve_ms_each": round(t / 4 * 1e3, 3)}),
          flush=True)

    # 2) the unreduced refinement operator mul
    g2 = chain4(lambda v, i: kkt.mul(ctx, v), rhs)
    t = _timed(g2)
    print(json.dumps({"refine_mul_ms_each": round(t / 4 * 1e3, 3)}),
          flush=True)

    # 3) one backsolve through the full _backsolve plumbing
    g3 = chain4(lambda v, i: kkt.solve(ctx, v), rhs)
    t = _timed(g3)
    print(json.dumps({"kkt_solve_ms_each": round(t / 4 * 1e3, 3)}),
          flush=True)

    # 4) full solve_refine at this state
    @jax.jit
    def refine_once():
        return kkt.solve_refine(ctx, rhs)
    out = jax.block_until_ready(refine_once())
    t = _timed(refine_once)
    print(json.dumps({"solve_refine_ms": round(t * 1e3, 3),
                      "sweeps": int(out[2])}), flush=True)

    # 5) one loop-body application at this state (chained x2 marginal)
    @jax.jit
    def body2():
        return body(body(st))
    @jax.jit
    def body1():
        return body(st)
    t1 = _timed(body1, n=3)
    t2 = _timed(body2, n=3)
    print(json.dumps({"body_ms_at_state": round(t1 * 1e3, 2),
                      "body_marginal_ms": round((t2 - t1) * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    spec = sys.argv[1] if len(sys.argv) > 1 else "nb600"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    main(spec, k)
