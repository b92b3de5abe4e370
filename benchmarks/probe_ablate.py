"""Per-phase attribution of the flagship iteration (VERDICT r3 next #1/#6).

Two independent, dispatch-corrected measurements, both free of the ~2-4 ms
tunnel latency that corrupted the round-3 per-phase estimates:

1. CHAINED MARGINALS — each phase (every callback, factorize, one
   backsolve, one operator mul, one full refined solve) is timed as N
   *dependent* applications inside ONE jit, divided by N. These use the
   real solver state/context at the initial point, so the loop structure
   and data are exactly the flagship's. The residual
   ``step_logic = full_step - callbacks - factorize - refine`` is the
   line-search/barrier/filter/norm bookkeeping.

2. STRUCTURE-PRESERVING ABLATIONS — the same 25-iteration ``fori_loop``
   (one dispatch) re-run with (a) Richardson stopped after one sweep but
   ALWAYS reporting converged (loose tol; avoids the δ-ladder
   refactorizations a hard ``max_iter=1`` cap triggers, which changed
   the loop structure and invalidated the diff) and (b) the XLA band
   backend. Factorization counts are printed so any structure drift is
   visible rather than silent.

Usage: python -m benchmarks.probe_ablate [nb600] [--iters 25]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _chain_time(make_step, x0, n=8, reps=3, n_lo=None):
    """DIFFERENTIAL chained marginal: time n_lo and n dependent
    applications in one jit each, return (t_n − t_lo)/(n − n_lo).

    A single chain divided by n still carries the whole-dispatch
    overhead/n — measured ~30 ms for programs closing over the full
    solver state over the axon tunnel, which swamped sub-ms callbacks
    (round-4 first attempt).  The two-length slope cancels it exactly."""
    if n_lo is None:
        n_lo = max(1, n // 4)

    def make_run(m):
        @jax.jit
        def run(x):
            for _ in range(m):
                x = make_step(x)
            return x
        return run

    walls = {}
    for m in (n_lo, n):
        run = make_run(m)
        out = jax.block_until_ready(run(x0))
        ws = []
        for _ in range(reps):
            t0 = time.time()
            out = jax.block_until_ready(run(x0))
            ws.append(time.time() - t0)
        ws.sort()
        walls[m] = ws[len(ws) // 2]
    return (walls[n] - walls[n_lo]) / (n - n_lo)


def chained_marginals(solver, n=8):
    """Per-phase on-device marginals at the flagship state."""
    solver._build_solve_jit()
    kern = solver.kernel
    p = solver.prob
    st = solver.state if solver.state is not None else solver._init_fn()
    jax.block_until_ready(st)
    theta = st.theta if p.model.is_parametric else None
    scal, y = st.scal, st.y
    zero = jnp.zeros(())

    def dep(v):
        """Fold an array into a tiny scalar perturbation (data dependence)."""
        leaves = [l for l in jax.tree_util.tree_leaves(v)
                  if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
        s = sum(jnp.asarray(l).reshape(-1)[0] for l in leaves)
        return s * 1e-30

    out = {}
    w0 = st.x

    # ONE chain for the whole per-iteration callback set (jac + hess +
    # grad + obj + cons): the attribution needs the TOTAL, and a single
    # moderate chain keeps the unrolled program small enough for the
    # remote compiler (a 96-long hessian chain wedged it for >1 h)
    def all_callbacks(w):
        s = p.eval_obj(scal, w, theta) * 1e-30
        s = s + dep(p.eval_grad(scal, w, theta))
        s = s + dep(p.eval_cons(scal, w, theta))
        s = s + dep(p.eval_jac(scal, w, theta))
        s = s + dep(p.eval_lag_hess(scal, w, y, theta))
        return w + s

    def rec(name, v):
        out[name] = v
        print(__import__("json").dumps({name + "_ms": round(v * 1e3, 3)}),
              flush=True)

    rec("all_callbacks", _chain_time(all_callbacks, w0, 32, n_lo=8))

    # factorize chain (dependent through del_w)
    def fact(d):
        ctx = kern._factorize(st, d, zero)
        return dep(ctx)

    rec("factorize", _chain_time(fact, zero, 16, n_lo=4))

    # context for the solve chains
    ctx = jax.jit(lambda: kern._factorize(st, zero, zero))()
    jax.block_until_ready(ctx)
    rhs = jax.jit(lambda: kern._aug_rhs(st, st.c, st.mu))()
    jax.block_until_ready(rhs)

    rec("solve1", _chain_time(lambda r: kern.kkt.solve(ctx, r), rhs, 16, n_lo=4))
    rec("mul1", _chain_time(lambda r: kern.kkt.mul(ctx, r), rhs, 16, n_lo=4))
    rec("refined_solve", _chain_time(
        lambda r: kern.kkt.solve_refine(ctx, r)[0], rhs, 16, n_lo=4))

    # one full regular_step chained (the ground truth per-iter cost)
    body = solver._loop_body
    rec("full_step", _chain_time(lambda s2: body(s2), st, 6, n_lo=2))
    return out


# NOTE round-4 finding: a hard Richardson max_iter=1 cap is NOT a valid
# refinement ablation — unconverged solves trigger the δ-ladder (13 extra
# factorizations at nb=600), changing the loop structure. Refinement cost
# comes from the chained refined_solve vs solve1 marginals instead.
ABLATIONS = {
    "xla_band": {"banded_backend": "xla"},
}


def make_solver(model, **overrides):
    from madnlp_tpu import LinearSolver, MadNLPSolver
    from madnlp_tpu.utils.options import RichardsonOptions

    kw = dict(overrides)
    # match the flagship bench configuration (μ-aware refinement on)
    kw.setdefault("richardson", RichardsonOptions(mu_scaled=True))
    if kw.pop("refine_loose", False):
        # one sweep, always reported converged: preserves the loop
        # structure (no δ-ladder retries), removes the extra sweeps
        kw["richardson"] = RichardsonOptions(
            max_iter=10, tol=0.5, acceptable_tol=1.0)
    kw.setdefault("banded_backend", "pallas")
    return MadNLPSolver(
        model, dtype="float32",
        linear_solver=__import__("madnlp_tpu").LinearSolver.BANDED, **kw)


def fori_time(solver, iters, reps=3):
    solver._build_solve_jit()
    body = solver._loop_body

    @jax.jit
    def run(st):
        return jax.lax.fori_loop(0, iters, lambda i, s: body(s), st)

    st0 = solver._init_fn()
    jax.block_until_ready(st0)
    t0 = time.time()
    out = jax.block_until_ready(run(st0))
    compile_s = time.time() - t0
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(run(st0))
        walls.append(time.time() - t0)
    walls.sort()
    med = walls[len(walls) // 2]
    return {
        "ms_per_iter": round(med / iters * 1e3, 2),
        "spread_pct": round(100 * (walls[-1] - walls[0]) / med, 1),
        "compile_s": round(compile_s, 1),
        "iter_reached": int(out.k),
        "status": int(out.status),
        "backsolves": int(out.backsolve_cnt),
        "factorizations": int(out.factorization_cnt),
    }


def main(spec="nb600", iters=25):
    from benchmarks.probe_profile import make_model

    model = make_model(spec)

    solver = make_solver(model)
    marg = chained_marginals(solver)
    ms = {k: round(v * 1e3, 3) for k, v in marg.items()}
    print(json.dumps({"chained_marginals_ms": ms}), flush=True)

    callbacks = ms["all_callbacks"]
    attribution = {
        "callbacks_ms": callbacks,
        "factorize_ms": ms["factorize"],
        "refined_solve_ms": ms["refined_solve"],
        "step_logic_residual_ms": round(
            ms["full_step"] - callbacks - ms["factorize"]
            - ms["refined_solve"], 2),
        "full_step_ms": ms["full_step"],
    }
    print(json.dumps({"attribution": attribution}), flush=True)

    base = fori_time(solver, iters)
    print(json.dumps({"config": "full", **base}), flush=True)
    for name, overrides in ABLATIONS.items():
        rec = fori_time(make_solver(model, **overrides), iters)
        rec["delta_vs_full_ms"] = round(
            rec["ms_per_iter"] - base["ms_per_iter"], 2)
        print(json.dumps({"config": name, **rec}), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 25
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    main(args[0] if args else "nb600", iters)
