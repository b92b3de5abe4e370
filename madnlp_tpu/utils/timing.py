"""Micro-benchmark / profiling helpers — analogue of the reference's
``timing_callbacks`` / ``timing_linear_solver`` / ``timing_madnlp``
(``/root/reference/src/utils.jl:160-213``): average wall-times over ``ntrials``
for the model evaluations and the KKT factorize/backsolve, on whatever
device the solver runs on."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _avg(fn, ntrials):
    fn()  # compile / warm up
    t0 = time.time()
    for _ in range(ntrials):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / ntrials


def timing_callbacks(solver, ntrials: int = 10) -> dict:
    """Average seconds per obj/grad/cons/jac/hess evaluation."""
    kern = solver.kernel
    st = solver.state if solver.state is not None else solver._init_fn()
    p = solver.prob
    theta = st.theta if p.model.is_parametric else None
    scal, w, y = st.scal, st.x, st.y
    fns = {
        "t_obj": jax.jit(lambda: p.eval_obj(scal, w, theta)),
        "t_grad": jax.jit(lambda: p.eval_grad(scal, w, theta)),
        "t_cons": jax.jit(lambda: p.eval_cons(scal, w, theta)),
        "t_jac": jax.jit(lambda: p.eval_jac(scal, w, theta)),
        "t_hess": jax.jit(lambda: p.eval_lag_hess(scal, w, y, theta)),
    }
    return {k: _avg(f, ntrials) for k, f in fns.items()}


def timing_linear_solver(solver, ntrials: int = 10) -> dict:
    """Average seconds for build+factorize and for one refined backsolve.

    Dispatch-corrected: each measurement chains ``ntrials`` DEPENDENT
    applications inside ONE jit and divides, so the per-call cost is the
    true on-device marginal — a single small dispatch over the axon
    tunnel costs ~2-4 ms, which used to swamp ms-scale kernels measured
    one call at a time (round-3 postmortem, docs/benchmarks.md)."""
    kern = solver.kernel
    st = solver.state if solver.state is not None else solver._init_fn()
    zero = jnp.zeros(())
    rhs = kern._aug_rhs(st, st.c, st.mu)

    def _dep_scalar(ctx):
        # a float scalar drawn from the context to make successive
        # factorizations data-dependent (blocks CSE); works for any
        # context layout — LDLᵀ's ctx.factor.d as much as Schur's
        # SchurFactor (Lb/db/G/S_fac), which has no .d field
        for leaf in jax.tree_util.tree_leaves(ctx):
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
                return jnp.asarray(leaf).reshape(-1)[0]
        return jnp.zeros(())

    @jax.jit
    def fact_chain():
        # thread a scalar through del_w so the factorizations are data-
        # dependent and cannot be CSE'd into one
        dep = zero
        for _ in range(ntrials):
            ctx = kern._factorize(st, dep * 1e-30, zero)
            dep = _dep_scalar(ctx)
        return ctx

    ctx = fact_chain()
    jax.block_until_ready(ctx)
    t0 = time.time()
    ctx = fact_chain()
    jax.block_until_ready(ctx)
    t_fact = (time.time() - t0) / ntrials

    # when the solver config runs μ-aware Richardson stopping, thread the
    # state's μ so the probe measures the SAME refinement target as the
    # real loop — exact-tol refinement here overstated the refined-solve
    # marginal relative to the bench config (ADVICE r4)
    mu = st.mu if solver.opts.richardson.mu_scaled else None

    @jax.jit
    def solve_chain():
        r = rhs
        for _ in range(ntrials):
            r = kern.kkt.solve_refine(ctx, r, mu=mu)[0]
        return r

    out = solve_chain()
    jax.block_until_ready(out)
    t0 = time.time()
    out = solve_chain()
    jax.block_until_ready(out)
    t_solve = (time.time() - t0) / ntrials
    return {
        "t_build_factorize": t_fact,
        "t_backsolve": t_solve,
    }


def timing_madnlp(solver, ntrials: int = 10) -> dict:
    """Both of the above plus one full jitted IPM step."""
    out = {}
    out.update(timing_callbacks(solver, ntrials))
    out.update(timing_linear_solver(solver, ntrials))
    st = solver.state if solver.state is not None else solver._init_fn()
    step = jax.jit(solver.kernel.regular_step)
    out["t_ipm_step"] = _avg(lambda: step(st), ntrials)
    return out


def profile_solve(solver, trace_dir: str, params=None):
    """Run one jitted solve under ``jax.profiler.trace`` — the device-level
    analogue of the reference's ``@trace`` breadcrumb logger
    (src/utils.jl:29-52): per-op device timelines viewable in
    TensorBoard/Perfetto instead of host-side log lines (SURVEY.md §5)."""
    solver._build_solve_jit()
    with jax.profiler.trace(trace_dir):
        stats = solver.solve_jitted(params=params)
    return stats
