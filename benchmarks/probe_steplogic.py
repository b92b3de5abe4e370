"""Step-logic attribution (round 4): the differential-chain probe
(probe_ablate) showed the nb=600 iteration is NOT dominated by callbacks
(0.45 ms) but by factorize (~4 ms), refinement (~2.5 ms) and a ~6 ms
residual of line-search/barrier/residual/filter bookkeeping + control
flow.  This probe splits that residual with the same differential-chain
method (two chain lengths in one jit each; slope cancels dispatch).

Phases measured (all at the flagship initial state, fixed ctx/d):

  pre        jacl + sd/sc + residuals + log row (top of regular_step)
  barrier    monotone barrier update
  aug_rhs    RHS assembly + kappa_d perturbation
  ic_scaffold  inertia_correction minus its known factorize+refine cost
  line_search  full filter line search (includes 1 obj+cons eval pair)
  accept     boundary adjust + bound-dual reset + gradient refresh

Usage: python -m benchmarks.probe_steplogic [nb600]
"""

import json
import sys

import jax
import jax.numpy as jnp

from benchmarks.probe_ablate import _chain_time, make_solver


def main(spec="nb600"):
    from benchmarks.probe_profile import make_model
    from madnlp_tpu.ipm import kernels as K

    model = make_model(spec)
    solver = make_solver(model)
    solver._build_solve_jit()
    kern = solver.kernel
    p = solver.prob
    st = solver._init_fn()
    jax.block_until_ready(st)
    zero = jnp.zeros(())

    ctx = jax.jit(lambda: kern._factorize(st, zero, zero))()
    jax.block_until_ready(ctx)
    rhs = jax.jit(lambda: kern._aug_rhs(st, st.c, st.mu))()
    d, _, _ = jax.jit(lambda: kern.kkt.solve_refine(ctx, rhs))()
    jax.block_until_ready(d)

    def dep(v):
        leaves = [l for l in jax.tree_util.tree_leaves(v)
                  if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
        return sum(jnp.asarray(l).reshape(-1)[0] for l in leaves) * 1e-30

    out = {}

    def rec(name, v):
        out[name] = round(v * 1e3, 3)
        print(json.dumps({name + "_ms": out[name]}), flush=True)

    def pre(s):
        s = s._replace(jacl=kern.kkt.jtprod(s.jac, s.y))
        sd, sc = kern._sd_sc(s)
        inf_pr, inf_du, inf_compl = kern._residuals(s, sd, sc)
        row = jnp.stack([inf_pr, inf_du, inf_compl, sd, sc])
        return s._replace(x=s.x + dep(row))

    rec("pre_residuals", _chain_time(pre, st, 16, n_lo=4))

    sd0, sc0 = jax.jit(lambda: kern._sd_sc(st))()

    def barrier(s):
        s2 = kern.update_barrier(s, sc0)
        return s._replace(x=s.x + dep((s2.mu, s2.tau)))

    rec("barrier", _chain_time(barrier, st, 16, n_lo=4))

    def aug(s):
        r = kern._aug_rhs(s, s.c, s.mu)
        return s._replace(x=s.x + dep(r))

    rec("aug_rhs", _chain_time(aug, st, 16, n_lo=4))

    def ic(s):
        ctx2, d2, ok, s2 = kern.inertia_correction(s, rhs)
        return s._replace(x=s.x + dep(d2) + dep(ctx2.factor.d))

    rec("inertia_corr_total", _chain_time(ic, st, 8, n_lo=2))

    def ls(s):
        s2 = kern.filter_line_search(s, ctx, d)
        return s._replace(x=s.x + dep((s2.alpha, s2.obj_val_trial)))

    rec("line_search", _chain_time(ls, st, 16, n_lo=4))

    lb, ub = kern.lb, kern.ub

    def accept(s):
        x = s.x_trial
        xl, xu = K.adjust_boundary(x, s.xl, s.xu, lb, ub, s.mu)
        dl, du_ = K.slacks(x, xl, xu, lb, ub)
        zl = K.reset_bound_dual(s.zl, dl, lb, s.mu, kern.opts.kappa_sigma)
        zu = K.reset_bound_dual(s.zu, du_, ub, s.mu, kern.opts.kappa_sigma)
        f = p.eval_grad(s.scal, x, s.theta if p.model.is_parametric else None)
        return s._replace(x=s.x + dep((xl, xu, zl, zu, f)))

    st_t = st._replace(x_trial=st.x)
    rec("accept_block", _chain_time(accept, st_t, 16, n_lo=4))

    print(json.dumps({"steplogic_ms": out}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nb600")
