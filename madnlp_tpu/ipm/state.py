"""Solver state as an immutable pytree.

The reference's mutable ``MadNLPSolver`` mega-struct
(``/root/reference/src/IPM/IPM.jl:9-106``) — pre-allocated so the hot loop is
allocation-free — maps naturally onto an immutable NamedTuple pytree: fixed
shapes, pure-function updates, jit/vmap/shard-compatible, and trivially
checkpointable (orbax) since it is "just arrays".

The restoration phase state (``RobustRestorer``, src/IPM/restoration.jl) and
the soft-restoration backups live inside the same pytree so the three-phase
state machine (REGULAR/RESTORE/ROBUST, solver.jl:162-166) can run under a
single ``lax.while_loop``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kkt.vec import KKTVec, kkt_zeros
from .kernels import Filter, filter_init
from .problem import Scaling
from .quasi_newton import QNState, qn_zeros


class RRState(NamedTuple):
    """Robust (ℓ1-penalty) restoration phase state (restoration.jl:1-37)."""

    obj_val_R: jax.Array
    f_R: jax.Array          # (nw,)
    x_ref: jax.Array        # (nw,)
    theta_ref: jax.Array
    D_R: jax.Array          # (nw,)
    obj_val_R_trial: jax.Array
    pp: jax.Array           # (m,)
    nn: jax.Array
    zp: jax.Array
    zn: jax.Array
    dpp: jax.Array
    dnn: jax.Array
    dzp: jax.Array
    dzn: jax.Array
    pp_trial: jax.Array
    nn_trial: jax.Array
    inf_pr_R: jax.Array
    inf_du_R: jax.Array
    inf_compl_R: jax.Array
    mu_R: jax.Array
    tau_R: jax.Array
    zeta: jax.Array
    filter: Filter


def rr_zeros(nw: int, m: int, filter_capacity: int) -> RRState:
    z = jnp.zeros(())
    return RRState(
        obj_val_R=z,
        f_R=jnp.zeros((nw,)),
        x_ref=jnp.zeros((nw,)),
        theta_ref=z,
        D_R=jnp.zeros((nw,)),
        obj_val_R_trial=z,
        pp=jnp.zeros((m,)),
        nn=jnp.zeros((m,)),
        zp=jnp.ones((m,)),
        zn=jnp.ones((m,)),
        dpp=jnp.zeros((m,)),
        dnn=jnp.zeros((m,)),
        dzp=jnp.zeros((m,)),
        dzn=jnp.zeros((m,)),
        pp_trial=jnp.zeros((m,)),
        nn_trial=jnp.zeros((m,)),
        inf_pr_R=z,
        inf_du_R=z,
        inf_compl_R=z,
        mu_R=jnp.ones(()),
        tau_R=jnp.ones(()) * 0.99,
        zeta=jnp.ones(()),
        filter=filter_init(filter_capacity),
    )


class State(NamedTuple):
    # primal-dual iterate
    x: jax.Array            # (nw,) w = (x, s)
    y: jax.Array            # (m,)
    zl: jax.Array           # (nw,) masked
    zu: jax.Array           # (nw,) masked
    xl: jax.Array           # (nw,) current (relaxed/adjusted) bounds
    xu: jax.Array
    # evaluations at the current iterate
    obj_val: jax.Array
    f: jax.Array            # (nw,) gradient
    c: jax.Array            # (m,)
    jac: jax.Array          # (m, nw)
    hess: jax.Array         # (n, n)
    jacl: jax.Array         # (nw,) Aᵀy
    # trial point
    x_trial: jax.Array
    obj_val_trial: jax.Array
    c_trial: jax.Array
    # direction / rhs
    d: KKTVec
    p: KKTVec
    # barrier / filter
    mu: jax.Array
    tau: jax.Array
    filter: Filter
    theta_max: jax.Array
    theta_min: jax.Array
    # regularization
    del_w: jax.Array
    del_c: jax.Array
    del_w_last: jax.Array
    # residuals
    inf_pr: jax.Array
    inf_du: jax.Array
    inf_compl: jax.Array
    inf_compl_mu: jax.Array
    # step info
    alpha: jax.Array
    alpha_z: jax.Array
    ftype: jax.Array        # int32, kernels.FTYPE_*
    # counters (int32)
    k: jax.Array
    l_cnt: jax.Array
    acceptable_cnt: jax.Array
    unsuccessful_iterate: jax.Array
    restoration_fail_count: jax.Array
    t_cnt: jax.Array
    factorization_cnt: jax.Array
    backsolve_cnt: jax.Array
    last_ir: jax.Array      # refinement iters of the most recent KKT solve
    obj_cnt: jax.Array
    grad_cnt: jax.Array
    con_cnt: jax.Array
    jac_cnt: jax.Array
    hess_cnt: jax.Array
    # status / phase
    status: jax.Array       # int32 (Status)
    # scaling
    scal: Scaling
    # soft restoration (restore!) locals
    soft_F: jax.Array
    backup_x: jax.Array     # (nw,)
    backup_y: jax.Array     # (m,)
    backup_c: jax.Array     # (m,)
    # robust restoration
    RR: RRState
    rr_init_needed: jax.Array  # bool: ROBUST entered, restorer not yet set up
    # adaptive barrier state
    barrier_free_mode: jax.Array  # bool
    # instance parameters (parametric/batched mode; () when unused)
    theta: object
    # quasi-Newton memory
    qn: QNState
    # persisted KKT context (last factorization; used by adaptive barrier
    # probing solves, barrier.jl:260-302, which reuse the stale factor)
    ctx: object
    # iteration-log snapshot, taken inside the step at the reference's
    # print_iter position (solver.jl:235): [k, obj, inf_pr, inf_du,
    # inf_compl, mu, del_w, alpha, ir, ls, ftype, is_resto]
    log_row: jax.Array


def state_zeros(
    nw: int, m: int, n: int, filter_capacity: int, theta=(), qn_mem: int = 0,
    ctx=(), jac_t=None, hess_t=None,
) -> State:
    z = jnp.zeros(())
    i0 = jnp.zeros((), jnp.int32)
    return State(
        x=jnp.zeros((nw,)),
        y=jnp.zeros((m,)),
        zl=jnp.zeros((nw,)),
        zu=jnp.zeros((nw,)),
        xl=jnp.full((nw,), -jnp.inf),
        xu=jnp.full((nw,), jnp.inf),
        obj_val=z,
        f=jnp.zeros((nw,)),
        c=jnp.zeros((m,)),
        jac=jnp.zeros((m, nw)) if jac_t is None else jac_t,
        hess=jnp.zeros((n, n)) if hess_t is None else hess_t,
        jacl=jnp.zeros((nw,)),
        x_trial=jnp.zeros((nw,)),
        obj_val_trial=z,
        c_trial=jnp.zeros((m,)),
        d=kkt_zeros(nw, m),
        p=kkt_zeros(nw, m),
        mu=jnp.asarray(1e-1),
        tau=jnp.asarray(0.99),
        filter=filter_init(filter_capacity),
        theta_max=z,
        theta_min=z,
        del_w=z,
        del_c=z,
        del_w_last=z,
        inf_pr=z,
        inf_du=z,
        inf_compl=z,
        inf_compl_mu=z,
        alpha=z,
        alpha_z=z,
        ftype=i0,
        k=i0,
        l_cnt=i0,
        acceptable_cnt=i0,
        unsuccessful_iterate=i0,
        restoration_fail_count=i0,
        t_cnt=i0,
        factorization_cnt=i0,
        backsolve_cnt=i0,
        last_ir=i0,
        obj_cnt=i0,
        grad_cnt=i0,
        con_cnt=i0,
        jac_cnt=i0,
        hess_cnt=i0,
        status=i0,
        scal=Scaling(jnp.ones(()), jnp.ones((m,))),
        soft_F=z,
        backup_x=jnp.zeros((nw,)),
        backup_y=jnp.zeros((m,)),
        backup_c=jnp.zeros((m,)),
        RR=rr_zeros(nw, m, filter_capacity),
        rr_init_needed=jnp.asarray(False),
        barrier_free_mode=jnp.asarray(True),
        theta=theta,
        qn=qn_zeros(n, qn_mem),
        ctx=ctx,
        log_row=jnp.zeros((12,)),
    )
