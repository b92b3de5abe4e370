"""Adaptive barrier update strategies — quality-function (Nocedal 2009,
§4) and LOQO rules with free↔monotone globalization switching.

Functional port of ``/root/reference/src/IPM/barrier.jl:94-316``.  The
probing solves of the quality-function rule deliberately reuse the *stale*
factorization from the previous IPM iteration without iterative refinement
(barrier.jl:273-283) — the persisted ``state.ctx`` provides it.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..kkt.vec import KKTVec
from . import kernels as K


def _check_progress(kern, st, sc):
    """barrier.jl:104-116."""
    o = kern.opts
    if not o.barrier_options.globalization:
        return jnp.asarray(True)
    kappa_1, kappa_2 = 1e-5, 1.0
    dl, du_ = kern.slacks(st.x, st.xl, st.xu)
    theta = K.get_theta(st.c)
    varphi = K.get_varphi(st.obj_val, dl, du_, kern.lb, kern.ub, st.mu)
    kkt_error = jnp.maximum(st.inf_pr, jnp.maximum(st.inf_du, st.inf_compl))
    delta = kappa_1 * jnp.minimum(kappa_2, kkt_error)
    return K.is_filter_acceptable(st.filter, theta + delta, varphi + delta)


def _avg_compl(kern, st):
    p = kern.prob
    dl, du_ = kern.slacks(st.x, st.xl, st.xu)
    return K.get_average_complementarity(
        dl, du_, st.zl, st.zu, kern.lb, kern.ub, p.nlb, p.nub
    )


def _quality_function(kern, st, sigma, step_aff, step_cen, res_primal, res_dual):
    """Linear quality function qL (barrier.jl:152-201)."""
    p = kern.prob
    d = step_aff.axpy(sigma, step_cen)
    alpha_pr = K.get_alpha_max(st.x, st.xl, st.xu, d.xp, st.tau, kern.lb, kern.ub)
    alpha_du = K.get_alpha_z(st.zl, st.zu, d.zl, d.zu, st.tau, kern.lb, kern.ub)
    dl, du_ = kern.slacks(st.x, st.xl, st.xu)
    cc_lb = jnp.where(
        kern.lb,
        ((dl + alpha_pr * d.xp) * (st.zl + alpha_du * d.zl)) ** 2,
        0.0,
    ).sum()
    cc_ub = jnp.where(
        kern.ub,
        ((du_ - alpha_pr * d.xp) * (st.zu + alpha_du * d.zu)) ** 2,
        0.0,
    ).sum()
    inf_pr = (
        (1.0 - alpha_pr) ** 2 * res_primal**2 / p.m if p.m > 0 else jnp.zeros(())
    )
    inf_du = (1.0 - alpha_du) ** 2 * res_dual**2 / max(p.nw, 1)
    inf_compl = (cc_lb + cc_ub) / max(p.nlb + p.nub, 1)
    return inf_du + inf_pr + inf_compl


def _adaptive_mu_quality(kern, st, sc):
    """barrier.jl:260-302 (incl. Ipopt's interval-restriction heuristics)."""
    o = kern.opts
    bo = o.barrier_options
    p = kern.prob
    if p.nlb + p.nub == 0:
        return jnp.asarray(o.mu_min)

    # affine step (mu = 0, no kappa_d perturbation per set_aug_rhs only)
    dl, du_ = kern.slacks(st.x, st.xl, st.xu)
    px = -st.f + st.zl - st.zu - st.jacl
    rhs_aff = KKTVec(
        xp=px,
        y=-st.c,
        zl=jnp.where(kern.lb, -dl * st.zl, 0.0),
        zu=jnp.where(kern.ub, du_ * st.zu, 0.0),
    )
    res_primal = jnp.linalg.norm(rhs_aff.y) if p.m else jnp.zeros(())
    res_dual = jnp.linalg.norm(rhs_aff.xp)
    step_aff = kern.kkt.solve(st.ctx, rhs_aff)

    mu_avg = _avg_compl(kern, st)
    # centering step
    px_c = K.dual_inf_perturbation(
        jnp.zeros_like(px), kern.llb, kern.uub, mu_avg, o.kappa_d
    )
    rhs_cen = KKTVec(
        xp=px_c,
        y=jnp.zeros_like(st.c),
        zl=jnp.where(kern.lb, mu_avg, 0.0),
        zu=jnp.where(kern.ub, -mu_avg, 0.0),
    )
    step_cen = kern.kkt.solve(st.ctx, rhs_cen)

    def qf(sigma):
        return _quality_function(
            kern, st, sigma, step_aff, step_cen, res_primal, res_dual
        )

    phi1 = qf(jnp.asarray(1.0))
    sigma_1m = 1.0 - 1e-4
    phi1m = qf(jnp.asarray(sigma_1m))
    wide = phi1m > phi1
    sigma_min = jnp.where(wide, 1.0, jnp.maximum(bo.sigma_min, o.mu_min / mu_avg))
    sigma_max = jnp.where(
        wide,
        jnp.minimum(bo.sigma_max, bo.mu_max / mu_avg),
        jnp.minimum(jnp.maximum(sigma_min, sigma_1m), bo.mu_max / mu_avg),
    )

    # golden-section search (barrier.jl:205-246)
    gfac = 0.5 * (3.0 - jnp.sqrt(5.0))
    s1, s2 = sigma_min, sigma_max
    p1, p2 = qf(s1), qf(s2)
    s1_in, s2_in, p1_in, p2_in = s1, s2, p1, p2
    m1 = s1 + gfac * (s2 - s1)
    m2 = s1 + (1.0 - gfac) * (s2 - s1)
    pm1, pm2 = qf(m1), qf(m2)

    def body(i, carry):
        s1, s2, m1, m2, pm1, pm2, done = carry

        def shrink(carry):
            s1, s2, m1, m2, pm1, pm2, _ = carry

            def right(args):
                s1, s2, m1, m2, pm1, pm2 = args
                s1n = m1
                m1n = m2
                m2n = s1n + (1.0 - gfac) * (s2 - s1n)
                return s1n, s2, m1n, m2n, pm2, qf(m2n)

            def left(args):
                s1, s2, m1, m2, pm1, pm2 = args
                s2n = m2
                m2n = m1
                m1n = s1 + gfac * (s2n - s1)
                return s1, s2n, m1n, m2n, qf(m1n), pm1

            s1, s2, m1, m2, pm1, pm2 = lax.cond(
                pm1 > pm2, right, left, (s1, s2, m1, m2, pm1, pm2)
            )
            done = s2 - s1 < bo.sigma_tol * s2
            return s1, s2, m1, m2, pm1, pm2, done

        return lax.cond(done, lambda c: c, shrink, carry)

    s1, s2, m1, m2, pm1, pm2, _ = lax.fori_loop(
        0, bo.max_gs_iter, body, (s1, s2, m1, m2, pm1, pm2, jnp.asarray(False))
    )
    sigma = jnp.where(pm1 < pm2, m1, m2)
    phi = jnp.minimum(pm1, pm2)
    # fall back to the input endpoints when the search didn't converge
    sigma = jnp.where((s2 == s2_in) & (p2_in < phi), s2_in, sigma)
    sigma = jnp.where((s1 == s1_in) & (p1_in < phi), s1_in, sigma)
    return jnp.clip(sigma * mu_avg, o.mu_min, bo.mu_max)


def _adaptive_mu_loqo(kern, st, sc):
    """barrier.jl:304-316."""
    o = kern.opts
    bo = o.barrier_options
    p = kern.prob
    if p.nlb + p.nub == 0:
        return jnp.asarray(o.mu_min)
    dl, du_ = kern.slacks(st.x, st.xl, st.xu)
    mu_avg = _avg_compl(kern, st)
    min_cc = K.get_min_complementarity(dl, du_, st.zl, st.zu, kern.lb, kern.ub)
    xi = min_cc / mu_avg
    sigma = bo.gamma * jnp.minimum((1.0 - bo.r) * (1.0 - xi) / xi, 2.0) ** 3
    return jnp.clip(sigma * mu_avg, o.mu_min, bo.mu_max)


def update_barrier_adaptive(kern, st, sc, rule: str):
    """barrier.jl:118-149 — free/monotone globalization switch."""
    o = kern.opts
    old_mu = st.mu
    progress = _check_progress(kern, st, sc)
    free = st.barrier_free_mode

    # state machine on (free, progress)
    def when_monotone(st):
        def back_to_free(st):
            return st._replace(barrier_free_mode=jnp.asarray(True))

        def stay_monotone(st):
            return kern.update_barrier_monotone(st, sc)

        return lax.cond(progress, back_to_free, stay_monotone, st)

    def when_free(st):
        def lose_progress(st):
            mu_fixed = jnp.clip(0.8 * _avg_compl(kern, st), o.mu_min, o.barrier_options.mu_max)
            return st._replace(
                barrier_free_mode=jnp.asarray(False), mu=mu_fixed
            )

        return lax.cond(progress, lambda s: s, lose_progress, st)

    st = lax.cond(free, when_free, when_monotone, st)

    # in free mode: compute adaptive mu
    def adaptive(st):
        mu = (
            _adaptive_mu_quality(kern, st, sc)
            if rule == "quality_function"
            else _adaptive_mu_loqo(kern, st, sc)
        )
        return st._replace(mu=mu)

    st = lax.cond(st.barrier_free_mode, adaptive, lambda s: s, st)

    # tau / filter reset when mu moved (barrier.jl:143-148)
    def on_change(st):
        return st._replace(
            tau=K.get_tau(st.mu, o.tau_min),
            filter=K.filter_reset(st.filter, st.theta_max),
        )

    st = lax.cond(st.mu != old_mu, on_change, lambda s: s, st)
    # keep inf_compl_mu coherent for printing/monotone checks
    dl, du_ = kern.slacks(st.x, st.xl, st.xu)
    icm = K.get_inf_compl(dl, du_, st.zl, st.zu, kern.lb, kern.ub, st.mu, sc)
    return st._replace(inf_compl_mu=icm)
