"""IPM math kernels — masked, fully vectorized reductions.

Each function mirrors one scalar-loop kernel of the reference
(``/root/reference/src/IPM/kernels.jl``); the GPU port re-expressed those
loops as fused mapreduce kernels (``lib/MadNLPGPU/src/IPM/kernels.jl:1-462``)
— that list is exactly what is implemented here, in masked full-length form:
components without a lower/upper bound participate with neutral values
selected by static boolean masks, so every kernel is a static-shape fused
VPU reduction under jit.

Conventions (differ from the reference's signed ``l_diag``/``u_diag``):

* ``dl = x - xl`` (> 0 in the interior) where ``lb_mask``, else 1.
* ``du = xu - x`` (> 0) where ``ub_mask``, else 1.
* ``zl``/``zu`` are full-length with zeros off-mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = jnp.inf


def slacks(x, xl, xu, lb_mask, ub_mask):
    """Masked distances to bounds (safe off-mask)."""
    dl = jnp.where(lb_mask, x - xl, 1.0)
    du = jnp.where(ub_mask, xu - x, 1.0)
    return dl, du


def _msum(v, mask):
    return jnp.sum(jnp.where(mask, v, 0.0))


def _mmax(v, mask, init=0.0):
    return jnp.max(jnp.where(mask, v, init)) if v.size else jnp.asarray(init, v.dtype)


def _mmin(v, mask, init=INF):
    return jnp.min(jnp.where(mask, v, init)) if v.size else jnp.asarray(init, v.dtype)


# -- barrier function --------------------------------------------------------


def get_varphi(obj_val, dl, du, lb_mask, ub_mask, mu):
    """φ = f - μ Σ log(dl) - μ Σ log(du); +Inf outside the interior
    (kernels.jl:263-281)."""
    bad = jnp.any(lb_mask & (dl <= 0)) | jnp.any(ub_mask & (du <= 0))
    safe_l = jnp.where(lb_mask & (dl > 0), dl, 1.0)
    safe_u = jnp.where(ub_mask & (du > 0), du, 1.0)
    val = obj_val - mu * jnp.sum(jnp.log(safe_l)) - mu * jnp.sum(jnp.log(safe_u))
    return jnp.where(bad, INF, val)


def get_varphi_d(f, dl, du, lb_mask, ub_mask, dx, mu):
    """Directional derivative of φ (kernels.jl:341-354)."""
    term = (
        f
        - jnp.where(lb_mask, mu / dl, 0.0)
        + jnp.where(ub_mask, mu / du, 0.0)
    )
    return jnp.dot(term, dx)


# -- residuals ---------------------------------------------------------------


def get_inf_pr(c):
    return jnp.max(jnp.abs(c)) if c.size else jnp.zeros(())


def get_theta(c):
    return jnp.sum(jnp.abs(c)) if c.size else jnp.zeros(())


def get_inf_du(f, zl, zu, jacl, sd):
    v = jnp.abs(f - zl + zu + jacl)
    return (jnp.max(v) if v.size else jnp.zeros(())) / sd


def get_inf_compl(dl, du, zl, zu, lb_mask, ub_mask, mu, sc):
    a = _mmax(jnp.abs(dl * zl - mu), lb_mask)
    b = _mmax(jnp.abs(du * zu - mu), ub_mask)
    return jnp.maximum(a, b) / sc


def get_sd(y, zl, zu, lb_mask, ub_mask, m, nlb, nub, s_max):
    total = jnp.sum(jnp.abs(y)) + _msum(jnp.abs(zl), lb_mask) + _msum(jnp.abs(zu), ub_mask)
    return jnp.maximum(s_max, total / max(1, m + nlb + nub)) / s_max


def get_sc(zl, zu, lb_mask, ub_mask, nlb, nub, s_max):
    total = _msum(jnp.abs(zl), lb_mask) + _msum(jnp.abs(zu), ub_mask)
    return jnp.maximum(s_max, total / max(1, nlb + nub)) / s_max


def get_average_complementarity(dl, du, zl, zu, lb_mask, ub_mask, nlb, nub):
    if nlb + nub == 0:
        return jnp.zeros(())
    return (_msum(dl * zl, lb_mask) + _msum(du * zu, ub_mask)) / (nlb + nub)


def get_min_complementarity(dl, du, zl, zu, lb_mask, ub_mask):
    return jnp.minimum(_mmin(dl * zl, lb_mask), _mmin(du * zu, ub_mask))


# -- step sizes --------------------------------------------------------------


def get_alpha_max(x, xl, xu, dx, tau, lb_mask, ub_mask):
    """Fraction-to-the-boundary for the primal step (kernels.jl:356-371)."""
    cand_l = jnp.where(lb_mask & (dx < 0), (xl - x) * tau / dx, INF)
    cand_u = jnp.where(ub_mask & (dx > 0), (xu - x) * tau / dx, INF)
    lo = jnp.min(cand_l) if dx.size else INF
    hi = jnp.min(cand_u) if dx.size else INF
    return jnp.minimum(1.0, jnp.minimum(lo, hi))


def get_alpha_z(zl, zu, dzl, dzu, tau, lb_mask, ub_mask):
    """Fraction-to-the-boundary for bound duals (kernels.jl:373-388)."""
    cand_l = jnp.where(lb_mask & (dzl < 0), -zl * tau / dzl, INF)
    cand_u = jnp.where(ub_mask & (dzu < 0), -zu * tau / dzu, INF)
    lo = jnp.min(cand_l) if zl.size else INF
    hi = jnp.min(cand_u) if zu.size else INF
    return jnp.minimum(1.0, jnp.minimum(lo, hi))


def get_rel_search_norm(x, dx):
    return jnp.max(jnp.abs(dx) / (1.0 + jnp.abs(x)))


# -- barrier schedule --------------------------------------------------------


def get_mu(mu, mu_min, linear_decrease_factor, superlinear_decrease_power, tol):
    # kernels.jl:697-711 (incl. the issue #242 guard)
    a = jnp.minimum(99.0 * mu_min / tol, 0.01)
    return jnp.maximum(
        jnp.maximum(mu_min, a * tol),
        jnp.minimum(linear_decrease_factor * mu, mu**superlinear_decrease_power),
    )


def get_tau(mu, tau_min):
    return jnp.maximum(tau_min, 1.0 - mu)


# -- filter ------------------------------------------------------------------


class Filter(NamedTuple):
    """Fixed-capacity filter (the reference uses an unbounded Vector,
    src/IPM/IPM.jl:99; a capped array is required under jit).  When full,
    the newest entry overwrites the last slot."""

    th: jax.Array    # (K,)
    ph: jax.Array    # (K,)
    count: jax.Array  # int32


def filter_init(capacity: int, dtype=jnp.float64) -> Filter:
    return Filter(
        th=jnp.full((capacity,), INF, dtype),
        ph=jnp.full((capacity,), INF, dtype),
        count=jnp.zeros((), jnp.int32),
    )


def filter_reset(filt: Filter, theta_max) -> Filter:
    """empty! + push!((theta_max, -Inf)) (solver.jl:74)."""
    th = jnp.full_like(filt.th, INF).at[0].set(theta_max)
    ph = jnp.full_like(filt.ph, INF).at[0].set(-INF)
    return Filter(th, ph, jnp.ones((), jnp.int32))


def filter_augment(filt: Filter, theta, varphi, gamma_theta) -> Filter:
    """kernels.jl:755-757."""
    slot = jnp.minimum(filt.count, filt.th.shape[0] - 1)
    return Filter(
        th=filt.th.at[slot].set((1.0 - gamma_theta) * theta),
        ph=filt.ph.at[slot].set(varphi - gamma_theta * theta),
        count=jnp.minimum(filt.count + 1, filt.th.shape[0]),
    )


def is_filter_acceptable(filt: Filter, theta, varphi):
    """kernels.jl:759-769."""
    finite = jnp.isfinite(theta) & ~jnp.isnan(varphi) & (varphi < INF)
    idx = jnp.arange(filt.th.shape[0])
    active = idx < filt.count
    ok = (theta <= filt.th) | (varphi <= filt.ph) | ~active
    return finite & jnp.all(ok)


# -- line-search predicates --------------------------------------------------


def get_alpha_min(
    theta, varphi_d, theta_min, gamma_theta, gamma_phi, alpha_min_frac, delta,
    s_theta, s_phi,
):
    """kernels.jl:715-741."""
    neg = varphi_d < 0
    case_small = alpha_min_frac * jnp.minimum(
        gamma_theta,
        jnp.minimum(
            gamma_phi * theta / (-varphi_d),
            delta * theta**s_theta / jnp.maximum((-varphi_d) ** s_phi, 1e-300),
        ),
    )
    case_large = alpha_min_frac * jnp.minimum(gamma_theta, -gamma_phi * theta / varphi_d)
    neg_val = jnp.where(theta <= theta_min, case_small, case_large)
    return jnp.where(neg, neg_val, alpha_min_frac * gamma_theta)


def is_switching(varphi_d, alpha, s_phi, delta, theta, s_theta):
    return (varphi_d < 0) & (alpha * (-varphi_d) ** s_phi > delta * theta**s_theta)


def is_armijo(varphi_trial, varphi, eta_phi, alpha, varphi_d):
    return varphi_trial <= varphi + eta_phi * alpha * varphi_d


def is_sufficient_progress(
    theta_trial, theta, gamma_theta, varphi_trial, varphi, gamma_phi, has_constraints
):
    eps = jnp.finfo(theta_trial.dtype).eps
    prog_theta = theta_trial <= (1 - gamma_theta) * theta + 10 * eps * jnp.abs(theta)
    prog_phi = varphi_trial <= varphi - gamma_phi * theta + 10 * eps * jnp.abs(varphi)
    if has_constraints:
        return prog_theta | prog_phi
    return prog_phi


def is_barr_obj_rapid_increase(varphi, varphi_trial, obj_max_inc):
    inc = varphi_trial - varphi
    safe = jnp.where(inc > 0, inc, 1.0)
    return (varphi_trial >= varphi) & (
        jnp.log10(safe) > obj_max_inc + jnp.maximum(1.0, jnp.log10(jnp.abs(varphi)))
    )


# ftype codes used in place of the reference's one-char strings
FTYPE_NONE = 0
FTYPE_F = 1       # "f"  Armijo acceptance
FTYPE_H = 2       # "h"  sufficient progress
FTYPE_SOC_F = 3   # "F"  SOC + Armijo
FTYPE_SOC_H = 4   # "H"  SOC + sufficient progress
FTYPE_RESTORE = 5  # "R" soft restoration

FTYPE_CHARS = {0: " ", 1: "f", 2: "h", 3: "F", 4: "H", 5: "R"}


def get_ftype(
    filt, theta, theta_trial, varphi, varphi_trial, switching_condition,
    armijo_condition, theta_min, obj_max_inc, gamma_theta, gamma_phi,
    has_constraints,
):
    """kernels.jl:803-816 — returns an FTYPE_* code."""
    acceptable = is_filter_acceptable(filt, theta_trial, varphi_trial) & ~(
        is_barr_obj_rapid_increase(varphi, varphi_trial, obj_max_inc)
    )
    case_f = (theta <= theta_min) & switching_condition & armijo_condition
    case_h = (~((theta <= theta_min) & switching_condition)) & is_sufficient_progress(
        theta_trial, theta, gamma_theta, varphi_trial, varphi, gamma_phi,
        has_constraints,
    )
    code = jnp.where(case_f, FTYPE_F, jnp.where(case_h, FTYPE_H, FTYPE_NONE))
    return jnp.where(acceptable, code, FTYPE_NONE)


# -- variable initialization / maintenance ----------------------------------


def set_initial_bounds(xl, xu, lb_mask, ub_mask, tol):
    """Bound relaxation (kernels.jl:206-218)."""
    if tol <= 0:
        return xl, xu
    xl2 = jnp.where(lb_mask, xl - jnp.maximum(1.0, jnp.abs(xl)) * tol, xl)
    xu2 = jnp.where(ub_mask, xu + jnp.maximum(1.0, jnp.abs(xu)) * tol, xu)
    return xl2, xu2


def initialize_variables(x, xl, xu, lb_mask, ub_mask, bound_push, bound_fac):
    """Push the initial point into the interior (kernels.jl:638-654)."""
    both = lb_mask & ub_mask
    gap = jnp.where(both, xu - xl, 1.0)
    pl = jnp.minimum(bound_push * jnp.maximum(1.0, jnp.abs(xl)), bound_fac * gap)
    pu = jnp.minimum(bound_push * jnp.maximum(1.0, jnp.abs(xu)), bound_fac * gap)
    x_both = jnp.minimum(xu - pu, jnp.maximum(xl + pl, x))
    x_lb = jnp.maximum(xl + bound_push * jnp.maximum(1.0, jnp.abs(xl)), x)
    x_ub = jnp.minimum(xu - bound_push * jnp.maximum(1.0, jnp.abs(xu)), x)
    out = jnp.where(
        both, x_both, jnp.where(lb_mask, x_lb, jnp.where(ub_mask, x_ub, x))
    )
    return out


def adjust_boundary(x, xl, xu, lb_mask, ub_mask, mu):
    """Relax bounds that the iterate is pressing against (kernels.jl:656-673)."""
    eps = jnp.finfo(x.dtype).eps
    c1 = eps * mu
    c2 = eps**0.75
    xl2 = jnp.where(
        lb_mask & (x - xl < c1), xl - c2 * jnp.maximum(1.0, jnp.abs(x)), xl
    )
    xu2 = jnp.where(
        ub_mask & (xu - x < c1), xu + c2 * jnp.maximum(1.0, jnp.abs(x)), xu
    )
    return xl2, xu2


def reset_bound_dual(z, d, mask, mu, kappa_sigma):
    """σ-clipping of bound duals (kernels.jl:775-800); `d` is the slack."""
    d_safe = jnp.where(mask, d, 1.0)
    clipped = jnp.maximum(
        jnp.minimum(z, kappa_sigma * mu / d_safe), mu / (kappa_sigma * d_safe)
    )
    return jnp.where(mask, clipped, 0.0)


def dual_inf_perturbation(px, llb_mask, uub_mask, mu, kappa_d):
    """κ_d damping on one-side-bounded variables (kernels.jl:818-823)."""
    return px - jnp.where(llb_mask, mu * kappa_d, 0.0) + jnp.where(
        uub_mask, mu * kappa_d, 0.0
    )


# -- soft/robust restoration kernels ----------------------------------------


def get_F(c, f, zl, zu, jacl, dl, du, lb_mask, ub_mask, mu):
    """Primal-dual error for soft restoration (kernels.jl:572-610)."""
    F1 = jnp.sum(jnp.abs(c)) if c.size else jnp.zeros(())
    F2 = jnp.sum(jnp.abs(f - zl + zu + jacl))
    okl = (dl >= 0) & (zl >= 0)
    oku = (du >= 0) & (zu >= 0)
    F3 = jnp.sum(jnp.where(lb_mask, jnp.where(okl, jnp.abs(dl * zl - mu), INF), 0.0))
    # N.B. the reference has a typo here ((xu_r - xu_r)*zu_r, kernels.jl:606)
    # making F4's compl term vanish; we implement the intended |du*zu - mu|.
    F4 = jnp.sum(jnp.where(ub_mask, jnp.where(oku, jnp.abs(du * zu - mu), INF), 0.0))
    return F1 + F2 + F3 + F4


def get_theta_R(c, p, n):
    return jnp.sum(jnp.abs(c - p + n)) if c.size else jnp.zeros(())


def get_inf_pr_R(c, p, n):
    return jnp.max(jnp.abs(c - p + n)) if c.size else jnp.zeros(())


def get_inf_du_R(f_R, y, zl, zu, jacl, zp, zn, rho, sd):
    a = jnp.max(jnp.abs(f_R - zl + zu + jacl))
    if y.size:
        b = jnp.max(jnp.abs(rho - y - zp))
        c = jnp.max(jnp.abs(rho + y - zn))
        a = jnp.maximum(a, jnp.maximum(b, c))
    return a / sd


def get_inf_compl_R(dl, du, zl, zu, lb_mask, ub_mask, pp, zp, nn, zn, mu_R, sc):
    a = _mmax(jnp.abs(dl * zl - mu_R), lb_mask)
    b = _mmax(jnp.abs(du * zu - mu_R), ub_mask)
    if pp.size:
        a = jnp.maximum(a, jnp.max(jnp.abs(pp * zp - mu_R)))
        b = jnp.maximum(b, jnp.max(jnp.abs(nn * zn - mu_R)))
    return jnp.maximum(a, b) / sc


def get_alpha_max_R(x, xl, xu, dx, lb_mask, ub_mask, pp, dpp, nn, dnn, tau_R):
    a = get_alpha_max(x, xl, xu, dx, tau_R, lb_mask, ub_mask)
    if pp.size:
        cp = jnp.where(dpp < 0, -pp * tau_R / dpp, INF)
        cn = jnp.where(dnn < 0, -nn * tau_R / dnn, INF)
        a = jnp.minimum(a, jnp.minimum(jnp.min(cp), jnp.min(cn)))
    return a


def get_alpha_z_R(zl, zu, dzl, dzu, lb_mask, ub_mask, zp, dzp, zn, dzn, tau_R):
    a = get_alpha_z(zl, zu, dzl, dzu, tau_R, lb_mask, ub_mask)
    if zp.size:
        cp = jnp.where(dzp < 0, -zp * tau_R / dzp, INF)
        cn = jnp.where(dzn < 0, -zn * tau_R / dzn, INF)
        a = jnp.minimum(a, jnp.minimum(jnp.min(cp), jnp.min(cn)))
    return a


def get_varphi_R(obj_val_R, dl, du, lb_mask, ub_mask, pp, nn, mu_R):
    bad = jnp.any(lb_mask & (dl < 0)) | jnp.any(ub_mask & (du < 0))
    safe_l = jnp.where(lb_mask & (dl > 0), dl, 1.0)
    safe_u = jnp.where(ub_mask & (du > 0), du, 1.0)
    val = obj_val_R - mu_R * (
        jnp.sum(jnp.log(safe_l)) + jnp.sum(jnp.log(safe_u))
    )
    if pp.size:
        bad = bad | jnp.any(pp < 0) | jnp.any(nn < 0)
        val = val - mu_R * (
            jnp.sum(jnp.log(jnp.where(pp > 0, pp, 1.0)))
            + jnp.sum(jnp.log(jnp.where(nn > 0, nn, 1.0)))
        )
    return jnp.where(bad, INF, val)


def get_varphi_d_R(f_R, dl, du, lb_mask, ub_mask, dx, pp, nn, dpp, dnn, mu_R, rho):
    term = (
        f_R
        - jnp.where(lb_mask, mu_R / dl, 0.0)
        + jnp.where(ub_mask, mu_R / du, 0.0)
    )
    out = jnp.dot(term, dx)
    if pp.size:
        out = out + jnp.dot(rho - mu_R / pp, dpp) + jnp.dot(rho - mu_R / nn, dnn)
    return out


def get_obj_val_R(p, n, D_R, x, x_ref, rho, zeta):
    val = rho * (jnp.sum(p) + jnp.sum(n)) if p.size else jnp.zeros(())
    return val + 0.5 * zeta * jnp.sum(D_R**2 * (x - x_ref) ** 2)


def populate_RR_nn(c, mu, rho):
    """Closed-form init of the n-slacks (kernels.jl:825-829)."""
    a = (mu - rho * c) / (2 * rho)
    return a + jnp.sqrt(a**2 + mu * c / (2 * rho))
