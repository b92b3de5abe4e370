"""Two-stage (multi-scenario) QP generator — analogue of the reference's
``TwoStageQP`` Schur fixture (``lib/MadNLPTests/src/Instances/twostage_qp.jl``).

    min  Σ_k ½ v_kᵀ Q v_k + q_kᵀ v_k  +  ½ dᵀ R d + rᵀ d
    s.t. B v_k + F d + b_k  ∈ [gl, gu]   (per scenario, mixed eq/ineq)
         0 <= v_k <= vmax,  0 <= d <= dmax

Variable ordering: ``x = [v_1, …, v_N, d]`` — the block-arrowhead layout the
Schur-complement KKT system exploits (scenario blocks shard over a mesh
axis; the coupling block is replicated)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..model import DenseNLPModel


@dataclasses.dataclass(frozen=True)
class TwoStageStructure:
    """Static structure consumed by the Schur-complement KKT system."""

    N: int    # scenarios
    nv: int   # per-scenario variables
    nd: int   # coupling variables
    ms: int   # per-scenario constraints


def build(N=4, nv=6, nd=3, ms=3, n_eq=1, seed=0, parametric=False):
    """Returns ``(DenseNLPModel, TwoStageStructure)``; the first ``n_eq``
    rows of every scenario are equality constraints.

    ``parametric=True`` adds a scalar load parameter θ shifting every
    scenario right-hand side (``b_k + 0.02·θ``) — enables ``vmap``/sharded
    *batches of two-stage instances* on top of the scenario-sharded Schur
    KKT (DCN batch axis × ICI scenario axis)."""
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((nv, nv))
    Q = Q @ Q.T + nv * np.eye(nv)
    R = rng.standard_normal((nd, nd))
    R = R @ R.T + nd * np.eye(nd)
    qs = rng.standard_normal((N, nv))
    r = rng.standard_normal(nd)
    B = rng.standard_normal((ms, nv))
    F = rng.standard_normal((ms, nd))
    # Choose b so the interior point (v, d) = 0.5 satisfies every row:
    # equality rows at 0 exactly, inequality rows at 0.5 (mid-interval).
    anchor = B @ np.full(nv, 0.5) + F @ np.full(nd, 0.5)
    bs = -anchor[None, :] + rng.standard_normal((N, ms)) * 0.05
    bs[:, n_eq:] += 0.5

    gl = np.zeros(ms)
    gu = np.ones(ms)
    gu[:n_eq] = 0.0  # equality rows

    n = N * nv + nd
    m = N * ms

    Qj, Rj, Bj, Fj = map(jnp.asarray, (Q, R, B, F))
    qsj, rj, bsj = map(jnp.asarray, (qs, r, bs))

    def split(x):
        V = x[: N * nv].reshape(N, nv)
        d = x[N * nv :]
        return V, d

    def obj(x, *th):
        V, d = split(x)
        return (
            0.5 * jnp.einsum("ki,ij,kj->", V, Qj, V)
            + jnp.sum(qsj * V)
            + 0.5 * d @ (Rj @ d)
            + rj @ d
        )

    def cons(x, *th):
        V, d = split(x)
        shift = 0.02 * th[0] if parametric else 0.0
        C = V @ Bj.T + (Fj @ d)[None, :] + bsj + shift  # (N, ms)
        return C.reshape(-1)

    def grad(x, *th):
        V, d = split(x)
        gV = V @ Qj.T + qsj
        gd = Rj @ d + rj
        return jnp.concatenate([gV.reshape(-1), gd])

    def jac(x, *th):
        J = jnp.zeros((m, n))
        for k in range(N):
            J = J.at[k * ms : (k + 1) * ms, k * nv : (k + 1) * nv].set(Bj)
            J = J.at[k * ms : (k + 1) * ms, N * nv :].set(Fj)
        return J

    def lag_hess(x, y, ow, *th):
        H = jnp.zeros((n, n))
        for k in range(N):
            H = H.at[k * nv : (k + 1) * nv, k * nv : (k + 1) * nv].set(ow * Qj)
        H = H.at[N * nv :, N * nv :].set(ow * Rj)
        return H

    model = DenseNLPModel(
        n=n,
        m=m,
        obj=obj,
        cons=cons,
        grad=grad,
        jac=jac,
        lag_hess=lag_hess,
        x0=np.zeros(n),
        lvar=np.zeros(n),
        uvar=np.ones(n),
        lcon=np.tile(gl, N),
        ucon=np.tile(gu, N),
        params=np.zeros(()) if parametric else None,
        name=f"twostage_qp_N{N}",
    )
    return model, TwoStageStructure(N=N, nv=nv, nd=nd, ms=ms)
