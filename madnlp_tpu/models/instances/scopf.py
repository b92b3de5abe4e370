"""Security-constrained OPF — the flagship structured configuration
(BASELINE.json: "multi-period / graph-structured SC-OPF ... Schur-complement
block decomposition").

Two-stage structure: the *coupling* variables are the shared active
generation setpoints ``pg`` (first-stage decision); each scenario k carries
its own network state ``v_k = (va_k, vm_k, qg_k, pslack_k)`` under a
scenario-specific load scaling, with full AC power-balance equalities.
Variable ordering ``x = [v_1, …, v_N, pg]`` matches
:class:`TwoStageStructure`, so the problem runs on the Schur-complement KKT
with the scenario axis shardable over a device mesh.

Feasible by construction: loads are derived per scenario from a drawn
operating point that shares the same ``pg``."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model import DenseNLPModel
from .opf import _instance
from .twostage import TwoStageStructure


def build(nb: int = 14, N: int = 4, seed: int = 0):
    """Returns ``(DenseNLPModel, TwoStageStructure)``."""
    data = _instance(nb, seed)
    Y = data["Y"]
    ng, gen_bus = data["ng"], data["gen_bus"]
    c2, c1 = data["c2"], data["c1"]
    rng = np.random.default_rng(seed + 1)

    # shared first-stage generation anchor
    pg0 = rng.uniform(0.3, 0.7, ng)
    scales = 1.0 + 0.05 * rng.standard_normal(N)

    # per-scenario anchors and derived loads (shared pg, per-scenario slack)
    Pd = np.zeros((N, nb))
    Qd = np.zeros((N, nb))
    qg0 = np.zeros((N, ng))
    ps0 = np.zeros(N)
    vm_anchor = np.zeros((N, nb))
    va_anchor = np.zeros((N, nb))
    for k in range(N):
        vm0 = rng.uniform(0.97, 1.03, nb)
        va0 = np.concatenate([[0.0], rng.uniform(-0.1, 0.1, nb - 1)])
        V0 = vm0 * np.exp(1j * va0)
        S0 = V0 * np.conj(Y @ V0)
        qg0[k] = rng.uniform(-0.1, 0.1, ng)
        ps0[k] = rng.uniform(0.1, 0.3)
        Pd[k] = -np.real(S0)
        Qd[k] = -np.imag(S0)
        Pd[k, gen_bus] += pg0
        Pd[k, 0] += ps0[k]
        Qd[k, gen_bus] += qg0[k]
        vm_anchor[k], va_anchor[k] = vm0, va0

    nv = 2 * nb + ng + 1   # per-scenario: va, vm, qg, pslack
    nd = ng                # coupling: pg
    ms = 2 * nb            # per-scenario power balance
    n = N * nv + nd
    m = N * ms

    G = jnp.asarray(np.real(Y))
    B = jnp.asarray(np.imag(Y))
    gen_sel = jnp.asarray(gen_bus)
    Pdj = jnp.asarray(Pd)
    Qdj = jnp.asarray(Qd)
    c2j, c1j = jnp.asarray(c2), jnp.asarray(c1)

    def split(x):
        V = x[: N * nv].reshape(N, nv)
        pg = x[N * nv :]
        va = V[:, :nb]
        vm = V[:, nb : 2 * nb]
        qg = V[:, 2 * nb : 2 * nb + ng]
        ps = V[:, 2 * nb + ng]
        return va, vm, qg, ps, pg

    def obj(x):
        va, vm, qg, ps, pg = split(x)
        gen_cost = jnp.sum(c2j * pg**2 + c1j * pg)
        # penalize per-scenario slack + reactive usage (keeps scenarios tied)
        return gen_cost + 10.0 * jnp.sum(ps**2) + 0.1 * jnp.sum(qg**2)

    def cons(x):
        va, vm, qg, ps, pg = split(x)
        cos = jnp.cos(va)
        sin = jnp.sin(va)
        e = vm * cos
        f = vm * sin
        Ir = e @ G.T - f @ B.T
        Ii = f @ G.T + e @ B.T
        P = e * Ir + f * Ii            # (N, nb)
        Q = f * Ir - e * Ii
        Pg = jnp.zeros((N, nb)).at[:, gen_sel].add(pg[None, :])
        Pg = Pg.at[:, 0].add(ps)
        Qg = jnp.zeros((N, nb)).at[:, gen_sel].add(qg)
        dP = P - Pg + Pdj
        dQ = Q - Qg + Qdj
        return jnp.concatenate([dP, dQ], axis=1).reshape(-1)  # scenario-grouped

    # bounds
    lv = np.concatenate(
        [np.full(nb, -np.pi), np.full(nb, 0.9), np.full(ng, -1.0), [-1.0]]
    )
    uv = np.concatenate(
        [np.full(nb, np.pi), np.full(nb, 1.1), np.full(ng, 1.0), [1.0]]
    )
    lv[0] = uv[0] = 0.0  # slack-bus angle fixed, per scenario
    lvar = np.concatenate([np.tile(lv, N), np.zeros(ng)])
    uvar = np.concatenate([np.tile(uv, N), pg0 + 1.0])

    x0 = np.concatenate(
        [
            np.concatenate(
                [np.zeros(nb), np.ones(nb), qg0[k], [ps0[k]]]
            )
            for k in range(N)
        ]
        + [pg0]
    )

    model = DenseNLPModel(
        n=n,
        m=m,
        obj=obj,
        cons=cons,
        x0=x0,
        lvar=lvar,
        uvar=uvar,
        lcon=np.zeros(m),
        ucon=np.zeros(m),
        name=f"scopf_nb{nb}_N{N}",
    )
    return model, TwoStageStructure(N=N, nv=nv, nd=nd, ms=ms)
