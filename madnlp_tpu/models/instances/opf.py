"""Synthetic AC optimal power flow — the benchmark problem class of the
reference's GPU work (condensed-space IPM on pglib ACOPF, arXiv:2405.14236,
BASELINE.md).  The container has no network egress, so instead of pglib
case files we *generate* AC networks: a ring + random chords topology with
realistic admittance ranges, and loads computed from a randomly drawn
interior operating point — every instance is feasible by construction.

Formulation (polar, like MATPOWER):

    min  Σ_g c2 pg² + c1 pg
    s.t. S_i(V) − (pg − Pd)_i − j(qg − Qd)_i = 0        (2·nb power balance)
         vm ∈ [0.9, 1.1], va_slack = 0, pg/qg in box

with S = V ∘ conj(Y V), V = vm·e^{jθ}.  The bus injections use the *dense*
Ybus — on TPU the power-flow evaluation and its AD derivatives become MXU
matmuls, the TPU-native answer to sparse network evaluation at case118 /
case1354 scale.

Parametric mode: ``params`` is a load-scaling vector, enabling vmapped /
sharded multi-scenario OPF (the SIMD-abstraction configuration)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model import DenseNLPModel


def _network(nb: int, rng):
    """Ring + chords topology, complex admittance matrix."""
    edges = [(i, (i + 1) % nb) for i in range(nb)]
    n_chords = nb // 3
    for _ in range(n_chords):
        i, j = rng.integers(0, nb, 2)
        if i != j:
            edges.append((min(i, j), max(i, j)))
    Y = np.zeros((nb, nb), dtype=np.complex128)
    for i, j in edges:
        r = rng.uniform(0.01, 0.05)
        x = rng.uniform(0.05, 0.2)
        y = 1.0 / (r + 1j * x)
        Y[i, j] -= y
        Y[j, i] -= y
        Y[i, i] += y
        Y[j, j] += y
    # small shunt capacitance
    Y[np.diag_indices(nb)] += 1j * rng.uniform(0.0, 0.02, nb)
    return Y


def build(nb: int = 118, seed: int = 0, parametric: bool = False):
    """Returns a DenseNLPModel with n = 2·nb + 2·ng variables."""
    rng = np.random.default_rng(seed)
    Y = _network(nb, rng)
    ng = max(2, nb // 4)
    gen_bus = np.unique(np.concatenate([[0], rng.integers(0, nb, ng - 1)]))
    ng = len(gen_bus)

    # draw an interior operating point and derive feasible loads
    vm0 = rng.uniform(0.95, 1.05, nb)
    va0 = np.concatenate([[0.0], rng.uniform(-0.2, 0.2, nb - 1)])
    V0 = vm0 * np.exp(1j * va0)
    S0 = V0 * np.conj(Y @ V0)
    pg0 = rng.uniform(0.2, 0.8, ng)
    qg0 = rng.uniform(-0.2, 0.2, ng)
    Pd = -np.real(S0)
    Qd = -np.imag(S0)
    Pd[gen_bus] += pg0
    Qd[gen_bus] += qg0
    # generation box comfortably around the anchor point
    pg_max = pg0 + rng.uniform(0.5, 1.0, ng)
    qg_box = np.abs(qg0) + rng.uniform(0.5, 1.0, ng)
    c2 = rng.uniform(0.5, 2.0, ng)
    c1 = rng.uniform(5.0, 20.0, ng)

    n = 2 * nb + 2 * ng   # [va, vm, pg, qg]
    m = 2 * nb

    G = jnp.asarray(np.real(Y))
    B = jnp.asarray(np.imag(Y))
    gen_sel = jnp.asarray(gen_bus)
    Pdj, Qdj = jnp.asarray(Pd), jnp.asarray(Qd)
    c2j, c1j = jnp.asarray(c2), jnp.asarray(c1)

    def split(x):
        va = x[:nb]
        vm = x[nb : 2 * nb]
        pg = x[2 * nb : 2 * nb + ng]
        qg = x[2 * nb + ng :]
        return va, vm, pg, qg

    def injections(va, vm):
        cos = jnp.cos(va)
        sin = jnp.sin(va)
        e = vm * cos
        f = vm * sin
        # I = Y V;  S = V conj(I)  (rectangular arithmetic, two MXU matmuls)
        Ir = G @ e - B @ f
        Ii = G @ f + B @ e
        P = e * Ir + f * Ii
        Q = f * Ir - e * Ii
        return P, Q

    def make_cons(load_scale):
        def cons_fn(x):
            va, vm, pg, qg = split(x)
            P, Q = injections(va, vm)
            Pg = jnp.zeros(nb).at[gen_sel].add(pg)
            Qg = jnp.zeros(nb).at[gen_sel].add(qg)
            dP = P - Pg + load_scale * Pdj
            dQ = Q - Qg + load_scale * Qdj
            return jnp.concatenate([dP, dQ])

        return cons_fn

    def obj(x, *p):
        _, _, pg, _ = split(x)
        return jnp.sum(c2j * pg**2 + c1j * pg)

    if parametric:
        def cons(x, scale):
            return make_cons(scale)(x)
    else:
        cons = make_cons(1.0)

    lvar = np.concatenate(
        [np.full(nb, -np.pi), np.full(nb, 0.9), np.zeros(ng), -qg_box]
    )
    uvar = np.concatenate(
        [np.full(nb, np.pi), np.full(nb, 1.1), pg_max, qg_box]
    )
    # slack bus angle fixed at 0
    lvar[0] = uvar[0] = 0.0

    x0 = np.concatenate([np.zeros(nb), np.ones(nb), pg0, qg0])

    return DenseNLPModel(
        n=n,
        m=m,
        obj=obj,
        cons=cons,
        x0=x0,
        lvar=lvar,
        uvar=uvar,
        lcon=np.zeros(m),
        ucon=np.zeros(m),
        params=np.ones(()) if parametric else None,
        name=f"synthetic_acopf_nb{nb}",
    )
