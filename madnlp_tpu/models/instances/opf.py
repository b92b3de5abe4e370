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

from ..model import DenseNLPModel, SparseNLPModel


def _network(nb: int, rng):
    """Ring + chords topology; returns the complex Ybus and the edge list
    (ei, ej, g_e, b_e) plus diagonal shunt susceptance."""
    edges = [(i, (i + 1) % nb) for i in range(nb)]
    # chords are *local* in ring distance, like real transmission networks
    # (near-planar, ~1.3 branches/bus): random long-range chords would make
    # the graph an expander, which no fill-reducing ordering can help —
    # unrepresentative of pglib cases
    n_chords = nb // 3
    max_span = max(3, min(30, nb // 20))
    for _ in range(n_chords):
        i = int(rng.integers(0, nb))
        span = int(rng.integers(2, max_span + 1))
        j = (i + span) % nb
        if i != j:
            edges.append((min(i, j), max(i, j)))
    ei = np.array([e[0] for e in edges])
    ej = np.array([e[1] for e in edges])
    r = rng.uniform(0.01, 0.05, len(edges))
    x = rng.uniform(0.05, 0.2, len(edges))
    y = 1.0 / (r + 1j * x)
    bsh = rng.uniform(0.0, 0.02, nb)

    Y = np.zeros((nb, nb), dtype=np.complex128)
    for k, (i, j) in enumerate(edges):
        Y[i, j] -= y[k]
        Y[j, i] -= y[k]
        Y[i, i] += y[k]
        Y[j, j] += y[k]
    Y[np.diag_indices(nb)] += 1j * bsh
    return Y, (ei, ej, np.real(y), np.imag(y), bsh)


def _instance(nb: int, seed: int) -> dict:
    """All numpy instance data, shared by the dense and sparse builders."""
    rng = np.random.default_rng(seed)
    Y, (ei, ej, ge, be, bsh) = _network(nb, rng)
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
    pg_max = pg0 + rng.uniform(0.5, 1.0, ng)
    qg_box = np.abs(qg0) + rng.uniform(0.5, 1.0, ng)
    c2 = rng.uniform(0.5, 2.0, ng)
    c1 = rng.uniform(5.0, 20.0, ng)
    return dict(
        Y=Y, ei=ei, ej=ej, ge=ge, be=be, bsh=bsh, ng=ng, gen_bus=gen_bus,
        pg0=pg0, qg0=qg0, Pd=Pd, Qd=Qd, pg_max=pg_max, qg_box=qg_box,
        c2=c2, c1=c1,
    )


def build(nb: int = 118, seed: int = 0, parametric: bool = False,
          analytic: bool = True):
    """Returns a DenseNLPModel with n = 2·nb + 2·ng variables.

    ``analytic=True`` installs closed-form polar power-flow derivatives
    (the dSbus_dV / d2Sbus_dV2 formulas of the MATPOWER ecosystem, derived
    via Wirtinger calculus): with S = diag(V)·conj(YV),

        dS/dθ  = j·diag(V)·conj(diag(I) − Y·diag(V))
        dS/dvm = diag(u)·conj(diag(I)) + diag(V)·conj(Y·diag(u))

    and for T = Re[wᵀS] (w = yP − j·yQ the complex constraint weights),
    T is bilinear in (V, V̄) so its only Wirtinger second derivative is
    T_{V V̄} = N/2 with N = diag(w)·conj(Y) + Yᴴ·diag(w̄), giving

        H_θθ = 2Re[diag(V) Hc diag(V̄)] − 2 diag(Re[g∘V])
        H_θv = −2Im[diag(V) Hc diag(ū)] − 2 diag(Im[g∘u])
        H_vv = 2Re[diag(u) Hc diag(ū)]          (Hc = N/2, g = N V̄ / 2)

    — a handful of O(nb²) elementwise complex ops instead of nb-tangent
    AD sweeps (the Jacobian/Hessian evaluations were ~30% of the on-chip
    IPM iteration before this).  Verified against the AD derivatives in
    tests/test_opf.py."""
    data = _instance(nb, seed)
    Y = data["Y"]
    ng, gen_bus = data["ng"], data["gen_bus"]
    pg0, qg0 = data["pg0"], data["qg0"]
    Pd, Qd = data["Pd"], data["Qd"]
    pg_max, qg_box = data["pg_max"], data["qg_box"]
    c2, c1 = data["c2"], data["c1"]

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

    jac_fn = lag_hess_fn = None
    if analytic:
        # real-arithmetic expansion of the complex formulas: the TPU
        # backend has no complex128 support, so every complex matrix is
        # carried as a (re, im) pair.  Notation below: V = e + jf,
        # C[i,k] = V_i conj(V_k), S = P + jQ the bus injections.
        Gm, Bm = jnp.asarray(np.real(Y)), jnp.asarray(np.imag(Y))
        gsel_np = gen_bus
        # constant generator jacobian columns: dP_i/dpg_g = -1, dQ/dqg = -1
        Jg = np.zeros((m, 2 * ng))
        Jg[gsel_np, np.arange(ng)] = -1.0
        Jg[nb + gsel_np, ng + np.arange(ng)] = -1.0
        Jgj = jnp.asarray(Jg)

        def _parts(x):
            va, vm, _, _ = split(x)
            cos, sin = jnp.cos(va), jnp.sin(va)
            e, f = vm * cos, vm * sin
            Ir = Gm @ e - Bm @ f
            Ii = Gm @ f + Bm @ e
            P = e * Ir + f * Ii
            Q = f * Ir - e * Ii
            Cr = e[:, None] * e[None, :] + f[:, None] * f[None, :]
            Ci = f[:, None] * e[None, :] - e[:, None] * f[None, :]
            return vm, e, f, P, Q, Cr, Ci

        def jac_body(x):
            vm, e, f, P, Q, Cr, Ci = _parts(x)
            # dS/dθ = j·diag(V)·conj(diag(I) − Y diag(V)):
            #   dP/dθ = diag(-Q) + (Ci∘G − Cr∘B)
            #   dQ/dθ = diag(P)  − (Cr∘G + Ci∘B)
            CrG_CiB = Cr * Gm + Ci * Bm
            CiG_CrB = Ci * Gm - Cr * Bm
            dP_dth = jnp.diag(-Q) + CiG_CrB
            dQ_dth = jnp.diag(P) - CrG_CiB
            # dS/dvm = diag(u conj I) + diag(V) conj(Y diag(u)), u = V/vm:
            inv_vm = 1.0 / vm
            dP_dvm = jnp.diag(P * inv_vm) + CrG_CiB * inv_vm[None, :]
            dQ_dvm = jnp.diag(Q * inv_vm) + CiG_CrB * inv_vm[None, :]
            Jv = jnp.concatenate(
                [
                    jnp.concatenate([dP_dth, dP_dvm], axis=1),
                    jnp.concatenate([dQ_dth, dQ_dvm], axis=1),
                ],
                axis=0,
            )
            return jnp.concatenate([Jv, Jgj], axis=1)

        def hess_body(x, y, obj_weight):
            vm, e, f, P, Q, Cr, Ci = _parts(x)
            yP, yQ = y[:nb], y[nb:]
            # Hc = N/2, N = diag(w)·conj(Y) + Yᵀ·diag(conj w), w = yP − j·yQ
            Hcr = 0.5 * (
                yP[:, None] * Gm - yQ[:, None] * Bm
                + Gm.T * yP[None, :] - Bm.T * yQ[None, :]
            )
            Hci = 0.5 * (
                -(yQ[:, None] * Gm) - yP[:, None] * Bm
                + Bm.T * yP[None, :] + Gm.T * yQ[None, :]
            )
            # g = Hc·conj(V)
            gr = Hcr @ e + Hci @ f
            gi = Hci @ e - Hcr @ f
            # Z[i,k] = V_i Hc[i,k] conj(V_k) = C∘Hc
            ReZ = Cr * Hcr - Ci * Hci
            ImZ = Cr * Hci + Ci * Hcr
            inv_vm = 1.0 / vm
            Htt = 2.0 * ReZ - 2.0 * jnp.diag(gr * e - gi * f)
            Htv = -2.0 * ImZ * inv_vm[None, :] - 2.0 * jnp.diag(
                (gr * f + gi * e) * inv_vm
            )
            Hvv = 2.0 * ReZ * (inv_vm[:, None] * inv_vm[None, :])
            top = jnp.concatenate([Htt, Htv], axis=1)
            bot = jnp.concatenate([Htv.T, Hvv], axis=1)
            Hv = jnp.concatenate([top, bot], axis=0)
            H = jnp.zeros((n, n))
            H = H.at[: 2 * nb, : 2 * nb].set(Hv)
            idx = 2 * nb + jnp.arange(ng)
            return H.at[idx, idx].set(2.0 * obj_weight * c2j)

        if parametric:
            # load scaling enters the constraints additively — derivatives
            # are scale-independent
            jac_fn = lambda x, p: jac_body(x)
            lag_hess_fn = lambda x, y, ow, p: hess_body(x, y, ow)
        else:
            jac_fn = jac_body
            lag_hess_fn = hess_body

    return DenseNLPModel(
        n=n,
        m=m,
        obj=obj,
        cons=cons,
        x0=x0,
        jac=jac_fn,
        lag_hess=lag_hess_fn,
        lvar=lvar,
        uvar=uvar,
        lcon=np.zeros(m),
        ucon=np.zeros(m),
        params=np.ones(()) if parametric else None,
        name=f"synthetic_acopf_nb{nb}",
    )


def build_sparse(nb: int = 118, seed: int = 0, parametric: bool = False):
    """Sparse ACOPF with **edge-local AD derivatives** — the SIMD-abstraction
    trick of ExaModels (the reference's GPU model front end, BASELINE.md):
    the Lagrangian is a sum of per-edge terms in 4 variables, so the sparse
    Jacobian/Hessian values are vmapped 4-point gradients / 4×4 AD Hessians
    over the edge list — nnz-sized evaluation, no dense AD anywhere.

    ``parametric=True``: ``params`` is a scalar load-scaling factor
    (multiplies Pd/Qd) — enables ``solve_batch`` multi-scenario batching
    over the flagship sparse path (loads enter the constraints
    additively, so every derivative callback is scale-independent).

    Identical instance data (same seed) as :func:`build`."""
    import jax

    data = _instance(nb, seed)
    ei, ej = data["ei"], data["ej"]
    ge, be, bsh = data["ge"], data["be"], data["bsh"]
    ng, gen_bus = data["ng"], data["gen_bus"]
    pg0, qg0 = data["pg0"], data["qg0"]
    Pd, Qd = data["Pd"], data["Qd"]
    pg_max, qg_box = data["pg_max"], data["qg_box"]
    c2, c1 = data["c2"], data["c1"]
    nl = len(ei)
    n = 2 * nb + 2 * ng
    m = 2 * nb

    # diagonal Ybus terms: G_ii = Σ g_e, B_ii = Σ b_e + bsh
    Gd = np.zeros(nb)
    Bd = bsh.copy()
    np.add.at(Gd, ei, ge)
    np.add.at(Gd, ej, ge)
    np.add.at(Bd, ei, be)
    np.add.at(Bd, ej, be)

    eij = jnp.asarray(ei)
    ejj = jnp.asarray(ej)
    gej, bej = jnp.asarray(ge), jnp.asarray(be)
    Gdj, Bdj = jnp.asarray(Gd), jnp.asarray(Bd)
    gen_sel = jnp.asarray(gen_bus)
    Pdj, Qdj = jnp.asarray(Pd), jnp.asarray(Qd)
    c2j, c1j = jnp.asarray(c2), jnp.asarray(c1)

    def split(x):
        return x[:nb], x[nb : 2 * nb], x[2 * nb : 2 * nb + ng], x[2 * nb + ng :]

    def edge_flows(z, g, b):
        """(p_i, p_j, q_i, q_j) for one edge; z = (va_i, va_j, vm_i, vm_j).
        Off-diagonal Ybus entry is −(g+jb)."""
        vai, vaj, vmi, vmj = z
        th = vai - vaj
        c, s = jnp.cos(th), jnp.sin(th)
        vv = vmi * vmj
        p_i = vv * (-g * c - b * s)
        q_i = vv * (-g * s + b * c)
        p_j = vv * (-g * c + b * s)
        q_j = vv * (g * s + b * c)
        return jnp.array([p_i, p_j, q_i, q_j])

    def edge_z(x):
        va, vm, _, _ = split(x)
        return jnp.stack([va[eij], va[ejj], vm[eij], vm[ejj]], axis=1)  # (nl,4)

    def cons_scaled(x, scale):
        va, vm, pg, qg = split(x)
        flows = jax.vmap(edge_flows)(edge_z(x), gej, bej)  # (nl, 4)
        P = jnp.zeros(nb).at[eij].add(flows[:, 0]).at[ejj].add(flows[:, 1])
        Q = jnp.zeros(nb).at[eij].add(flows[:, 2]).at[ejj].add(flows[:, 3])
        P = P + Gdj * vm**2
        Q = Q - Bdj * vm**2
        Pg = jnp.zeros(nb).at[gen_sel].add(pg)
        Qg = jnp.zeros(nb).at[gen_sel].add(qg)
        return jnp.concatenate([P - Pg + scale * Pdj, Q - Qg + scale * Qdj])

    if parametric:
        cons = cons_scaled
    else:
        def cons(x):
            return cons_scaled(x, 1.0)

    def obj_x(x):
        _, _, pg, _ = split(x)
        return jnp.sum(c2j * pg**2 + c1j * pg)

    obj = (lambda x, p: obj_x(x)) if parametric else obj_x

    # ---- static sparse structure ----------------------------------------
    # edge jac entries: 4 outputs × 4 inputs per edge
    row_of_out = np.stack([ei, ej, nb + ei, nb + ej], axis=1)       # (nl, 4)
    col_of_in = np.stack([ei, ej, nb + ei, nb + ej], axis=1)        # (nl, 4)
    jac_rows = [np.repeat(row_of_out, 4, axis=1).reshape(-1)]
    jac_cols = [np.tile(col_of_in, (1, 4)).reshape(-1)]
    # node diagonal terms d(P_i)/d(vm_i), d(Q_i)/d(vm_i)
    jac_rows += [np.arange(nb), nb + np.arange(nb)]
    jac_cols += [nb + np.arange(nb), nb + np.arange(nb)]
    # generator columns: dP_i/dpg = -1, dQ_i/dqg = -1
    jac_rows += [gen_bus, nb + gen_bus]
    jac_cols += [2 * nb + np.arange(ng), 2 * nb + ng + np.arange(ng)]
    jac_rows = np.concatenate(jac_rows)
    jac_cols = np.concatenate(jac_cols)

    _edge_jac = jax.vmap(lambda z, g, b: jax.jacfwd(edge_flows)(z, g, b))

    def jac_coords(x):
        va, vm, pg, qg = split(x)
        J_e = _edge_jac(edge_z(x), gej, bej)       # (nl, 4, 4)
        node_p = 2.0 * Gdj * vm
        node_q = -2.0 * Bdj * vm
        gen = jnp.full((2 * ng,), -1.0)
        return jnp.concatenate([J_e.reshape(-1), node_p, node_q, gen])

    # hessian: per-edge 4×4 lower triangle (10 entries), node vm², gen pg²
    tril_i, tril_j = np.tril_indices(4)
    var_of = col_of_in  # (nl, 4): variable index of each edge slot
    hr_e = var_of[:, tril_i]
    hc_e = var_of[:, tril_j]
    # enforce lower-triangular (row >= col) by swapping where needed
    swap = hr_e < hc_e
    hr_e2 = np.where(swap, hc_e, hr_e)
    hc_e2 = np.where(swap, hr_e, hc_e)
    hess_rows = np.concatenate(
        [hr_e2.reshape(-1), nb + np.arange(nb), 2 * nb + np.arange(ng)]
    )
    hess_cols = np.concatenate(
        [hc_e2.reshape(-1), nb + np.arange(nb), 2 * nb + np.arange(ng)]
    )

    def _edge_lagr(z, g, b, w4):
        return jnp.dot(w4, edge_flows(z, g, b))

    _edge_hess = jax.vmap(jax.hessian(_edge_lagr), in_axes=(0, 0, 0, 0))

    def hess_coords(x, y, obj_weight):
        va, vm, pg, qg = split(x)
        yP, yQ = y[:nb], y[nb:]
        w4 = jnp.stack([yP[eij], yP[ejj], yQ[eij], yQ[ejj]], axis=1)  # (nl,4)
        He = _edge_hess(edge_z(x), gej, bej, w4)    # (nl, 4, 4)
        # duplicate-coordinate COO: scatter-add accumulates symmetric halves;
        # off-diagonal pairs that got swapped still address the same (r, c)
        vals_e = He[:, tril_i, tril_j]
        node = 2.0 * (Gdj * yP - Bdj * yQ)
        gen = 2.0 * obj_weight * c2j
        return jnp.concatenate([vals_e.reshape(-1), node, gen])

    lvar = np.concatenate(
        [np.full(nb, -np.pi), np.full(nb, 0.9), np.zeros(ng), -qg_box]
    )
    uvar = np.concatenate(
        [np.full(nb, np.pi), np.full(nb, 1.1), pg_max, qg_box]
    )
    lvar[0] = uvar[0] = 0.0
    x0 = np.concatenate([np.zeros(nb), np.ones(nb), pg0, qg0])

    if parametric:
        # loads enter additively: derivative callbacks are scale-free
        jac_p = lambda x, p: jac_coords(x)
        hess_p = lambda x, y, ow, p: hess_coords(x, y, ow)
    else:
        jac_p, hess_p = jac_coords, hess_coords

    return SparseNLPModel(
        n=n,
        m=m,
        obj=obj,
        cons=cons,
        x0=x0,
        jac_rows=jac_rows,
        jac_cols=jac_cols,
        jac_coords=jac_p,
        hess_rows=hess_rows,
        hess_cols=hess_cols,
        hess_coords=hess_p,
        lvar=lvar,
        uvar=uvar,
        lcon=np.zeros(m),
        ucon=np.zeros(m),
        params=np.ones(()) if parametric else None,
        name=f"synthetic_acopf_sparse_nb{nb}",
    )
