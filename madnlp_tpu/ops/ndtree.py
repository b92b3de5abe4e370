"""Multilevel nested-dissection LDLᵀ — level-batched multifrontal method.

The general-sparsity TPU-native direct factorization, completing the
sparse-solver family (banded: ``ops/banded.py``; single-level arrowhead:
``ops/blockarrow.py``).  The reference delegates this job to multifrontal
FFI solvers (MUMPS ``/root/reference/src/LinearSolvers/mumps.jl``, HSL
ma27/57, cuDSS); a multifrontal supernode DAG with dynamic pivoting is
hostile to XLA, but the *level structure* of a nested-dissection tree is
exactly a batching axis:

* the graph is recursively bisected into a binary tree of depth ``L``:
  every edge crossing a bisection moves its later endpoint into that tree
  node's **separator**; leaves keep the remaining vertices;
* elimination proceeds leaves → root, one level at a time.  All fronts at
  one level are independent, so each level is ONE ``vmap``-ed blocked
  dense partial LDLᵀ (MXU GEMMs) — sequential depth ``L ≈ log₂ p`` instead
  of the banded path's ``N/b``;
* a node's **front** is ``[separator | boundary]`` where the boundary is
  the set of ancestor-separator vertices reachable from the subtree — the
  exact fill structure of the multifrontal method, computed host-side by
  the standard bottom-up recurrence ``bnd(node) = (bnd(left) ∪ bnd(right)
  ∪ adj(sep)) \\ sep``;
* the **extend-add** (child update matrix → parent front) is a static
  scatter-add through host-precomputed flat index maps — the same
  static-map discipline as ``coo_to_csc``/``transfer!``
  (src/matrixtools.jl:55-137) and the condensed ``dptr/hptr/jptr`` maps
  (src/KKT/Sparse/condensed.jl:201-301);
* inertia is exact by Sylvester/Haynsworth: the signs of all pivots across
  all fronts (identity padding removed) — the MUMPS ``infog[12]``
  equivalent (src/LinearSolvers/mumps.jl:248-250).

Stability: identical reasoning to the banded/arrow paths — fronts are
principal submatrices of a quasidefinite-interleaved permutation, so the
unpivoted elimination is locally the quasidefinite order (Vanderbei) and
near-zero pivots are skipped and surfaced through the inertia so the IPM
δ-ladder reacts (src/IPM/solver.jl:611-670).

Complexity: for planar-ish graphs (power networks, meshes) nested
dissection gives O(N^{3/2}) flops / O(N log N) factor memory versus the
banded path's O(N·w²) / O(N·w) — the asymptotically right algorithm when
the RCM bandwidth w grows with N.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from .ldlt import ZERO_PIVOT_TOL, ldlt_factorize


class NDLevelFactor(NamedTuple):
    L: jax.Array    # (n, S, S) unit-lower factors of the separator blocks
    d: jax.Array    # (n, S) pivots (identity padding = 1)
    L21: jax.Array  # (n, B, S) off-diagonal factor rows (boundary part)


# A factor is a tuple of per-level NDLevelFactor, deepest level first —
# tuples of NamedTuples are pytrees, so factors flow through jit/scan.
NDFactor = Tuple[NDLevelFactor, ...]


def _roundup(x: int, b: int) -> int:
    return -(-max(x, 0) // b) * b


class NDStructure:
    """Host-side symbolic phase: tree partition, fill boundaries, and all
    static scatter/gather maps.

    ``rows/cols``: symmetric COO pattern in ORIGINAL coordinates, one
    record per unordered pair.  ``perm`` is a locality ordering
    (``K_perm[i,j] = K[perm[i], perm[j]]``); defaults to RCM.
    """

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        N: int,
        perm: np.ndarray = None,
        leaf_size: int = 0,
        ldl_block: int = 64,
        max_levels: int = 10,
    ):
        from .banded import rcm_ordering

        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        self.N = N = int(N)
        if perm is None:
            perm = rcm_ordering(rows, cols, N)
        perm = np.asarray(perm, dtype=np.int64)
        iperm = np.empty(N, dtype=np.int64)
        iperm[perm] = np.arange(N)
        self.perm, self.iperm = perm, iperm
        pr, pc = iperm[rows], iperm[cols]
        off = pr != pc
        eu, ev = pr[off], pc[off]

        if leaf_size <= 0:
            leaf_size = max(128, ldl_block)
        L = int(np.clip(np.log2(max(N, 2) / leaf_size), 1, max_levels))
        self.L = L

        # node of permuted position p at level l: ranges [j*N//2^l, (j+1)*N//2^l)
        # (floor grids nest exactly across levels)
        node_at = [
            np.searchsorted(np.arange(1, 2**l + 1) * N // 2**l,
                            np.arange(N), side="right")
            for l in range(L + 1)
        ]

        # top-down separator assignment: at each level, every edge whose
        # unassigned endpoints fall in different children of the same node
        # sends its LATER endpoint into that node's separator
        owner_lvl = np.full(N, L, dtype=np.int64)
        owner_node = node_at[L].copy()
        assigned = np.zeros(N, dtype=bool)
        for lvl in range(L):
            act = ~assigned[eu] & ~assigned[ev]
            u, v = eu[act], ev[act]
            cut = (node_at[lvl][u] == node_at[lvl][v]) & (
                node_at[lvl + 1][u] != node_at[lvl + 1][v]
            )
            later = np.maximum(u[cut], v[cut])
            assigned[later] = True
            owner_lvl[later] = lvl
            owner_node[later] = node_at[lvl][later]

        # per-node vertex lists (permuted coords, ascending = elimination
        # order within the front)
        self.sep: List[List[np.ndarray]] = []
        for lvl in range(L + 1):
            at = [
                np.where((owner_lvl == lvl) & (owner_node == k))[0]
                for k in range(2**lvl)
            ]
            self.sep.append(at)

        # direct ancestor-neighbors of each node's separator vertices
        du_deep = owner_lvl[eu] > owner_lvl[ev]
        nbrs = [[set() for _ in range(2**lvl)] for lvl in range(L + 1)]
        same = (owner_lvl[eu] == owner_lvl[ev]) & (owner_node[eu] == owner_node[ev])
        deep_v = np.where(du_deep, eu, ev)[~same]
        anc_v = np.where(du_deep, ev, eu)[~same]
        for dv, av in zip(deep_v, anc_v):
            dl_, dn_ = owner_lvl[dv], owner_node[dv]
            al_, an_ = owner_lvl[av], owner_node[av]
            assert al_ < dl_ and (dn_ >> (dl_ - al_)) == an_, (
                "edge endpoints are not on one root path — partition bug"
            )
            nbrs[dl_][dn_].add(av)

        # bottom-up boundary recurrence (the multifrontal fill structure)
        self.bnd: List[List[np.ndarray]] = [
            [None] * (2**lvl) for lvl in range(L + 1)
        ]
        for lvl in range(L, -1, -1):
            for k in range(2**lvl):
                s = set(nbrs[lvl][k])
                if lvl < L:
                    s |= set(self.bnd[lvl + 1][2 * k])
                    s |= set(self.bnd[lvl + 1][2 * k + 1])
                s -= set(self.sep[lvl][k].tolist())
                self.bnd[lvl][k] = np.array(sorted(s), dtype=np.int64)
        assert self.bnd[0][0].size == 0, "root boundary must be empty"

        # per-level padded geometry
        blk = max(8, int(ldl_block))
        self.blk = blk
        self.S = [
            _roundup(max((len(s) for s in self.sep[lvl]), default=0), blk)
            or blk
            for lvl in range(L + 1)
        ]
        self.B = [
            max((len(b) for b in self.bnd[lvl]), default=0)
            for lvl in range(L + 1)
        ]
        self.F = [self.S[l] + self.B[l] for l in range(L + 1)]
        self.nn = [2**l for l in range(L + 1)]
        self.off = np.cumsum([0] + [self.nn[l] * self.F[l] ** 2
                                    for l in range(L + 1)])
        self.flat_size = int(self.off[-1])
        assert self.flat_size < 2**31, "ND assembly buffer exceeds int32"

        # identity padding (unused separator slots) + inertia correction
        pads = []
        pad_total = 0
        for lvl in range(L + 1):
            Fl, Sl = self.F[lvl], self.S[lvl]
            for k in range(self.nn[lvl]):
                s_k = len(self.sep[lvl][k])
                pad_total += Sl - s_k
                base = self.off[lvl] + k * Fl * Fl
                pads.extend(base + i * Fl + i for i in range(s_k, Sl))
        self.pad_idx = np.asarray(pads, dtype=np.int64)
        self.pad_total = int(pad_total)

        # local front position of every vertex: sep index, or S + bnd index
        self._front_pos = np.full(N, -1, dtype=np.int64)
        for lvl in range(L + 1):
            for k in range(self.nn[lvl]):
                self._front_pos[self.sep[lvl][k]] = np.arange(
                    len(self.sep[lvl][k])
                )
        self._owner_lvl, self._owner_node = owner_lvl, owner_node

        # solve-time slot layout: slot(lvl, k, i) = soff[lvl] + k*S_l + i
        self.soff = np.cumsum([0] + [self.nn[l] * self.S[l]
                                     for l in range(L + 1)])
        self.total_slots = int(self.soff[-1])
        slot_of = (
            self.soff[owner_lvl] + owner_node * np.asarray(self.S)[owner_lvl]
            + self._front_pos
        )
        # slot_of is indexed by permuted position; translate to/from the
        # original vertex numbering for the solve-time gathers
        self.vert_slot = slot_of[iperm]          # original vertex -> slot
        src = np.full(self.total_slots, N, dtype=np.int64)
        src[slot_of] = perm                      # slot -> original vertex
        self.slot_src = src

        # boundary gather/scatter maps: (n_l * B_l,) slot ids (trash = total_slots)
        self.bnd_slot = []
        for lvl in range(L + 1):
            Bl = self.B[lvl]
            m = np.full((self.nn[lvl], max(Bl, 1)), self.total_slots,
                        dtype=np.int64)
            for k in range(self.nn[lvl]):
                b = self.bnd[lvl][k]
                m[k, : len(b)] = slot_of[b]
            self.bnd_slot.append(m.reshape(-1))

        # extend-add maps: child (lvl) update (B_l, B_l) -> parent-level
        # flat buffer positions (trash = n_par*F_par²)
        self.ext_idx = [None]
        for lvl in range(1, L + 1):
            Bl = self.B[lvl]
            Fp, Sp_ = self.F[lvl - 1], self.S[lvl - 1]
            trash = self.nn[lvl - 1] * Fp * Fp
            ext = np.full((self.nn[lvl], max(Bl, 1), max(Bl, 1)), trash,
                          dtype=np.int64)
            for k in range(self.nn[lvl]):
                bverts = self.bnd[lvl][k]
                if len(bverts) == 0:
                    continue
                P = k // 2
                psep, pbnd = self.sep[lvl - 1][P], self.bnd[lvl - 1][P]
                pos = np.empty(len(bverts), dtype=np.int64)
                in_sep = np.isin(bverts, psep)
                si = np.searchsorted(psep, bverts[in_sep])
                pos[in_sep] = si
                bi = np.searchsorted(pbnd, bverts[~in_sep])
                assert (pbnd[bi] == bverts[~in_sep]).all(), (
                    "child boundary vertex missing from parent front"
                )
                pos[~in_sep] = Sp_ + bi
                base = P * Fp * Fp
                nb = len(bverts)
                ext[k, :nb, :nb] = base + pos[:, None] * Fp + pos[None, :]
            self.ext_idx.append(ext.reshape(-1))

    # -- assembly map --------------------------------------------------------

    def map(self, rows, cols) -> np.ndarray:
        """Flat indices into the global assembly buffer for COO coordinates
        in the ORIGINAL ordering (one record per unordered pair); entries
        land at the lower-local (hi, lo) position and ``assemble``
        symmetrizes."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        pu, pv = self.iperm[rows], self.iperm[cols]
        lu, lv = self._owner_lvl[pu], self._owner_lvl[pv]
        u_deep = lu > lv
        deep = np.where(u_deep, pu, pv)
        shal = np.where(u_deep, pv, pu)
        dl_, dn_ = self._owner_lvl[deep], self._owner_node[deep]
        same = (lu == lv)
        if same.any():
            assert (
                self._owner_node[pu][same] == self._owner_node[pv][same]
            ).all(), "same-level entry endpoints in different nodes"

        pos_deep = self._front_pos[deep]
        pos_shal = np.empty(len(rows), dtype=np.int64)
        # same node: both are separator locals
        pos_shal[same] = self._front_pos[shal[same]]
        # cross: shallow endpoint sits in the deep node's boundary
        cross = ~same
        for lvl in range(self.L + 1):
            for k in range(self.nn[lvl]):
                selk = cross & (dl_ == lvl) & (dn_ == k)
                if not selk.any():
                    continue
                b = self.bnd[lvl][k]
                bi = np.searchsorted(b, shal[selk])
                assert (b[bi] == shal[selk]).all(), (
                    "entry's ancestor endpoint missing from boundary"
                )
                pos_shal[selk] = self.S[lvl] + bi

        hi = np.maximum(pos_deep, pos_shal)
        lo = np.minimum(pos_deep, pos_shal)
        Fl = np.asarray(self.F)[dl_]
        base = np.asarray(self.off)[dl_] + dn_ * Fl * Fl
        return (base + hi * Fl + lo).astype(np.int32)

    # -- numeric phases ------------------------------------------------------

    def assemble(self, flat_idx, vals, sorted_indices: bool = False):
        """One fused scatter-add -> per-level symmetric front buffers."""
        flat = jnp.zeros((self.flat_size,), vals.dtype)
        flat = flat.at[flat_idx].add(vals, indices_are_sorted=sorted_indices)
        if self.pad_idx.size:
            flat = flat.at[jnp.asarray(self.pad_idx)].add(1.0)
        bufs = []
        for lvl in range(self.L + 1):
            Fl = self.F[lvl]
            b = flat[self.off[lvl]: self.off[lvl + 1]].reshape(
                self.nn[lvl], Fl, Fl
            )
            eye = jnp.eye(Fl, dtype=vals.dtype)
            bufs.append(b + jnp.swapaxes(b, 1, 2) * (1.0 - eye))
        return bufs

    def zero_factor(self, dtype) -> NDFactor:
        out = []
        for lvl in range(self.L + 1):
            n, S, Bl = self.nn[lvl], self.S[lvl], self.B[lvl]
            out.append(
                NDLevelFactor(
                    L=jnp.zeros((n, S, S), dtype),
                    d=jnp.ones((n, S), dtype),
                    L21=jnp.zeros((n, Bl, S), dtype),
                )
            )
        return tuple(out)


def nd_factorize(struct: NDStructure, bufs) -> NDFactor:
    """Leaves → root sweep: per level ONE vmapped blocked partial LDLᵀ and
    ONE extend-add scatter into the parent level."""
    blk = struct.blk
    bufs = list(bufs)
    fac: List[NDLevelFactor] = [None] * (struct.L + 1)
    for lvl in range(struct.L, -1, -1):
        Fb = bufs[lvl]
        S, Bl = struct.S[lvl], struct.B[lvl]
        A = Fb[:, :S, :S]

        def fac1(Ak):
            f = ldlt_factorize(Ak, block=blk)
            return f.L, f.d

        Lf, d = jax.vmap(fac1)(A)
        d_div = jnp.where(jnp.abs(d) <= ZERO_PIVOT_TOL, jnp.inf, d)
        if Bl > 0:
            Bc = Fb[:, S:, :S]
            C = Fb[:, S:, S:]
            Z = solve_triangular(
                Lf, jnp.swapaxes(Bc, 1, 2), lower=True, unit_diagonal=True
            )                                        # (n, S, B)
            W = Z / d_div[:, :, None]
            U = C - jnp.einsum("nsb,nsc->nbc", Z, W)  # Schur update (MXU)
            L21 = jnp.swapaxes(W, 1, 2)               # (n, B, S)
            parent = bufs[lvl - 1].reshape(-1)
            parent = jnp.concatenate(
                [parent, jnp.zeros((1,), parent.dtype)]
            )
            parent = parent.at[jnp.asarray(struct.ext_idx[lvl])].add(
                U.reshape(-1)
            )
            Fp = struct.F[lvl - 1]
            bufs[lvl - 1] = parent[:-1].reshape(struct.nn[lvl - 1], Fp, Fp)
        else:
            L21 = jnp.zeros((struct.nn[lvl], 0, S), Fb.dtype)
        fac[lvl] = NDLevelFactor(L=Lf, d=d, L21=L21)
    return tuple(fac)


def nd_solve(struct: NDStructure, fac: NDFactor, rhs: jax.Array) -> jax.Array:
    """Solve in ORIGINAL coordinates; ``rhs``: (N,) or (N, k)."""
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    k = r.shape[1]
    rpad = jnp.concatenate([r, jnp.zeros((1, k), r.dtype)], axis=0)
    w = rpad[jnp.asarray(struct.slot_src)]
    w = jnp.concatenate([w, jnp.zeros((1, k), r.dtype)], axis=0)  # trash slot

    # forward (leaves -> root), with the diagonal division folded in
    for lvl in range(struct.L, -1, -1):
        n, S, Bl = struct.nn[lvl], struct.S[lvl], struct.B[lvl]
        a, b = struct.soff[lvl], struct.soff[lvl + 1]
        f = fac[lvl]
        ws = w[a:b].reshape(n, S, k)
        u = solve_triangular(f.L, ws, lower=True, unit_diagonal=True)
        d_div = jnp.where(jnp.abs(f.d) <= ZERO_PIVOT_TOL, jnp.inf, f.d)
        w = w.at[a:b].set((u / d_div[:, :, None]).reshape(n * S, k))
        if Bl > 0:
            contrib = jnp.einsum("nbs,nsk->nbk", f.L21, u)
            w = w.at[jnp.asarray(struct.bnd_slot[lvl])].add(
                -contrib.reshape(n * Bl, k)
            )
    w = w.at[-1].set(0.0)  # clear trash before boundary gathers

    # backward (root -> leaves)
    for lvl in range(struct.L + 1):
        n, S, Bl = struct.nn[lvl], struct.S[lvl], struct.B[lvl]
        a, b = struct.soff[lvl], struct.soff[lvl + 1]
        f = fac[lvl]
        vs = w[a:b].reshape(n, S, k)
        if Bl > 0:
            xb = w[jnp.asarray(struct.bnd_slot[lvl])].reshape(n, Bl, k)
            vs = vs - jnp.einsum("nbs,nbk->nsk", f.L21, xb)
        xs = solve_triangular(
            jnp.swapaxes(f.L, 1, 2), vs, lower=False, unit_diagonal=True
        )
        w = w.at[a:b].set(xs.reshape(n * S, k))

    out = w[jnp.asarray(struct.vert_slot)]
    return out[:, 0] if squeeze else out


def nd_inertia(struct: NDStructure, fac: NDFactor) -> Tuple:
    """(pos, zero, neg) by Sylvester: pivot signs over all fronts, identity
    padding removed (non-finite pivots count as zeros so the IPM's
    is_inertia_correct check fails and regularizes)."""
    pos = -jnp.asarray(struct.pad_total)
    neg = jnp.asarray(0)
    for f in fac:
        finite = jnp.isfinite(f.d)
        pos = pos + jnp.sum((f.d > ZERO_PIVOT_TOL) & finite)
        neg = neg + jnp.sum((f.d < -ZERO_PIVOT_TOL) & finite)
    zero = struct.N - pos - neg
    return pos, zero, neg
