"""Nested-dissection block-arrowhead LDLᵀ — batched sparse factorization.

Second TPU-native *sparse* direct factorization, complementing the
block-banded LDLᵀ (``ops/banded.py``).  The reference delegates sparse
symmetric-indefinite factorization to multifrontal FFI solvers (MUMPS
``/root/reference/src/LinearSolvers/mumps.jl``, HSL ma27/57, cuDSS); a
multifrontal supernode DAG is hostile to XLA's static-shape model, but its
*top level* — nested dissection into independent subtrees joined by a
separator — maps perfectly:

* the permuted matrix is a doubly-bordered block-diagonal (arrowhead) form
  ``[diag(A_1..A_p)  Cᵀ; C  A_sep]``;
* the ``p`` diagonal blocks are **independent**: factored by ONE batched
  (``vmap``-ed) blocked dense LDLᵀ — large MXU GEMMs, no sequential scan
  (the banded factorization is a length-``N/b`` sequential ``fori_loop``;
  here the sequential depth is 2: blocks, then separator);
* the coupling ``S = A_sep − Σₖ Cₖ Aₖ⁻¹ Cₖᵀ`` is one batched triangular
  solve + one einsum-GEMM reduction — the same two-GEMM shape as the
  reference's GPU Schur path (ext/MadNLPGPUCUDAExt/cuda_schur.jl:535-559),
  applied here *inside* the linear solver for arbitrary sparse systems;
* inertia is exact by Haynsworth additivity:
  ``In(K) = Σₖ In(Aₖ) + In(S)`` (pivot signs of the block factors plus the
  separator factor) — the MUMPS ``infog[12]`` equivalent.

Symbolic phase (host-side numpy, trace-time only): take a locality ordering
(RCM / quasidefinite-interleaved, shared with the banded path), chop it into
``p`` contiguous chunks, and move — for every edge crossing two chunks — the
*later* endpoint into the separator.  One pass leaves no cross-block edges,
so the block structure is exact, not padded.  Assembly from COO values is
one fused sorted scatter-add through a precomputed flat map (same static-map
discipline as the banded/condensed paths; reference analogue ``coo_to_csc``
+ ``transfer!``, src/matrixtools.jl:55-137).

Stability: blocks are principal submatrices of the quasidefinite-interleaved
permutation, so unpivoted LDLᵀ is stable for the same reason as the banded
path (Vanderbei); near-zero pivots are skipped and surfaced through the
inertia so the IPM's δ-ladder reacts (src/IPM/solver.jl:611-670).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from .ldlt import ZERO_PIVOT_TOL, ldlt_factorize, ldlt_inertia, ldlt_solve


class ArrowFactor(NamedTuple):
    Lb: jax.Array    # (p, bmax, bmax) unit-lower block factors
    db: jax.Array    # (p, bmax) block pivots (identity padding = 1)
    C: jax.Array     # (p, ns, bmax) couplings (needed for rhs reduction)
    X: jax.Array     # (p, bmax, ns) = Aₖ⁻¹ Cₖᵀ (back-substitution operator)
    sL: jax.Array    # separator LDLᵀ: L
    sd: jax.Array    # separator LDLᵀ: d


class ArrowStructure:
    """Host-side symbolic phase: partition + flat scatter map.

    ``rows/cols``: COO pattern in ORIGINAL coordinates, one record per
    unordered symmetric pair.  ``perm`` is a locality ordering
    (``K_perm[i,j] = K[perm[i], perm[j]]``); defaults to RCM.
    """

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        N: int,
        perm: np.ndarray = None,
        nparts: int = 0,
        ldl_block: int = 64,
    ):
        from .banded import rcm_ordering

        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        self.N = int(N)
        if perm is None:
            perm = rcm_ordering(rows, cols, N)
        perm = np.asarray(perm, dtype=np.int64)
        iperm = np.empty(N, dtype=np.int64)
        iperm[perm] = np.arange(N)
        pr, pc = iperm[rows], iperm[cols]

        if nparts <= 0:
            # balance p·b³ (blocks) against (p·w)³ (separator): with b = N/p
            # and interface width w = permuted bandwidth, the total flop count
            # N³/p² + p³w³ is minimized near p = (N/w)^(3/5).
            W = max(1, int(np.abs(pr - pc).max(initial=0)))
            nparts = int(np.clip(round((N / W) ** 0.6), 1, 64))
        # chunk the permuted positions contiguously
        bounds = np.linspace(0, N, nparts + 1).astype(np.int64)
        chunk = np.searchsorted(bounds[1:], np.arange(N), side="right")

        # separator: later endpoint of every chunk-crossing edge
        in_sep = np.zeros(N, dtype=bool)
        cross = chunk[pr] != chunk[pc]
        in_sep[np.maximum(pr[cross], pc[cross])] = True

        self.p = int(nparts)
        owner = np.where(in_sep, self.p, chunk)          # permuted coords
        sizes = np.bincount(owner, minlength=self.p + 1)
        self.ns = int(sizes[self.p])
        bmax = int(sizes[: self.p].max(initial=1))
        # round the block size up so the batched LDLᵀ needs no internal pad
        self.ldl_block = min(ldl_block, max(8, bmax))
        self.bmax = -(-bmax // self.ldl_block) * self.ldl_block
        self.sizes = sizes[: self.p]

        # local index of each permuted vertex within its owner
        local = np.zeros(N, dtype=np.int64)
        for k in range(self.p + 1):
            sel = owner == k
            local[sel] = np.arange(int(sel.sum()))
        self._owner, self._local = owner, local
        self.perm, self.iperm = perm, iperm

        p_, bmax_, ns = self.p, self.bmax, self.ns
        self._base1 = p_ * bmax_ * bmax_
        self._base2 = self._base1 + p_ * max(ns, 1) * bmax_
        self.flat_size = self._base2 + max(ns, 1) * max(ns, 1)

        # identity padding for block locals beyond the true size
        pads = [
            (k * bmax_ + i) * bmax_ + i
            for k in range(p_)
            for i in range(int(sizes[k]), bmax_)
        ]
        self.pad_idx = np.asarray(pads, dtype=np.int64)
        self.pad_total = len(pads)

        # gather/scatter geometry for solves: original vertex -> slot in the
        # concatenated [p·bmax block layout | separator] vector
        slot = np.where(
            owner == self.p,
            p_ * bmax_ + local,
            owner * bmax_ + local,
        )
        vert_slot_perm = slot                              # permuted coords
        self.vert_slot = np.empty(N, dtype=np.int64)
        self.vert_slot[perm] = vert_slot_perm              # original coords
        # inverse: slot -> original vertex (padded slots -> N, reads a zero)
        src = np.full(p_ * bmax_ + self.ns, N, dtype=np.int64)
        src[vert_slot_perm] = perm
        self.slot_src = src

    def map(self, rows, cols) -> np.ndarray:
        """Flat indices into the concatenated assembly buffer for COO
        coordinates in the ORIGINAL ordering (one record per unordered
        pair)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        pr, pc = self.iperm[rows], self.iperm[cols]
        o_r, o_c = self._owner[pr], self._owner[pc]
        l_r, l_c = self._local[pr], self._local[pc]
        bmax, ns, p_ = self.bmax, self.ns, self.p

        both_blk = (o_r == o_c) & (o_r < p_)
        both_sep = (o_r == p_) & (o_c == p_)
        assert (both_blk | both_sep | (o_r != o_c)).all()
        cross_ok = both_blk | both_sep | ((o_r == p_) ^ (o_c == p_))
        assert cross_ok.all(), "edge between two distinct blocks"

        # same block: lower (hi, lo) of the local pair
        hi = np.maximum(l_r, l_c)
        lo = np.minimum(l_r, l_c)
        idx_blk = (o_r * bmax + hi) * bmax + lo
        # block-separator coupling: C[k, sep_local, blk_local]
        k_ = np.where(o_r == p_, o_c, o_r)
        sep_l = np.where(o_r == p_, l_r, l_c)
        blk_l = np.where(o_r == p_, l_c, l_r)
        idx_cpl = self._base1 + (k_ * max(ns, 1) + sep_l) * bmax + blk_l
        # separator block: lower (hi, lo)
        idx_sep = self._base2 + hi * max(ns, 1) + lo

        flat = np.where(both_blk, idx_blk, np.where(both_sep, idx_sep, idx_cpl))
        return flat.astype(np.int32)

    # -- assembly ------------------------------------------------------------

    def assemble(
        self, flat_idx: jax.Array, vals: jax.Array, sorted_indices: bool = False
    ):
        """One fused scatter-add -> (Ablk, C, Asep) with symmetric blocks."""
        p_, bmax, ns = self.p, self.bmax, self.ns
        flat = jnp.zeros((self.flat_size,), vals.dtype)
        flat = flat.at[flat_idx].add(vals, indices_are_sorted=sorted_indices)
        if self.pad_total:
            flat = flat.at[jnp.asarray(self.pad_idx)].add(1.0)
        Ablk = flat[: self._base1].reshape(p_, bmax, bmax)
        C = flat[self._base1 : self._base2].reshape(p_, max(ns, 1), bmax)
        Asep = flat[self._base2 :].reshape(max(ns, 1), max(ns, 1))
        eye_b = jnp.eye(bmax, dtype=vals.dtype)
        Ablk = Ablk + jnp.swapaxes(Ablk, 1, 2) * (1.0 - eye_b)
        eye_s = jnp.eye(max(ns, 1), dtype=vals.dtype)
        Asep = Asep + Asep.T * (1.0 - eye_s)
        if ns == 0:
            C = jnp.zeros((p_, 0, bmax), vals.dtype)
            Asep = jnp.zeros((0, 0), vals.dtype)
        return Ablk, C, Asep

    def zero_factor(self, dtype) -> ArrowFactor:
        p_, bmax, ns = self.p, self.bmax, self.ns
        snp = max(1, -(-max(ns, 1) // self.ldl_block) * self.ldl_block)
        return ArrowFactor(
            Lb=jnp.zeros((p_, bmax, bmax), dtype),
            db=jnp.ones((p_, bmax), dtype),
            C=jnp.zeros((p_, ns, bmax), dtype),
            X=jnp.zeros((p_, bmax, ns), dtype),
            sL=jnp.zeros((snp, snp), dtype),
            sd=jnp.ones((snp,), dtype),
        )


def arrow_factorize(struct: ArrowStructure, Ablk, C, Asep) -> ArrowFactor:
    """Batched block factorization + dense separator Schur complement."""
    blk = struct.ldl_block

    def fac1(A):
        f = ldlt_factorize(A, block=blk)
        return f.L, f.d

    Lb, db = jax.vmap(fac1)(Ablk)                       # ONE batched LDLᵀ
    db_div = jnp.where(jnp.abs(db) <= ZERO_PIVOT_TOL, jnp.inf, db)
    if struct.ns > 0:
        Ct = jnp.swapaxes(C, 1, 2)                      # (p, bmax, ns)
        Z = solve_triangular(Lb, Ct, lower=True, unit_diagonal=True)
        X = solve_triangular(
            jnp.swapaxes(Lb, 1, 2),
            Z / db_div[:, :, None],
            lower=False,
            unit_diagonal=True,
        )                                               # Aₖ⁻¹ Cₖᵀ
        S = Asep - jnp.einsum("pib,pbj->ij", C, X)      # Schur reduce (MXU)
        sfac = ldlt_factorize(S.astype(Ablk.dtype), block=blk)
        sL, sd = sfac.L, sfac.d
    else:
        X = jnp.zeros((struct.p, struct.bmax, 0), Ablk.dtype)
        sL = jnp.zeros((struct.ldl_block, struct.ldl_block), Ablk.dtype)
        sd = jnp.ones((struct.ldl_block,), Ablk.dtype)
    return ArrowFactor(Lb=Lb, db=db, C=C, X=X, sL=sL, sd=sd)


def _blk_solve(f: ArrowFactor, b):
    """Batched Aₖ⁻¹ b over the block axis; ``b``: (p, bmax, k)."""
    z = solve_triangular(f.Lb, b, lower=True, unit_diagonal=True)
    db_div = jnp.where(jnp.abs(f.db) <= ZERO_PIVOT_TOL, jnp.inf, f.db)
    w = z / db_div[:, :, None]
    return solve_triangular(
        jnp.swapaxes(f.Lb, 1, 2), w, lower=False, unit_diagonal=True
    )


def arrow_solve(struct: ArrowStructure, f: ArrowFactor, rhs: jax.Array):
    """Solve in ORIGINAL coordinates; ``rhs``: (N,) or (N, k)."""
    p_, bmax, ns, N = struct.p, struct.bmax, struct.ns, struct.N
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    k = r.shape[1]
    rpad = jnp.concatenate([r, jnp.zeros((1, k), r.dtype)], axis=0)
    slots = rpad[jnp.asarray(struct.slot_src)]          # gather to arrow layout
    xb = slots[: p_ * bmax].reshape(p_, bmax, k)
    u = _blk_solve(f, xb)                               # (p, bmax, k)
    if ns > 0:
        bs = slots[p_ * bmax :]
        rhs_s = bs - jnp.einsum("pib,pbk->ik", f.C, u)
        xs = ldlt_solve(_sep_factor(struct, f), rhs_s)
        xk = u - jnp.einsum("pbj,jk->pbk", f.X, xs)
    else:
        xs = jnp.zeros((0, k), r.dtype)
        xk = u
    flat = jnp.concatenate([xk.reshape(p_ * bmax, k), xs], axis=0)
    out = flat[jnp.asarray(struct.vert_slot)]
    return out[:, 0] if squeeze else out


def _sep_factor(struct: ArrowStructure, f: ArrowFactor):
    from .ldlt import LDLFactor

    return LDLFactor(L=f.sL, d=f.sd, n=struct.ns)


def arrow_inertia(struct: ArrowStructure, f: ArrowFactor) -> Tuple:
    """(pos, zero, neg) by Haynsworth additivity: block pivots + separator
    pivots, identity padding removed."""
    finite = jnp.isfinite(f.db)
    pos_b = jnp.sum((f.db > ZERO_PIVOT_TOL) & finite) - struct.pad_total
    neg_b = jnp.sum((f.db < -ZERO_PIVOT_TOL) & finite)
    pos_s, _, neg_s = ldlt_inertia(_sep_factor(struct, f))
    pos = pos_b + pos_s
    neg = neg_b + neg_s
    zero = struct.N - pos - neg
    return pos, zero, neg
