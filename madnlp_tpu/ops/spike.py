"""Partitioned block-banded LDLᵀ — SPIKE/nested-dissection over the band.

The plain block-banded LDLᵀ (``ops/banded.py``) retires its N pivots in
one sequential chain, which makes the factorization *latency*-bound on
TPU (~2-5% MFU, docs/benchmarks.md "roofline"): per block-column the MXU
GEMMs are fast, but the chain length is the wall.  This module cuts the
chain by partitioning the band into ``P`` independent interiors plus a
small scattered separator (the TPU analogue of cuDSS *uniform batching*
of independent work, reference
``/root/reference/lib/MadNLPGPU/ext/MadNLPGPUCUDAExt/cudss.jl:139-148``):

* interiors are factored by ONE ``vmap``-ed run of the existing banded
  kernel — sequential depth ``~N/P`` instead of ``N``;
* spikes ``X_j = A_j⁻¹ E_j`` (``E_j`` = the coupling columns of interior
  ``j`` into its two adjacent separator groups) come from one vmapped
  multi-RHS banded solve;
* the separator Schur complement
  ``R = blkdiag(D_g) − Σ_j E_jᵀ X_j`` is block-tridiagonal in groups and
  factored by the same banded kernel (depth ``Σ_g s_g``);
* inertia is exact by Haynsworth additivity:
  ``In(K) = Σ_j In(A_j) + In(R)`` — same argument as ``ops/blockarrow.py``.

**Stability — separator closure.**  The quasidefinite-interleaved
ordering (ops/banded.py:kkt_interleaved_ordering) is stable *because*
every dual row is eliminated after ALL of its variables, so its diagonal
carries full Schur mass.  A naive contiguous cut breaks this: a dual row
just right of a cut whose variables sit left of it would be eliminated
with only partial (possibly ~0) mass — measured 1e-15 pivots and 1e14
element growth, and no "clean" contiguous cut exists in real ACOPF
patterns (every block boundary is straddled by some (variable, dual)
pair).  The fix is the nested-dissection one, done row-wise:

1. for every entry crossing a cut, move the LATER endpoint into that
   cut's separator group (the ``ops/blockarrow.py`` rule);
2. **closure**: move every dual row one of whose variables was moved in
   step 1 (dual rows only reference primal columns, so one pass reaches
   the fixpoint).

Both passes preserve the global elimination order inside interiors and
groups, so every dual row — interior or separator — is again eliminated
after all of its variables.  Measured group sizes on ACOPF bands are
small (s_g ≈ 100-200 ≪ w): the band is sparse inside, so few rows
actually cross a cut, and the extra spike flops stay ~3× the base
factorize — the right trade on a latency-bound kernel.  Backsolves get
the same depth cut: vmapped interior sweeps + the short reduced sweep.

Symbolic phase: host-side numpy at construction; assembly from COO
values is one fused sorted scatter-add through a precomputed flat map
(same static-map discipline as the banded/condensed paths).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .banded import (
    BandedFactor,
    banded_factorize,
    banded_solve,
)
from .ldlt import ZERO_PIVOT_TOL


@dataclasses.dataclass(frozen=True)
class _BandGeom:
    """Minimal geometry duck-typing BandStructure for the numeric kernels."""

    N: int
    b: int
    bw: int
    nb: int
    nbp: int


class SpikeFactor(NamedTuple):
    F: BandedFactor   # stacked (P, ...) interior factors
    X: jax.Array      # (P, Ni, 2*sp) spikes A_j⁻¹ E_j
    E: jax.Array      # (P, Ni, 2*sp) coupling columns (for rhs reduction)
    R: BandedFactor   # separator factor (block-banded layout)


class SpikeStructure:
    """Host-side symbolic phase: partition + closure + flat scatter map.

    ``rows/cols``: lower-COO pattern in ORIGINAL coordinates (one record
    per unordered symmetric pair).  ``perm`` is the locality ordering
    (quasidefinite-interleaved for KKT systems).  ``dual_idx``: original
    indices of the dual rows (empty for plain symmetric systems — the
    closure pass is then a no-op).
    """

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        N: int,
        perm: np.ndarray,
        block: int,
        nparts: int = 0,
        dual_idx: np.ndarray = None,
    ):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        perm = np.asarray(perm, dtype=np.int64)
        iperm = np.empty(N, dtype=np.int64)
        iperm[perm] = np.arange(N)
        self.N, self.b = int(N), int(block)
        self.perm, self.iperm = perm, iperm
        b = self.b

        pr, pc = iperm[rows], iperm[cols]
        hi, lo = np.maximum(pr, pc), np.minimum(pr, pc)
        W = int((hi - lo).max(initial=1))
        self.W = W

        if nparts <= 0:
            nparts = int(np.clip(round(np.sqrt(N / max(W, 1))), 2, 16))
        # interiors must be wide enough that adjacent separator groups
        # (members within [cut, cut+2W)) never couple
        nparts = int(min(nparts, max(2, N // (4 * W))))
        P = nparts
        assert P >= 2, f"band too short to partition (N={N}, W={W})"
        cuts = [round(g * N / P) for g in range(1, P)]

        # step 1: crossing rows -> separator group of their cut
        group = np.full(N, -1, dtype=np.int64)
        for g, cut in enumerate(cuts):
            cross = (lo < cut) & (hi >= cut)
            group[np.unique(hi[cross])] = g
        # step 2 (closure): dual rows referencing a moved variable
        if dual_idx is not None and len(dual_idx):
            is_dual = np.zeros(N, dtype=bool)
            is_dual[iperm[np.asarray(dual_idx, dtype=np.int64)]] = True
            need = is_dual[hi] & (group[lo] >= 0) & (group[hi] < 0)
            np.maximum.at(group, hi[need], group[lo[need]])

        # validate: no coupling between distinct groups
        gh, gl = group[hi], group[lo]
        both = (gh >= 0) & (gl >= 0)
        assert (gh[both] == gl[both]).all(), (
            "adjacent separator groups couple — interiors too narrow"
        )

        # interior membership: between consecutive cuts, minus moved rows
        bounds = np.asarray([0] + cuts + [N])
        interior_of = np.searchsorted(bounds[1:], np.arange(N), side="right")
        owner = np.where(group >= 0, -1, interior_of)  # -1 = separator

        self.P = P
        sg = np.bincount(group[group >= 0], minlength=P - 1)
        self.sg = sg
        self.sp = int(-(-max(int(sg.max(initial=1)), 1) // b) * b)  # padded
        ni = np.bincount(owner[owner >= 0], minlength=P)
        self.ni = ni
        self.nbi = int(-(-int(ni.max()) // b))        # interior blocks (padded)
        self.Ni = self.nbi * b

        # local indices (order-preserving within interior / group)
        local = np.zeros(N, dtype=np.int64)
        for j in range(P):
            sel = owner == j
            local[sel] = np.arange(int(sel.sum()))
        glocal = np.zeros(N, dtype=np.int64)
        for g in range(P - 1):
            sel = group == g
            glocal[sel] = np.arange(int(sel.sum()))
        self._owner, self._group = owner, group
        self._local, self._glocal = local, glocal

        # interior block bandwidth (exact over interior entries)
        ii = (owner[hi] >= 0) & (owner[lo] >= 0)
        bwi = 1
        if ii.any():
            bwi = max(1, int((local[hi[ii]] // b - local[lo[ii]] // b).max()))
        self.bwi = bwi
        self.geom_i = _BandGeom(N=self.Ni, b=b, bw=bwi, nb=self.nbi,
                                nbp=self.nbi + bwi)

        # head/tail coupling windows (entries interior-col x separator)
        mixed = (owner[hi] >= 0) ^ (owner[lo] >= 0)
        c_pos = np.where(owner[hi] >= 0, hi, lo)       # interior endpoint
        s_pos = np.where(owner[hi] >= 0, lo, hi)       # separator endpoint
        c_pos, s_pos = c_pos[mixed], s_pos[mixed]
        c_own = owner[c_pos]
        s_grp = group[s_pos]
        assert ((s_grp == c_own - 1) | (s_grp == c_own)).all(), (
            "coupling to a non-adjacent separator group"
        )
        headside = s_grp == c_own - 1                  # left group
        hw = 1
        if headside.any():
            hw = int(local[c_pos[headside]].max()) + 1
        tw = 1
        if (~headside).any():
            tail = ~headside
            tw = int((ni[c_own[tail]] - local[c_pos[tail]]).max())
        self.hw = min(self.Ni, int(-(-hw // b) * b))
        self.tw = min(self.Ni, int(-(-tw // b) * b))
        # per-interior start row of the tail window (clamped for small
        # interiors; map and factorize must agree on this offset)
        self._tail_off = np.maximum(ni - self.tw, 0)

        # reduced (separator) geometry: (P-1) groups padded to sp, b-blocks
        nbr = (P - 1) * (self.sp // b)
        bwr = max(1, min(2 * (self.sp // b), max(nbr - 1, 1)))
        self.geom_r = _BandGeom(N=nbr * b, b=b, bw=bwr, nb=nbr, nbp=nbr + bwr)

        # ---- flat scatter map ------------------------------------------
        # segments: [interior bands | E_head | E_tail | separator diag]
        sp = self.sp
        segA = P * self.nbi * (bwi + 1) * b * b
        segB = P * self.hw * sp
        segC = P * self.tw * sp
        segD = (P - 1) * sp * sp
        self._offB, self._offC, self._offD = segA, segA + segB, segA + segB + segC
        self.flat_size = segA + segB + segC + segD

        # identity padding: interior locals beyond ni[j], group locals
        # beyond sg[g]
        pads = []
        for j in range(P):
            for i in range(int(ni[j]), self.Ni):
                jb, r = divmod(i, b)
                pads.append(
                    (((j * self.nbi + jb) * (bwi + 1) + 0) * b + r) * b + r
                )
        for g in range(P - 1):
            for i in range(int(sg[g]), sp):
                pads.append(self._offD + (g * sp + i) * sp + i)
        self.pad_idx = np.asarray(pads, dtype=np.int64)
        self.pad = len(pads)

        # slot maps for gather/scatter solves (PERMUTED coordinates):
        # layout [P·Ni interior slots | (P-1)·sp separator slots]
        slot = np.where(
            owner >= 0,
            owner * self.Ni + local,
            P * self.Ni + np.maximum(group, 0) * sp + glocal,
        )
        self.vert_slot = slot                          # permuted -> slot
        src = np.full(P * self.Ni + (P - 1) * sp, N, dtype=np.int64)
        src[slot] = np.arange(N)
        self.slot_src = src                            # slot -> permuted (N=pad)

    # -- COO -> flat map ---------------------------------------------------

    def map(self, rows, cols) -> np.ndarray:
        """Flat indices for COO coordinates in ORIGINAL ordering (one
        record per unordered symmetric pair)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        pr, pc = self.iperm[rows], self.iperm[cols]
        hi, lo = np.maximum(pr, pc), np.minimum(pr, pc)
        owner, group = self._owner, self._group
        local, glocal = self._local, self._glocal
        b, bwi, sp = self.b, self.bwi, self.sp

        o_h, o_l = owner[hi], owner[lo]
        both_int = (o_h >= 0) & (o_l >= 0)
        both_sep = (o_h < 0) & (o_l < 0)
        mixed = ~both_int & ~both_sep

        # interior band entry
        lh, ll = local[hi], local[lo]
        jb = ll // b
        k = lh // b - jb
        idx_int = (
            (((np.maximum(o_h, 0) * self.nbi + jb) * (bwi + 1) + k) * b
             + (lh - (jb + k) * b)) * b + (ll - jb * b)
        )

        # separator diagonal entry (lower: glocal hi >= glocal lo)
        g = np.maximum(group[hi], 0)
        ghl, gll = glocal[hi], glocal[lo]
        g_hi = np.maximum(ghl, gll)
        g_lo = np.minimum(ghl, gll)
        idx_sep = self._offD + (g * sp + g_hi) * sp + g_lo

        # coupling entry
        c_pos = np.where(o_h >= 0, hi, lo)
        s_pos = np.where(o_h >= 0, lo, hi)
        j = owner[c_pos]
        sg_ = group[s_pos]
        headside = sg_ == j - 1
        # head: E_head[j, local(c), glocal(s)]
        idx_head = self._offB + (np.maximum(j, 0) * self.hw + local[c_pos]) * sp \
            + glocal[s_pos]
        # tail: E_tail[j, local(c) - tail_off_j, glocal(s)]
        trow = local[c_pos] - self._tail_off[np.maximum(j, 0)]
        idx_tail = self._offC + (np.maximum(j, 0) * self.tw + np.maximum(trow, 0)) * sp \
            + glocal[s_pos]
        if mixed.any():
            assert (local[c_pos[mixed & headside]] < self.hw).all()
            assert (trow[mixed & ~headside] >= 0).all()
        idx_cpl = np.where(headside, idx_head, idx_tail)

        flat = np.where(both_int, idx_int, np.where(both_sep, idx_sep, idx_cpl))
        return flat.astype(np.int64)

    # -- assembly ----------------------------------------------------------

    def assemble(self, flat_idx: jax.Array, vals: jax.Array, dtype,
                 sorted_indices: bool = False):
        """One fused scatter-add -> (bands, Ehead, Etail, Dsep)."""
        P, b, bwi, sp = self.P, self.b, self.bwi, self.sp
        flat = jnp.zeros((self.flat_size,), vals.dtype)
        flat = flat.at[flat_idx].add(vals, indices_are_sorted=sorted_indices)
        if self.pad:
            flat = flat.at[jnp.asarray(self.pad_idx)].add(1.0)
        bands = flat[: self._offB].reshape(P, self.nbi, bwi + 1, b, b)
        Ehead = flat[self._offB : self._offC].reshape(P, self.hw, sp)
        Etail = flat[self._offC : self._offD].reshape(P, self.tw, sp)
        Dsep = flat[self._offD :].reshape(P - 1, sp, sp)
        return (bands.astype(dtype), Ehead.astype(dtype),
                Etail.astype(dtype), Dsep.astype(dtype))

    def zero_factor(self, dtype) -> SpikeFactor:
        P, b, sp = self.P, self.b, self.sp
        gi, gr = self.geom_i, self.geom_r
        Fz = BandedFactor(
            band=jnp.zeros((P, gi.nbp, gi.bw + 1, b, b), dtype),
            invL=jnp.zeros((P, gi.nbp, b, b), dtype),
            d=jnp.ones((P, gi.nb * b), dtype),
        )
        Rz = BandedFactor(
            band=jnp.zeros((gr.nbp, gr.bw + 1, b, b), dtype),
            invL=jnp.zeros((gr.nbp, b, b), dtype),
            d=jnp.ones((gr.nb * b,), dtype),
        )
        return SpikeFactor(
            F=Fz,
            X=jnp.zeros((P, self.Ni, 2 * sp), dtype),
            E=jnp.zeros((P, self.Ni, 2 * sp), dtype),
            R=Rz,
        )


def _dense_to_band(geom_r: _BandGeom, R: jax.Array) -> jax.Array:
    """Lower-banded storage of the dense reduced matrix (static slices)."""
    b, bw, nb, nbp = geom_r.b, geom_r.bw, geom_r.nb, geom_r.nbp
    out = jnp.zeros((nbp, bw + 1, b, b), R.dtype)
    for j in range(nb):
        for k in range(bw + 1):
            if j + k < nb:
                blk = R[(j + k) * b : (j + k + 1) * b, j * b : (j + 1) * b]
                out = out.at[j, k].set(blk)
    return out


def _band_overflow(geom: _BandGeom, bands: jax.Array) -> jax.Array:
    """Append the bw zero overflow block-rows the banded kernel expects."""
    P = bands.shape[0]
    pad = jnp.zeros((P, geom.bw, geom.bw + 1, geom.b, geom.b), bands.dtype)
    return jnp.concatenate([bands, pad], axis=1)


def spike_factorize(struct: SpikeStructure, bufs) -> SpikeFactor:
    """Partitioned factorization from ``struct.assemble`` buffers."""
    bands, Ehead, Etail, Dsep = bufs
    P, sp, Ni = struct.P, struct.sp, struct.Ni
    dt = bands.dtype

    # 1) ONE vmapped banded factorization over the P interiors
    A = _band_overflow(struct.geom_i, bands)
    F = jax.vmap(lambda Aj: banded_factorize(struct.geom_i, Aj))(A)

    # 2) coupling columns E_j = [left group j-1 | right group j]
    E = jnp.zeros((P, Ni, 2 * sp), dt)
    E = E.at[:, : struct.hw, :sp].set(Ehead)
    for j in range(P):
        off = int(struct._tail_off[j])
        E = E.at[j, off : off + struct.tw, sp:].set(Etail[j])

    # 3) spikes X_j = A_j⁻¹ E_j — one vmapped multi-RHS banded solve
    X = jax.vmap(lambda fj, e: banded_solve(struct.geom_i, fj, e))(F, E)

    # 4) separator system R = blkdiag(D_g) − Σ_j E_jᵀ X_j (block-tridiag
    # in groups); E is row-sparse, so the products use only the head/tail
    # windows
    nsep = P - 1
    Rd = jnp.zeros((nsep * sp, nsep * sp), dt)
    for g in range(nsep):
        Rd = Rd.at[g * sp : (g + 1) * sp, g * sp : (g + 1) * sp].set(Dsep[g])
    Xh = X[:, : struct.hw]                       # (P, hw, 2sp)
    Xt = jnp.stack([
        X[j, int(struct._tail_off[j]) : int(struct._tail_off[j]) + struct.tw]
        for j in range(P)
    ])                                           # (P, tw, 2sp)
    T = (
        jnp.einsum("phs,phv->psv", Ehead, Xh[:, :, :])
        .astype(dt)
    )
    # T above covers only the LEFT columns of E; complete with the tail
    Tfull = jnp.zeros((P, 2 * sp, 2 * sp), dt)
    Tfull = Tfull.at[:, :sp, :].set(T)
    Tt = jnp.einsum("pts,ptv->psv", Etail, Xt)
    Tfull = Tfull.at[:, sp:, :].add(Tt)
    for j in range(P):
        if j > 0:   # T_LL -> group j-1 diagonal
            g = j - 1
            Rd = Rd.at[g * sp : (g + 1) * sp, g * sp : (g + 1) * sp].add(
                -Tfull[j, :sp, :sp]
            )
        if j < P - 1:  # T_RR -> group j diagonal
            g = j
            Rd = Rd.at[g * sp : (g + 1) * sp, g * sp : (g + 1) * sp].add(
                -Tfull[j, sp:, sp:]
            )
        if 0 < j < P - 1:
            # T_RL -> lower coupling block (group j rows, group j-1 cols)
            Rd = Rd.at[j * sp : (j + 1) * sp, (j - 1) * sp : j * sp].add(
                -Tfull[j, sp:, :sp]
            )
    Rb = _dense_to_band(struct.geom_r, Rd)
    R = banded_factorize(struct.geom_r, Rb)
    return SpikeFactor(F=F, X=X, E=E, R=R)


def spike_solve(struct: SpikeStructure, f: SpikeFactor, rhs: jax.Array):
    """Solve in PERMUTED coordinates; ``rhs``: (N,) or (N, k)."""
    P, sp, Ni = struct.P, struct.sp, struct.Ni
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    k = r.shape[1]
    rpad = jnp.concatenate([r, jnp.zeros((1, k), r.dtype)], axis=0)
    slots = rpad[jnp.asarray(struct.slot_src)]       # gather to slot layout
    rints = slots[: P * Ni].reshape(P, Ni, k)
    rsep = slots[P * Ni :]                           # ((P-1)·sp, k)

    # 1) interior solves (vmapped)
    u = jax.vmap(lambda fj, rj: banded_solve(struct.geom_i, fj, rj))(f.F, rints)

    # 2) reduced rhs: r_s − Σ_j E_jᵀ u_j
    T = jnp.einsum("pnw,pnk->pwk", f.E, u)           # (P, 2sp, k)
    for j in range(P):
        if j > 0:
            rsep = rsep.at[(j - 1) * sp : j * sp].add(-T[j, :sp])
        if j < P - 1:
            rsep = rsep.at[j * sp : (j + 1) * sp].add(-T[j, sp:])

    # 3) separator solve
    xs = banded_solve(struct.geom_r, f.R, rsep)

    # 4) back-substitution x_j = u_j − X_j · x_adj
    zero_sp = jnp.zeros((sp, k), r.dtype)
    xadj = jnp.stack([
        jnp.concatenate([
            xs[(j - 1) * sp : j * sp] if j > 0 else zero_sp,
            xs[j * sp : (j + 1) * sp] if j < P - 1 else zero_sp,
        ])
        for j in range(P)
    ])                                               # (P, 2sp, k)
    x = u - jnp.einsum("pnw,pwk->pnk", f.X, xadj)

    flat = jnp.concatenate([x.reshape(P * Ni, k), xs], axis=0)
    out = flat[jnp.asarray(struct.vert_slot)]
    return out[:, 0] if squeeze else out


def spike_inertia(struct: SpikeStructure, f: SpikeFactor) -> Tuple:
    """(pos, zero, neg) by Haynsworth additivity, identity padding removed
    (all padded pivots are +1)."""
    dF = f.F.d.reshape(-1)
    dR = f.R.d
    finF = jnp.isfinite(dF)
    finR = jnp.isfinite(dR)
    pos = (
        jnp.sum((dF > ZERO_PIVOT_TOL) & finF)
        + jnp.sum((dR > ZERO_PIVOT_TOL) & finR)
        - struct.pad
    )
    neg = (
        jnp.sum((dF < -ZERO_PIVOT_TOL) & finF)
        + jnp.sum((dR < -ZERO_PIVOT_TOL) & finR)
    )
    zero = struct.N - pos - neg
    return pos, zero, neg
