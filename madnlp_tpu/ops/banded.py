"""Block-banded LDLᵀ — the TPU-native *sparse* direct factorization.

TPU equivalent of the reference's sparse symmetric solvers (MUMPS
``/root/reference/src/LinearSolvers/mumps.jl``, HSL ma27/ma57, cuDSS):
instead of porting a multifrontal method (pointer-chasing supernode DAGs —
hostile to XLA's static-shape model), the KKT pattern is permuted with
reverse Cuthill–McKee to concentrate it inside a narrow band, and the factor
is computed by a *block-banded* right-looking LDLᵀ:

* storage: only the band blocks, ``(nb + bw, bw + 1, b, b)`` with
  ``Bnd[j, k]`` = dense block ``(j + k, j)`` of the permuted matrix — O(N·w)
  memory instead of O(N²);
* numeric loop: one ``lax.fori_loop`` over block columns; per step the
  O(w²·b) work is two MXU GEMMs (panel ``X = P·L⁻ᵀ`` and trailing
  ``G = (X D⁻¹)·Xᵀ``) on fully static shapes;
* banded structure is closed under (unpivoted) elimination, so the symbolic
  phase is just the bandwidth — no elimination tree, no fill-in maps;
* pivots are handled exactly like the dense blocked LDLᵀ (``ops/ldlt.py``):
  no pivoting, near-zero pivots skipped and surfaced through the inertia so
  the IPM's δ-regularization ladder reacts (reference:
  src/IPM/solver.jl:611-670).

Cost: ``O(N·w²)`` flops / ``O(N·w)`` memory with ``w = (bw+1)·b`` the block
bandwidth — vs ``O(N³)`` / ``O(N²)`` dense; for RCM-ordered network problems
(ACOPF) ``w ≪ N``.

Assembly from COO value arrays is one fused scatter-add through a
*precomputed flat index map* (host-side numpy, :class:`BandStructure`) —
the same static-map trick the whole sparse path uses (reference analogue:
``coo_to_csc`` + ``transfer!``, src/matrixtools.jl:55-137).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from .ldlt import ZERO_PIVOT_TOL, _ldlt_unblocked


class BandedFactor(NamedTuple):
    """Factor payload: L (unit block-lower, band layout) + D + per-column
    inverted diagonal blocks (so backsolves are pure mat-vecs)."""

    band: jax.Array    # (nb+bw, bw+1, b, b): [j,0]=tril(L_jj,-1)+diag(d_j), [j,k]=L_{j+k,j}
    invL: jax.Array    # (nb+bw, b, b) inverses of the unit-lower diagonal blocks
    d: jax.Array       # (nb*b,) pivots (padded tail entries = 1)


def rcm_ordering(rows: np.ndarray, cols: np.ndarray, N: int) -> np.ndarray:
    """Reverse Cuthill–McKee on the symmetrized pattern; returns ``perm``
    with ``K_perm[i, j] = K[perm[i], perm[j]]``."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    data = np.ones(2 * len(rows) + N)
    r = np.concatenate([rows, cols, np.arange(N)])
    c = np.concatenate([cols, rows, np.arange(N)])
    A = sp.csr_matrix((data, (r, c)), shape=(N, N))
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True), dtype=np.int64)


def kkt_interleaved_ordering(
    hess_rows, hess_cols, jac_rows, jac_cols, nw: int, m: int
) -> np.ndarray:
    """Quasidefinite-preserving band ordering for the augmented KKT
    ``[W+Σ Jᵀ; J -δI]``: RCM over the *primal* connectivity (Hessian
    pattern + JᵀJ cliques), with each dual row inserted immediately after
    the last primal variable its constraint touches.

    Plain RCM over the full saddle-point pattern interleaves primal
    (positive-pivot) and dual (zero/negative-diagonal) rows arbitrarily —
    unpivoted LDLᵀ then meets singular leading minors and breaks down in
    f32.  Placing each constraint row *after* all of its variables means
    that by the time it is eliminated its diagonal has already received its
    full (negative) Schur contribution ``-Σᵢ Jₖᵢ²/(W+Σ)ᵢᵢ`` — the
    elimination is locally the quasidefinite order, which is stable without
    pivoting (Vanderbei; same reasoning as the reference's default
    tie-breaking orderings for ma57/MUMPS on KKT systems)."""
    from ..native import jtdj_pair_map

    jac_rows = np.asarray(jac_rows, dtype=np.int64)
    jac_cols = np.asarray(jac_cols, dtype=np.int64)
    pr, pc, _, _, _ = jtdj_pair_map(jac_rows, jac_cols, m)
    rows = np.concatenate([np.asarray(hess_rows, dtype=np.int64), pr])
    cols = np.concatenate([np.asarray(hess_cols, dtype=np.int64), pc])
    prim_perm = rcm_ordering(rows, cols, nw)
    prim_pos = np.empty(nw, dtype=np.int64)
    prim_pos[prim_perm] = np.arange(nw)
    con_pos = np.zeros(m, dtype=np.int64)
    np.maximum.at(con_pos, jac_rows, prim_pos[jac_cols])
    # stable interleave: primal var at position t gets key 2t, constraint k
    # key 2·con_pos[k]+1 (i.e. right after its last variable)
    keys = np.concatenate([2 * prim_pos, 2 * con_pos + 1])
    return np.argsort(keys, kind="stable").astype(np.int64)


class BandStructure:
    """Host-side symbolic phase: ordering + band geometry + the
    COO → flat-band scatter map."""

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        N: int,
        block: int,
        perm: np.ndarray = None,
    ):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        self.N = int(N)
        self.b = int(block)
        if perm is None:
            perm = rcm_ordering(rows, cols, N)
        perm = np.asarray(perm, dtype=np.int64)
        iperm = np.empty(N, dtype=np.int64)
        iperm[perm] = np.arange(N)
        self.perm = perm          # K_perm[i, j] = K[perm[i], perm[j]]
        self.iperm = iperm
        pr = iperm[rows]
        pc = iperm[cols]
        W = int(np.abs(pr - pc).max(initial=0))  # scalar bandwidth
        self.W = W
        b = self.b
        self.bw = max(1, -(-W // b)) if W > 0 else 1
        self.nb = max(1, -(-N // b))
        self.nbp = self.nb + self.bw
        self.flat_size = self.nbp * (self.bw + 1) * b * b
        # identity padding on the scalar tail of the last real block
        pad = np.arange(N, self.nb * b, dtype=np.int64)
        self.pad_idx = self._map_permuted(pad - 0, pad - 0, permuted=True) \
            if len(pad) else np.zeros(0, np.int32)

    def _map_permuted(self, pr, pc, permuted=True):
        lo = np.minimum(pr, pc)
        hi = np.maximum(pr, pc)
        b, bw = self.b, self.bw
        j = lo // b
        k = hi // b - j
        assert (k <= bw).all(), "entry outside the block band"
        flat = ((j * (bw + 1) + k) * b + (hi - (j + k) * b)) * b + (lo - j * b)
        return flat.astype(np.int32)

    def map(self, rows, cols) -> np.ndarray:
        """Flat band indices for (lower-or-upper) COO coordinates in the
        ORIGINAL ordering.  Symmetric duplicates must not be passed twice."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        return self._map_permuted(self.iperm[rows], self.iperm[cols])

    def zero_factor(self, dtype) -> BandedFactor:
        b, bw, nb, nbp = self.b, self.bw, self.nb, self.nbp
        return BandedFactor(
            band=jnp.zeros((nbp, bw + 1, b, b), dtype),
            invL=jnp.zeros((nbp, b, b), dtype),
            d=jnp.ones((nb * b,), dtype),
        )

    # -- assembly ----------------------------------------------------------

    def assemble(
        self, flat_idx: jax.Array, vals: jax.Array, dtype,
        sorted_indices: bool = False,
    ) -> jax.Array:
        """Scatter COO values (plus identity padding) into band storage."""
        b, bw, nbp = self.b, self.bw, self.nbp
        flat = jnp.zeros((self.flat_size,), vals.dtype)
        flat = flat.at[flat_idx].add(vals, indices_are_sorted=sorted_indices)
        if len(self.pad_idx):
            flat = flat.at[jnp.asarray(self.pad_idx)].add(1.0)
        return flat.reshape(nbp, bw + 1, b, b).astype(dtype)

    def gather_assembly(self, flat_idx: np.ndarray) -> "BandRowAssembly":
        """Row-cohort assembly for the given static map — see
        :class:`BandRowAssembly`."""
        idx = np.concatenate([np.asarray(flat_idx, np.int64), self.pad_idx])
        return BandRowAssembly(
            idx, self.flat_size, (self.nbp, self.bw + 1, self.b, self.b),
            n_pad_ones=len(self.pad_idx),
        )


class BandRowAssembly:
    """Static COO→storage assembly built from ROW-granular ops.

    On-chip primitive costs (measured, TPU v5e over PJRT, f64):
    scalar scatter-add ≈ 0.17 µs/element and scalar gather ≈ 13 ns/element
    — both essentially serial — while ROW (lane-width) gathers run at
    ~31 ns/row and unique row scatters at ~0.13 µs/row.  The flagship
    nb=600 band assembly as a plain sorted scatter-add (≈26k values) was
    4.7 ms of the 5.6 ms build+factorize; a full inverse-map gather over
    the 2.5M-slot storage was even worse (35 ms).  This class keeps every
    output-sized operation row-granular:

    1. contributors are grouped host-side by destination row (lane-width
       chunks of the flat storage) and padded into per-row slots — split
       into TWO cohorts by contributor count so the padding waste of the
       few dense rows (K up to ~26) doesn't inflate the many sparse ones;
    2. values land in their lanes via an iota==lane one-hot masked sum
       (pure VPU, duplicates accumulate in f64 through the K-axis sum);
    3. the finished rows are placed by ONE unique sorted row scatter.

    The only scalar-irregular op left is the (Rows, K) contributor gather
    (~50k elements after cohorting ≈ 0.7 ms); everything else vectorizes.
    Identity-padding entries ride along as constant 1.0 contributors.
    """

    def __init__(self, idx: np.ndarray, flat_size: int, shape,
                 n_pad_ones: int = 0):
        idx = np.asarray(idx, dtype=np.int64)
        b = int(shape[-1])
        assert flat_size % b == 0
        self.n_pad_ones = n_pad_ones
        self.shape = shape
        self.b = b
        self.n_rows_total = flat_size // b
        zero_slot = len(idx)  # ext value array appends [pad ones..., 0]

        row_id = idx // b
        lane = idx % b
        order = np.argsort(row_id, kind="stable")
        rows_sorted = row_id[order]
        uniq, start, counts = np.unique(
            rows_sorted, return_index=True, return_counts=True
        )

        # two-cohort split minimizing total padded-gather size
        kmax = int(counts.max(initial=1))
        ks = np.unique(counts)
        best, k1 = None, kmax
        for cand in ks:
            nA = int((counts <= cand).sum())
            cost = nA * cand + (len(counts) - nA) * kmax
            if best is None or cost < best:
                best, k1 = cost, int(cand)
        in_a = counts <= k1

        def build(sel, K):
            rows = uniq[sel]
            st = start[sel]
            ct = counts[sel]
            gidx = np.full((len(rows), K), zero_slot, dtype=np.int64)
            lidx = np.zeros((len(rows), K), dtype=np.int64)
            for k in range(K):
                has = ct > k
                gidx[has, k] = order[st[has] + k]
                lidx[has, k] = lane[order[st[has] + k]]
            return rows, gidx, lidx

        rows_a, gidx_a, lidx_a = build(in_a, k1)
        rows_b, gidx_b, lidx_b = build(~in_a, kmax)
        # placement by row-GATHER (31 ns/row) instead of row-scatter
        # (0.13 µs/row): inverse map full row -> compact row (+zero row)
        all_rows = np.concatenate([rows_a, rows_b])
        n_occ = len(all_rows)
        inv_rows = np.full(self.n_rows_total, n_occ, dtype=np.int64)
        inv_rows[all_rows] = np.arange(n_occ)
        self._inv_rows = jnp.asarray(inv_rows)
        self._gidx_a = jnp.asarray(gidx_a)
        self._lidx_a = jnp.asarray(lidx_a)
        self._gidx_b = jnp.asarray(gidx_b)
        self._lidx_b = jnp.asarray(lidx_b)
        self._n_a = len(rows_a)

    def _rows(self, ext, gidx, lidx):
        if gidx.shape[0] == 0:
            return jnp.zeros((0, self.b), ext.dtype)
        cv = ext[gidx]                                    # (R, K) gather
        onehot = jnp.arange(self.b)[None, None, :] == lidx[:, :, None]
        return jnp.sum(
            jnp.where(onehot, cv[:, :, None], jnp.zeros((), ext.dtype)),
            axis=1,
        )

    def __call__(self, vals: jax.Array, dtype) -> jax.Array:
        ext = jnp.concatenate([
            vals,
            jnp.ones((self.n_pad_ones,), vals.dtype),
            jnp.zeros((1,), vals.dtype),
        ])
        rows = jnp.concatenate([
            self._rows(ext, self._gidx_a, self._lidx_a),
            self._rows(ext, self._gidx_b, self._lidx_b),
            jnp.zeros((1, self.b), vals.dtype),   # unoccupied rows
        ])
        flat = rows[self._inv_rows]
        return flat.reshape(self.shape).astype(dtype)


def banded_factorize(struct: BandStructure, band: jax.Array) -> BandedFactor:
    """Right-looking block-banded LDLᵀ; ``band`` from ``struct.assemble``."""
    b, bw, nb = struct.b, struct.bw, struct.nb
    dtype = band.dtype
    eye_b = jnp.eye(b, dtype=dtype)

    # static scatter geometry of the trailing update: target column j+l
    # (l=1..bw), diagonal m gets block (j+l+m, j+l) = G-block [a=l+m-1, c=l-1]
    l_idx = np.arange(1, bw + 1)[:, None]            # (bw, 1)
    m_idx = np.arange(0, bw + 1)[None, :]            # (1, bw+1)
    a_idx = np.clip(l_idx + m_idx - 1, 0, bw - 1)
    c_idx = np.broadcast_to(l_idx - 1, a_idx.shape)
    msk = (m_idx <= bw - l_idx)
    A_IDX = jnp.asarray(a_idx)
    C_IDX = jnp.asarray(c_idx)
    MSK = jnp.asarray(msk[..., None, None])

    def body(j, carry):
        Bnd, invL, d = carry
        col = jax.lax.dynamic_slice(
            Bnd, (j, 0, 0, 0), (1, bw + 1, b, b)
        )[0]
        Lkk, dk = _ldlt_unblocked(col[0])
        invLkk = solve_triangular(Lkk, eye_b, lower=True, unit_diagonal=True)
        dk_div = jnp.where(jnp.abs(dk) <= ZERO_PIVOT_TOL, jnp.inf, dk)
        P = col[1:].reshape(bw * b, b)
        X = P @ invLkk.T                              # (bw·b, b) MXU
        Lcol = X / dk_div[None, :]
        G = Lcol @ X.T                                # (bw·b, bw·b) MXU
        G4 = G.reshape(bw, b, bw, b).transpose(0, 2, 1, 3)
        Upd = jnp.where(MSK, G4[A_IDX, C_IDX], 0.0)   # (bw, bw+1, b, b)
        S = jax.lax.dynamic_slice(Bnd, (j + 1, 0, 0, 0), (bw, bw + 1, b, b))
        Bnd = jax.lax.dynamic_update_slice(Bnd, S - Upd, (j + 1, 0, 0, 0))
        LD = jnp.tril(Lkk, -1) + jnp.diag(dk)
        colout = jnp.concatenate([LD[None], Lcol.reshape(bw, b, b)], axis=0)
        Bnd = jax.lax.dynamic_update_slice(Bnd, colout[None], (j, 0, 0, 0))
        invL = jax.lax.dynamic_update_slice(invL, invLkk[None], (j, 0, 0))
        d = jax.lax.dynamic_update_slice(d, dk, (j * b,))
        return Bnd, invL, d

    invL0 = jnp.zeros((struct.nbp, b, b), dtype)
    d0 = jnp.ones((nb * b,), dtype)
    Bnd, invL, d = jax.lax.fori_loop(0, nb, body, (band, invL0, d0))
    return BandedFactor(band=Bnd, invL=invL, d=d)


def banded_solve(struct: BandStructure, f: BandedFactor, rhs: jax.Array):
    """Solve in PERMUTED coordinates; ``rhs``: (N,) or (N, k)."""
    b, bw, nb, N = struct.b, struct.bw, struct.nb, struct.N
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    k = r.shape[1]
    npad = struct.nbp * b
    work = jnp.zeros((npad, k), r.dtype).at[:N].set(r)

    def fwd(j, carry):
        work, z = carry
        rj = jax.lax.dynamic_slice(work, (j * b, 0), (b, k))
        zj = f.invL[j] @ rj
        Pj = jax.lax.dynamic_slice(f.band, (j, 1, 0, 0), (1, bw, b, b))[0]
        Pj = Pj.reshape(bw * b, b)
        S = jax.lax.dynamic_slice(work, ((j + 1) * b, 0), (bw * b, k))
        work = jax.lax.dynamic_update_slice(work, S - Pj @ zj, ((j + 1) * b, 0))
        z = jax.lax.dynamic_update_slice(z, zj, (j * b, 0))
        return work, z

    _, z = jax.lax.fori_loop(0, nb, fwd, (work, jnp.zeros_like(work)))
    d_div = jnp.where(jnp.abs(f.d) <= ZERO_PIVOT_TOL, jnp.inf, f.d)
    x = z.at[: nb * b].set(z[: nb * b] / d_div[:, None])

    def bwd(t, x):
        j = nb - 1 - t
        Pj = jax.lax.dynamic_slice(f.band, (j, 1, 0, 0), (1, bw, b, b))[0]
        Pj = Pj.reshape(bw * b, b)
        xs = jax.lax.dynamic_slice(x, ((j + 1) * b, 0), (bw * b, k))
        wj = jax.lax.dynamic_slice(x, (j * b, 0), (b, k))
        xj = f.invL[j].T @ (wj - Pj.T @ xs)
        return jax.lax.dynamic_update_slice(x, xj, (j * b, 0))

    x = jax.lax.fori_loop(0, nb, bwd, x)
    x = x[:N]
    return x[:, 0] if squeeze else x


def banded_inertia(struct: BandStructure, f: BandedFactor) -> Tuple:
    """(pos, zero, neg) from the pivot signs, padding removed."""
    pad = struct.nb * struct.b - struct.N
    finite = jnp.isfinite(f.d)
    pos = jnp.sum((f.d > ZERO_PIVOT_TOL) & finite) - pad
    neg = jnp.sum((f.d < -ZERO_PIVOT_TOL) & finite)
    zero = struct.N - pos - neg
    return pos, zero, neg


def banded_symmetrize(struct: BandStructure, band: jax.Array) -> jax.Array:
    """Complete the (lower-stored) diagonal blocks to full symmetric — the
    operator form consumed by :func:`banded_symv`."""
    b0 = band[:, 0]
    eye = jnp.eye(struct.b, dtype=band.dtype)
    full = b0 + jnp.swapaxes(b0, 1, 2) * (1.0 - eye)
    return band.at[:, 0].set(full)


def banded_symv(struct: BandStructure, band_sym: jax.Array, x: jax.Array):
    """Symmetric block-banded mat-vec ``y = K·x`` in PERMUTED coordinates —
    batched (nbp, b, b)×(nbp, b) einsums over the ``bw+1`` block diagonals
    with *static* shift-slices: no gathers/scatters anywhere (this is the
    iterative-refinement operator's fast path on TPU, where scatter-adds
    serialize).  ``x``: (N,)."""
    b, bw, nbp, N = struct.b, struct.bw, struct.nbp, struct.N
    xb = jnp.zeros((nbp * b,), x.dtype).at[:N].set(x).reshape(nbp, b)
    y = jnp.einsum("jab,jb->ja", band_sym[:, 0], xb)
    for k in range(1, bw + 1):
        lower = jnp.einsum("jab,jb->ja", band_sym[: nbp - k, k], xb[: nbp - k])
        y = y.at[k:].add(lower)                       # block (j+k, j) · x_j
        upper = jnp.einsum("jba,jb->ja", band_sym[: nbp - k, k], xb[k:])
        y = y.at[: nbp - k].add(upper)                # block (j, j+k)ᵀ · x_{j+k}
    return y.reshape(-1)[:N]


def ruiz_band(struct: BandStructure, band_sym: jax.Array, sweeps: int = 3):
    """Ruiz equilibration computed directly on the (symmetrized) band —
    static-slice max-reductions only, no scatters.  Returns the scaling in
    PERMUTED block layout, shape (nbp, b).

    Structurally-zero rows (the band's ``bw`` all-zero overflow blocks)
    keep d = 1: iterating d ← d/√(row-norm) on a zero row diverges, and on
    TPU — where f64 is emulated as double-word f32 with f32's exponent
    range (~1e38) — the diverged scaling overflows to inf and 0·inf = NaN
    poisons the trailing blocks of the factorization."""
    b, bw, nbp = struct.b, struct.bw, struct.nbp
    d = jnp.ones((nbp, b), band_sym.dtype)
    for _ in range(sweeps):
        a0 = jnp.abs(band_sym[:, 0]) * d[:, :, None] * d[:, None, :]
        rn = jnp.max(a0, axis=2)
        for k in range(1, bw + 1):
            ak = (
                jnp.abs(band_sym[: nbp - k, k])
                * d[k:, :, None]
                * d[: nbp - k, None, :]
            )
            rn = rn.at[k:].max(jnp.max(ak, axis=2))
            rn = rn.at[: nbp - k].max(jnp.max(ak, axis=1))
        d = jnp.where(rn > 0.0, d / jnp.sqrt(jnp.maximum(rn, 1e-32)), 1.0)
    return d


def scale_band(struct: BandStructure, band: jax.Array, d: jax.Array):
    """Congruence scaling D·K·D applied to (lower-stored) band storage;
    ``d``: (nbp, b) permuted scaling from :func:`ruiz_band`."""
    b, bw, nbp = struct.b, struct.bw, struct.nbp
    dpad = jnp.concatenate([d, jnp.ones((bw, b), d.dtype)], axis=0)
    cols = [
        band[:, k] * dpad[k : k + nbp, :, None] * d[:, None, :]
        for k in range(bw + 1)
    ]
    return jnp.stack(cols, axis=1)


def ruiz_coo(vals, rows_j, cols_j, N: int, sweeps: int = 3,
             row_map=None, col_map=None):
    """Ruiz equilibration vector from lower-COO values (symmetric pattern
    implied): d such that D K D has ~unit row inf-norms.  ``row_map`` /
    ``col_map`` are optional (gather_order, sorted_targets) pairs enabling
    the sorted-scatter fast path on TPU."""
    d = jnp.ones((N,), vals.dtype)
    for _ in range(sweeps):
        v = jnp.abs(vals) * d[rows_j] * d[cols_j]
        rn = jnp.zeros((N,), vals.dtype)
        if row_map is not None:
            ro, rs = row_map
            co, cs = col_map
            rn = rn.at[rs].max(v[ro], indices_are_sorted=True)
            rn = rn.at[cs].max(v[co], indices_are_sorted=True)
        else:
            rn = rn.at[rows_j].max(v).at[cols_j].max(v)
        # zero rows keep d = 1 (see ruiz_band: TPU f64 range is ~f32)
        d = jnp.where(rn > 0.0, d / jnp.sqrt(jnp.maximum(rn, 1e-32)), 1.0)
    return d
