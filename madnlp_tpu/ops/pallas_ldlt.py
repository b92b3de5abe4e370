"""Pallas TPU kernel: whole-matrix blocked LDLᵀ factorization in VMEM.

The XLA implementation (`ops/ldlt.py`) is a rolled `fori_loop` whose every
step round-trips the working matrix through HBM and pays HLO-loop
scheduling overhead.  For KKT matrices that fit VMEM (N ≤ 1024 in f32 —
which covers the per-iteration factorizations of case118-class condensed /
augmented systems and all Schur scenario blocks), this kernel performs the
entire factorization **in one `pallas_call`**: the matrix stays resident in
VMEM, the diagonal-block recursion and the unit-lower inverse are in-kernel
`fori_loop`s, and panel/trailing updates are MXU `jnp.dot`s.

Layout trick: the factor is written back *in place* (input/output aliased):
strict lower triangle = L, diagonal = D.  Zero-pivot handling matches
`ops/ldlt.py` (skip + report via the pivot value).

STATUS — experimental.  Mosaic lowering constraints discovered while
bringing this up (kept here for the next kernel author):
* value-space ``dynamic_slice``/``dynamic_update_slice`` are unsupported →
  one-hot masked reductions over 2-D iota, ref-level ``pl.ds`` for writes;
* int64 anywhere (including x64-mode default index types and fori bounds)
  crashes or recurses the lowering → all loop indices forced int32;
* 0-D scalar reductions inside the kernel crash the compiler → keep (b, 1);
* ``jnp.eye`` in-kernel triggered a layout bitwidth check failure → build
  identities from iota comparisons.
After all of the above the kernel is correct under the interpreter and the
component kernels compile on the TPU, but the fused full-factorization
kernel currently compiles impractically slowly through the remote Mosaic
service — it is therefore not wired into the default solve path yet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .ldlt import ZERO_PIVOT_TOL, LDLFactor

MAX_VMEM_N = 1024  # f32 whole-matrix residency budget


# N.B. Mosaic supports neither value-space `dynamic_slice` nor int64 index
# conversions (x64 mode), so every dynamic row/column access below is a
# one-hot masked reduction over a 2-D iota, and all dynamic ref addressing
# goes through `pl.ds`.


def _unblocked_ldlt(A, block):
    """Value-based (block, block) LDLᵀ: returns strict-lower L plus D on the
    diagonal, in one matrix.  Everything stays ≥2-D (TPU: 0-D scalars are
    not lowerable inside kernels)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)  # (b, 1)

    def body(j, A):
        colj = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1, keepdims=True)
        dj = jnp.sum(jnp.where(ridx == j, colj, 0.0), axis=0, keepdims=True)
        dj_div = jnp.where(jnp.abs(dj) <= ZERO_PIVOT_TOL, jnp.inf, dj)
        lj = jnp.where(ridx > j, colj / dj_div, 0.0)        # (b, 1)
        A = A - dj * (lj * jnp.transpose(lj))
        newcol = jnp.where(ridx > j, lj, colj)
        newcol = jnp.where(ridx == j, dj, newcol)
        A = jnp.where(cols == j, newcol, A)
        return A

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(block), body, A)


def _unit_lower_inverse(L, block):
    """Inverse of a unit lower-triangular (block, block) matrix by forward
    substitution (no triangular_solve primitive inside Mosaic)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)

    def body(j, X):
        # X[j+1:, :] -= L[j+1:, j] * X[j, :]
        colj = jnp.sum(jnp.where(cols == j, L, 0.0), axis=1, keepdims=True)
        colj = jnp.where(ridx > j, colj, 0.0)               # (b, 1)
        rowj = jnp.sum(jnp.where(rows == j, X, 0.0), axis=0, keepdims=True)
        return X - colj * rowj

    X0 = (rows == cols).astype(L.dtype)
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(block), body, X0)


def _ldlt_kernel(a_ref, out_ref, *, nblocks: int, block: int, n: int):
    np_ = nblocks * block
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)   # (N, 1)
    out_ref[:, :] = a_ref[:, :]

    tri = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0) > (
        jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    )

    def outer(k, _):
        kb = k * jnp.int32(block)
        Akk = out_ref[pl.ds(kb, block), pl.ds(kb, block)]
        eye_b = (
            jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        ).astype(Akk.dtype)
        LD = _unblocked_ldlt(Akk, block)
        Lkk = jnp.where(tri, LD, 0.0) + eye_b
        dk = jnp.sum(LD * eye_b, axis=1, keepdims=True)        # (b, 1)
        invLkk = _unit_lower_inverse(Lkk, block)
        dk_div = jnp.where(jnp.abs(dk) <= ZERO_PIVOT_TOL, jnp.inf, dk)

        col = out_ref[:, pl.ds(kb, block)]                # (N, b)
        X = jnp.dot(col, invLkk.T, preferred_element_type=col.dtype)
        below = rows2 >= kb + block                        # (N, 1)
        Xm = jnp.where(below, X, 0.0)
        Lcol = Xm / jnp.transpose(dk_div)
        # trailing update only touches the [below, below] region
        out_ref[:, :] = out_ref[:, :] - jnp.dot(
            Lcol, Xm.T, preferred_element_type=col.dtype
        )
        # write the factored block column: zeros above, panel below …
        out_ref[:, pl.ds(kb, block)] = Lcol
        # … and the L·D-combined block on the diagonal (ref-level dynamic
        # addressing via pl.ds)
        diag_part = jnp.where(tri, Lkk, 0.0) + dk * eye_b
        out_ref[pl.ds(kb, block), pl.ds(kb, block)] = diag_part
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nblocks), outer, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_ldlt(A: jax.Array, block: int = 128, interpret: bool = False):
    """Factorize symmetric A (N ≤ MAX_VMEM_N); returns :class:`LDLFactor`."""
    n = A.shape[0]
    nb = max(1, -(-n // block))
    np_ = nb * block
    if np_ != n:
        pad = np_ - n
        A = jnp.block(
            [
                [A, jnp.zeros((n, pad), A.dtype)],
                [jnp.zeros((pad, n), A.dtype), jnp.eye(pad, dtype=A.dtype)],
            ]
        )
    out = pl.pallas_call(
        functools.partial(_ldlt_kernel, nblocks=nb, block=block, n=n),
        out_shape=jax.ShapeDtypeStruct((np_, np_), A.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(A)
    d = jnp.diagonal(out)
    L = jnp.tril(out, k=-1) + jnp.eye(np_, dtype=A.dtype)
    return LDLFactor(L=L, d=d, n=n)
