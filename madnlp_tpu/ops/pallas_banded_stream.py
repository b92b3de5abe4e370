"""Streaming Pallas kernels for the block-banded LDLᵀ — band in HBM, a
rolling window of ``bw+1`` block-columns in VMEM.

The whole-band-in-VMEM kernels (ops/pallas_banded.py) cap out near
case1354 scale (scoped VMEM ≈ 4× band bytes).  Here the band stays in HBM
(`pl.ANY`) and the kernel DMAs one block-column at a time into a VMEM
window scratch: the working set is ``(bw+1)²·b²`` bytes (≈0.6 MB at
bw=5, b=64) regardless of N — case9241 and beyond factorize in one fused
kernel.  A column's trailing updates only ever touch the next ``bw``
columns, which is exactly the window invariant:

    when column j is factored, columns j..j+bw are VMEM-resident and
    fully updated by all columns < j; after j is written back, its slot
    is reloaded with column j+bw+1.

DMAs are issued per column and waited synchronously — a column's compute
(two MXU GEMMs + a b-step pivot recursion) dwarfs the ~100 KB copies.

Design rules (round-2):

  * the factorize loop is statically UNROLLED over the ``bw+1`` window
    slots (a ``fori_loop`` over column *groups*), so every VMEM window
    slice is at a static offset — Mosaic's best-tested addressing path,
    and the loop-carried memory dependence is provable rather than
    assumed;
  * the solve sweeps carry the active ``bw·b``-lane window as a
    ``fori_loop`` *value* (SSA — no memory hazard at all); every VMEM
    output region is written exactly once, and no kernel memory is read
    after being written at a dynamic offset within the same loop;
  * VMEM-resident outputs keep their small axis on SUBLANES: the pivot
    diagonal is stored ``(nb, b)`` (b lanes) and multi-RHS solves run
    transposed ``(k, N)``, because a ``(N, 1)``/``(N, k)`` layout pads
    every row to 128 lanes (11.7 MB at N = 22k — scoped-VMEM OOM, the
    round-1 nb=5000 failure).

Postmortem note (kept so nobody re-chases it): what round 1 logged as an
on-chip "Mosaic miscompile at ``bw·b ≥ 384``" was the unit-test matrix
going INDEFINITE at that bandwidth (fixed diag 3 vs 0.1-scale off-diag
mass) — unpivoted LDLᵀ growth then amplifies any f32 reordering into
O(1) factor differences.  benchmarks/tpu_pallas_check.py now builds
strictly diagonally dominant systems and both kernels match XLA exactly
at every geometry, on chip and in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import BandedFactor, BandStructure
from .ldlt import ZERO_PIVOT_TOL
from .pallas_banded import _ldlt_with_inverse


def _stream_factorize_kernel(
    band_hbm, out_hbm, invl_hbm, d_ref, win, invl_s, sem, *, nb, b, bw, panel
):
    stride = (bw + 1) * b
    nslots = bw + 1
    ngroups = -(-nb // nslots)
    # tail rows (columns nb..nb+bw-1 are band padding, never factored):
    # a STATIC disjoint write — the per-column rows below are written
    # exactly once each, so no dynamic-offset write-after-write exists
    d_ref[nb:, :] = jnp.ones((bw, b), d_ref.dtype)
    tri = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) > (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )
    eye_b = (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )

    def load(col, s):
        # col is traced (HBM offsets may be dynamic — DMA engines handle
        # that); s is a PYTHON int so the VMEM-side offset is static.
        cp = pltpu.make_async_copy(
            band_hbm.at[pl.ds(col * jnp.int32(stride), stride), :],
            win.at[pl.ds(s * stride, stride), :],
            sem,
        )
        cp.start()
        cp.wait()

    # preload columns 0..bw into slots 0..bw
    for s in range(nslots):
        load(jnp.int32(s), s)

    def group(g, _):
        base = g * jnp.int32(nslots)
        # static unroll over the window slots: column base+s lives in
        # slot s for every group, so all win[] slices below are static
        for s in range(nslots):
            col = base + jnp.int32(s)

            @pl.when(col < jnp.int32(nb))
            def _(s=s, col=col):
                srow = s * stride
                Akk = win[srow : srow + b, :]
                LD, invLkk = _ldlt_with_inverse(Akk, b, panel)
                Lkk = jnp.where(tri, LD, 0.0) + eye_b.astype(LD.dtype)
                # diagonal as a LANE-oriented row (1, b): the d output is
                # stored (nbp, b) so its footprint is b lanes, not a
                # (nbp*b, 1) column padded to 128 lanes (a VMEM bomb at
                # N ~ 20k)
                dk_row = jnp.sum(
                    jnp.where(eye_b, LD, 0.0), axis=0, keepdims=True
                )
                dk_div_row = jnp.where(
                    jnp.abs(dk_row) <= ZERO_PIVOT_TOL, jnp.inf, dk_row
                )

                P = win[srow + b : srow + stride, :]
                X = jnp.dot(P, invLkk.T, preferred_element_type=P.dtype)
                Lcol = X / dk_div_row
                G = jnp.dot(Lcol, X.T, preferred_element_type=P.dtype)

                for l in range(1, bw + 1):
                    trow = ((s + l) % nslots) * stride
                    rows_cnt = (bw + 1 - l) * b
                    upd = G[
                        (l - 1) * b : (l - 1 + (bw + 1 - l)) * b,
                        (l - 1) * b : l * b,
                    ]
                    cur = win[trow : trow + rows_cnt, :]
                    win[trow : trow + rows_cnt, :] = cur - upd

                diag_part = jnp.where(tri, Lkk, 0.0) + dk_row * eye_b.astype(
                    LD.dtype
                )
                win[srow : srow + b, :] = diag_part
                win[srow + b : srow + stride, :] = Lcol
                invl_s[:, :] = invLkk
                d_ref[pl.ds(col, 1), :] = dk_row

                # write back the factored column + its diag-block inverse
                out_cp = pltpu.make_async_copy(
                    win.at[pl.ds(s * stride, stride), :],
                    out_hbm.at[pl.ds(col * jnp.int32(stride), stride), :],
                    sem,
                )
                out_cp.start()
                out_cp.wait()
                inv_cp = pltpu.make_async_copy(
                    invl_s, invl_hbm.at[pl.ds(col * jnp.int32(b), b), :], sem
                )
                inv_cp.start()
                inv_cp.wait()

                # reload the freed slot with column col+bw+1
                nxt = col + jnp.int32(nslots)

                @pl.when(nxt < jnp.int32(nb + bw))
                def _():
                    load(nxt, s)

        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(ngroups), group, jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("nb", "b", "bw", "interpret", "panel"))
def _stream_factorize_call(band2d, nb, b, bw, interpret=False, panel=32):
    nbp = nb + bw
    stride = (bw + 1) * b
    out, invl, d = pl.pallas_call(
        functools.partial(
            _stream_factorize_kernel, nb=nb, b=b, bw=bw, panel=panel),
        out_shape=(
            jax.ShapeDtypeStruct(band2d.shape, band2d.dtype),
            jax.ShapeDtypeStruct((nbp * b, b), band2d.dtype),
            jax.ShapeDtypeStruct((nbp, b), band2d.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(((bw + 1) * stride, b), band2d.dtype),
            pltpu.VMEM((b, b), band2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(band2d)
    return out, invl, d


def pallas_banded_factorize_stream(
    struct: BandStructure, band: jax.Array, interpret: bool = False,
    panel: int = 32,
) -> BandedFactor:
    """Streaming drop-in for ``banded.banded_factorize``.  ``panel`` is the
    corner width of the panel-blocked diagonal factorization
    (pallas_banded._ldlt_with_inverse); 0 selects the scalar fallback."""
    nb, b, bw, nbp = struct.nb, struct.b, struct.bw, struct.nbp
    band2d = band.reshape(nbp * (bw + 1) * b, b)
    out, invl, d = _stream_factorize_call(
        band2d, nb, b, bw, interpret=interpret, panel=panel)
    return BandedFactor(
        band=out.reshape(nbp, bw + 1, b, b),
        invL=invl.reshape(nbp, b, b),
        d=d.reshape(nbp * b)[: nb * b],
    )


def _stream_solve_kernel(
    band_hbm, invl_hbm, rhs_ref, out_ref, zbuf, colbuf, invbuf, sem,
    *, nb, b, bw, k
):
    """Transposed-RHS layout: the solution lives in VMEM as (k, N) — k on
    SUBLANES, N on lanes — so a multi-RHS solve costs k/8 of a sublane
    tile instead of padding every RHS column to 128 lanes (the (N, k)
    layout costs N*128*4 bytes of VMEM for ANY k ≤ 128: 11.7 MB at
    N = 22k, which OOMs scoped VMEM — the round-1 nb=5000 failure).

    Hazard-free dataflow (see module docstring): both sweeps carry the
    active window as a fori_loop VALUE; ``zbuf``/``out_ref`` are each
    written exactly once per lane region and ``zbuf`` is only read by the
    backward sweep (a different, sequenced loop)."""
    stride = (bw + 1) * b
    eye_b = (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )

    def load_col(j):
        cp = pltpu.make_async_copy(
            band_hbm.at[pl.ds(j * jnp.int32(stride), stride), :], colbuf, sem
        )
        cp.start()
        cp.wait()
        ci = pltpu.make_async_copy(
            invl_hbm.at[pl.ds(j * jnp.int32(b), b), :], invbuf, sem
        )
        ci.start()
        ci.wait()

    def diag_div():
        # the factor column's diagonal block carries d_j on its diagonal
        dk_row = jnp.sum(
            jnp.where(eye_b, colbuf[0:b, :], 0.0), axis=0, keepdims=True
        )
        return jnp.where(jnp.abs(dk_row) <= ZERO_PIVOT_TOL, jnp.inf, dk_row)

    # forward sweep: W carries the partially-updated rhs for columns
    # j..j+bw (the only lanes a banded L touches ahead of the pivot)
    def fwd(j, W):
        load_col(j)
        rj = W[:, :b]                                            # (k, b)
        zj = jnp.dot(rj, invbuf[:, :].T, preferred_element_type=rj.dtype)
        Pj = colbuf[b:stride, :]                                 # (bw*b, b)
        rest = W[:, b:] - jnp.dot(zj, Pj.T, preferred_element_type=rj.dtype)
        # fuse the D^{-1} step: z_j is final after step j
        zbuf[:, pl.ds(j * jnp.int32(b), b)] = zj / diag_div()
        # shift in the rhs of column j+bw+1 (clamped: the final
        # iterations' shifted-in lanes are never consumed)
        nxt_col = jnp.minimum(
            j + jnp.int32(bw + 1), jnp.int32(nb + bw - 1)
        )
        nxt = rhs_ref[:, pl.ds(nxt_col * jnp.int32(b), b)]
        return jnp.concatenate([rest, nxt], axis=1)

    W0 = rhs_ref[:, 0:stride]
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), fwd, W0)

    # backward sweep: X carries x for columns j+1..j+bw (nearest first)
    def bwd(t, X):
        j = jnp.int32(nb - 1) - t
        load_col(j)
        Pj = colbuf[b:stride, :]
        wj = zbuf[:, pl.ds(j * jnp.int32(b), b)]                 # (k, b)
        tj = wj - jnp.dot(X, Pj, preferred_element_type=wj.dtype)
        xj = jnp.dot(tj, invbuf[:, :], preferred_element_type=wj.dtype)
        out_ref[:, pl.ds(j * jnp.int32(b), b)] = xj
        if bw > 1:
            return jnp.concatenate([xj, X[:, : (bw - 1) * b]], axis=1)
        return xj

    X0 = jnp.zeros((k, bw * b), rhs_ref.dtype)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), bwd, X0)

    # the padding lanes (columns nb..nb+bw-1) are never written above and
    # never read by the host slice; zero them once, statically
    out_ref[:, nb * b :] = jnp.zeros((k, bw * b), rhs_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nb", "b", "bw", "k", "interpret"))
def _stream_solve_call(band2d, invl2d, rhs_t, nb, b, bw, k, interpret=False):
    stride = (bw + 1) * b
    return pl.pallas_call(
        functools.partial(_stream_solve_kernel, nb=nb, b=b, bw=bw, k=k),
        out_shape=jax.ShapeDtypeStruct(rhs_t.shape, rhs_t.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(rhs_t.shape, rhs_t.dtype),
            pltpu.VMEM((stride, b), rhs_t.dtype),
            pltpu.VMEM((b, b), rhs_t.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(band2d, invl2d, rhs_t)


def pallas_banded_solve_stream(
    struct: BandStructure, f: BandedFactor, rhs: jax.Array,
    interpret: bool = False,
):
    """Streaming drop-in for ``banded.banded_solve`` (permuted rhs)."""
    nb, b, bw, nbp, N = struct.nb, struct.b, struct.bw, struct.nbp, struct.N
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    k = r.shape[1]
    kp = max(8, -(-k // 8) * 8)
    work = jnp.zeros((kp, nbp * b), r.dtype).at[:k, :N].set(r.T)
    band2d = f.band.reshape(nbp * (bw + 1) * b, b)
    invl2d = f.invL.reshape(nbp * b, b)
    out = _stream_solve_call(
        band2d, invl2d, work, nb, b, bw, kp, interpret=interpret
    )
    x = out[:k, :N].T
    return x[:, 0] if squeeze else x
