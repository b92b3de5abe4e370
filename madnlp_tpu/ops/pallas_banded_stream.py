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
    band_hbm, out_hbm, invl_hbm, d_ref, win, invl_s, sem, *, nb, b, bw
):
    stride = (bw + 1) * b
    nslots = bw + 1
    d_ref[:, :] = jnp.ones_like(d_ref)
    tri = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) > (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )
    eye_b = (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )

    def load(col, slot):
        # slot may be a Python int (preload); under x64 a bare int lowers to
        # an i64 index, which Mosaic's memref_slice rejects — force i32
        cp = pltpu.make_async_copy(
            band_hbm.at[pl.ds(col * jnp.int32(stride), stride), :],
            win.at[jnp.int32(slot)],
            sem,
        )
        cp.start()
        cp.wait()

    # preload columns 0..bw
    for s in range(nslots):
        load(jnp.int32(s), s)

    def outer(j, _):
        slot = jax.lax.rem(j, jnp.int32(nslots))
        Akk = win[slot, pl.ds(0, b), :]
        LD, invLkk = _ldlt_with_inverse(Akk, b)
        Lkk = jnp.where(tri, LD, 0.0) + eye_b.astype(LD.dtype)
        dk = jnp.sum(jnp.where(eye_b, LD, 0.0), axis=1, keepdims=True)
        dk_div = jnp.where(jnp.abs(dk) <= ZERO_PIVOT_TOL, jnp.inf, dk)

        P = win[slot, pl.ds(b, bw * b), :]
        X = jnp.dot(P, invLkk.T, preferred_element_type=P.dtype)
        Lcol = X / jnp.transpose(dk_div)
        G = jnp.dot(Lcol, X.T, preferred_element_type=P.dtype)

        for l in range(1, bw + 1):
            slot_t = jax.lax.rem(j + jnp.int32(l), jnp.int32(nslots))
            rows_cnt = (bw + 1 - l) * b
            upd = G[(l - 1) * b : (l - 1 + (bw + 1 - l)) * b, (l - 1) * b : l * b]
            cur = win[slot_t, pl.ds(0, rows_cnt), :]
            win[slot_t, pl.ds(0, rows_cnt), :] = cur - upd

        diag_part = jnp.where(tri, Lkk, 0.0) + dk * eye_b.astype(LD.dtype)
        win[slot, pl.ds(0, b), :] = diag_part
        win[slot, pl.ds(b, bw * b), :] = Lcol
        invl_s[:, :] = invLkk
        d_ref[pl.ds(j * jnp.int32(b), b), :] = dk

        # write back the factored column + its diag-block inverse
        out_cp = pltpu.make_async_copy(
            win.at[slot], out_hbm.at[pl.ds(j * jnp.int32(stride), stride), :],
            sem,
        )
        out_cp.start()
        out_cp.wait()
        inv_cp = pltpu.make_async_copy(
            invl_s, invl_hbm.at[pl.ds(j * jnp.int32(b), b), :], sem
        )
        inv_cp.start()
        inv_cp.wait()

        # reload the freed slot with column j+bw+1
        jn = j + jnp.int32(nslots)

        @pl.when(jn < jnp.int32(nb + bw))
        def _():
            load(jn, slot)

        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), outer, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("nb", "b", "bw", "interpret"))
def _stream_factorize_call(band2d, nb, b, bw, interpret=False):
    nbp = nb + bw
    stride = (bw + 1) * b
    out, invl, d = pl.pallas_call(
        functools.partial(_stream_factorize_kernel, nb=nb, b=b, bw=bw),
        out_shape=(
            jax.ShapeDtypeStruct(band2d.shape, band2d.dtype),
            jax.ShapeDtypeStruct((nbp * b, b), band2d.dtype),
            jax.ShapeDtypeStruct((nbp * b, 1), band2d.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bw + 1, stride, b), band2d.dtype),
            pltpu.VMEM((b, b), band2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(band2d)
    return out, invl, d


def pallas_banded_factorize_stream(
    struct: BandStructure, band: jax.Array, interpret: bool = False
) -> BandedFactor:
    """Streaming drop-in for ``banded.banded_factorize``."""
    nb, b, bw, nbp = struct.nb, struct.b, struct.bw, struct.nbp
    band2d = band.reshape(nbp * (bw + 1) * b, b)
    out, invl, d = _stream_factorize_call(band2d, nb, b, bw, interpret=interpret)
    return BandedFactor(
        band=out.reshape(nbp, bw + 1, b, b),
        invL=invl.reshape(nbp, b, b),
        d=d[: nb * b, 0],
    )


def _stream_solve_kernel(
    band_hbm, invl_hbm, d_ref, rhs_ref, out_ref, colbuf, invbuf, sem,
    *, nb, b, bw, k
):
    stride = (bw + 1) * b
    out_ref[:, :] = rhs_ref[:, :]

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

    def fwd(j, _):
        load_col(j)
        rj = out_ref[pl.ds(j * jnp.int32(b), b), :]
        zj = jnp.dot(invbuf[:, :], rj, preferred_element_type=rj.dtype)
        Pj = colbuf[pl.ds(b, bw * b), :]
        upd = jnp.dot(Pj, zj, preferred_element_type=rj.dtype)
        cur = out_ref[pl.ds((j + 1) * jnp.int32(b), bw * b), :]
        out_ref[pl.ds((j + 1) * jnp.int32(b), bw * b), :] = cur - upd
        out_ref[pl.ds(j * jnp.int32(b), b), :] = zj
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), fwd, jnp.int32(0))

    dvals = d_ref[pl.ds(0, nb * b), :]
    d_div = jnp.where(jnp.abs(dvals) <= ZERO_PIVOT_TOL, jnp.inf, dvals)
    zs = out_ref[pl.ds(0, nb * b), :]
    out_ref[pl.ds(0, nb * b), :] = zs / d_div

    def bwd(t, _):
        j = jnp.int32(nb - 1) - t
        load_col(j)
        Pj = colbuf[pl.ds(b, bw * b), :]
        xs = out_ref[pl.ds((j + 1) * jnp.int32(b), bw * b), :]
        wj = out_ref[pl.ds(j * jnp.int32(b), b), :]
        tj = wj - jnp.dot(Pj.T, xs, preferred_element_type=wj.dtype)
        out_ref[pl.ds(j * jnp.int32(b), b), :] = jnp.dot(
            invbuf[:, :].T, tj, preferred_element_type=wj.dtype
        )
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), bwd, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("nb", "b", "bw", "k", "interpret"))
def _stream_solve_call(band2d, invl2d, d2d, rhs, nb, b, bw, k, interpret=False):
    stride = (bw + 1) * b
    return pl.pallas_call(
        functools.partial(_stream_solve_kernel, nb=nb, b=b, bw=bw, k=k),
        out_shape=jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((stride, b), rhs.dtype),
            pltpu.VMEM((b, b), rhs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(band2d, invl2d, d2d, rhs)


def pallas_banded_solve_stream(
    struct: BandStructure, f: BandedFactor, rhs: jax.Array,
    interpret: bool = False,
):
    """Streaming drop-in for ``banded.banded_solve`` (permuted rhs)."""
    nb, b, bw, nbp, N = struct.nb, struct.b, struct.bw, struct.nbp, struct.N
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    k = r.shape[1]
    kp = max(8, -(-k // 8) * 8) if k < 128 else -(-k // 128) * 128
    work = jnp.zeros((nbp * b, kp), r.dtype).at[:N, :k].set(r)
    band2d = f.band.reshape(nbp * (bw + 1) * b, b)
    invl2d = f.invL.reshape(nbp * b, b)
    d2d = jnp.zeros((nbp * b, 1), f.d.dtype).at[: nb * b, 0].set(f.d)
    out = _stream_solve_call(
        band2d, invl2d, d2d, work, nb, b, bw, kp, interpret=interpret
    )
    x = out[:N, :k]
    return x[:, 0] if squeeze else x
