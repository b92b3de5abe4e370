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

DMA schedule (round-3, pipelined — the per-kernel docstrings below are
authoritative): the factorize streams columns through ``bw+2`` rotating
VMEM slots with *asynchronous* start/wait pairs — loads ride under the
diagonal-block panel factorization and writebacks are waited one column
later, every start matched by exactly one wait with clamped HBM indices;
the solve sweeps double-buffer their block loads through 2 slots.

Design rules:

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


def _i(v):
    """int32 index for scratch-ref ``.at[]`` slicing: under jax x64 a bare
    python int traces as i64, which Mosaic's ``tpu.memref_slice`` rejects
    (semaphore/VMEM array indices must be i32)."""
    return jnp.int32(v)


#: Scoped-VMEM limit Mosaic compiles against (bytes).  The streaming
#: factorize kernel's scratch+temporary footprint must fit UNDER this at
#: compile time or `pallas_call` aborts the whole program with
#: "Scoped allocation with size ...M and limit 16.00M" — exactly what
#: BENCH_r04 hit when the case118x4 ring geometry (b=256, bw=4) was
#: benched without a feasibility check (VERDICT r4 weak #1).
VMEM_SCOPED_LIMIT = 16 * 1024 * 1024

#: Headroom factor applied to `stream_factorize_vmem_bytes` when deciding
#: feasibility: the estimate models the declared scratch plus the large
#: live temporaries, but Mosaic's allocator adds alignment padding and
#: keeps some temporaries alive across statements.  Measured calibration:
#: at (b=256, bw=4) the estimate is 18.3 MB vs Mosaic's reported 17.87 MB
#: (estimate ≈ 1.02× actual); 0.95 gives a safe margin both ways.
VMEM_BUDGET_FRACTION = 0.95


def stream_factorize_vmem_bytes(b: int, bw: int, nbp: int = 0,
                                itemsize: int = 4) -> int:
    """Estimated scoped-VMEM footprint (bytes) of the streaming factorize
    kernel at block size ``b`` and block bandwidth ``bw``.

    Terms (cf. `_stream_factorize_call` scratch_shapes and the kernel's
    live temporaries):

    * window scratch  ``(bw+2)·(bw+1)·b²``  — the rotating column slots;
    * inverse scratch ``(bw+2)·b²``;
    * VMEM output ``d``  ``nbp·b``;
    * panel temporaries ``P/X/Lcol``  ``3·bw·b²`` and the trailing-update
      Gram matrix ``G``  ``(bw·b)²`` — the term that blows up for wide
      bands (4.2 MB at bw·b = 1024);
    * diagonal-block temporaries ``Akk/LD/invLkk/Lkk``  ``4·b²`` plus the
      two ``b²`` int32 iota masks.
    """
    win = (bw + 2) * (bw + 1) * b * b
    invl = (bw + 2) * b * b
    d_out = nbp * b
    panels = 3 * bw * b * b
    gram = (bw * b) ** 2
    diag = 4 * b * b
    masks = 2 * b * b  # int32, same 4-byte itemsize as f32
    return (win + invl + d_out + panels + gram + diag) * itemsize + masks * 4


def stream_fits_vmem(b: int, bw: int, nbp: int = 0, itemsize: int = 4) -> bool:
    """True iff the streaming factorize kernel's estimated scratch fits the
    scoped-VMEM budget (with calibration headroom) at this geometry."""
    est = stream_factorize_vmem_bytes(b, bw, nbp, itemsize)
    return est <= VMEM_SCOPED_LIMIT * VMEM_BUDGET_FRACTION


def _stream_factorize_kernel(
    band_hbm, out_hbm, invl_hbm, d_ref, win, invl_s, sem_r, sem_w,
    *, nb, b, bw, panel, batched=False
):
    """Round-3: fully PIPELINED column DMAs over ``bw+2`` rotating slots
    (round 2 used ``bw+1`` slots with synchronous load + writeback per
    column — 3 blocking DMA waits × nb columns of pure latency).

    Schedule per column ``c`` (slot ``s = c mod (bw+2)``, all slot indices
    python ints via the group-unrolled loop):

      1. [D] factor the diagonal block + panel (slot ``s`` resident: its
         load was waited at column ``c−bw``, before any updates hit it);
      2. ``wait_w(s−1)`` (writeback of column ``c−1``, issued one column
         ago — overlapped by [D]) then ``start_r(s−1 ← column c+bw+1)``;
      3. ``wait_r(s−2)`` — the load of column ``c+bw`` issued at column
         ``c−1``, overlapped by a full column of compute;
      4. [U] trailing updates into slots ``σ(c+1..c+bw)`` — the loading
         slot ``σ(c+bw+1) = s−1`` is exactly the one NOT touched, which is
         why the window needs the extra slot;
      5. write the factored column + ``invl_s[s]`` + ``d`` (guarded
         ``c < nb``), then ``start_w(s)`` (waited at column ``c+1``).

    DMA issue/wait pairs are all UNCONDITIONAL with clamped HBM indices so
    semaphore counts are static; overhang steps (``c ≥ nb``) compute
    garbage into dead slots and write back to the band's padding column
    (rows ``≥ nb·stride`` — never consumed downstream: the solve kernel
    guards, and the next factorize re-assembles).  A dummy initial
    writeback of slot ``bw+1`` primes the wait_w chain."""
    stride = (bw + 1) * b
    nslots = bw + 2
    ngroups = -(-nb // nslots)
    pad_col = jnp.int32(nb + bw - 1)     # padding column: garbage sink
    # batch-grid mode (custom_vmap): one grid step per batch element
    # (sequential on the TensorCore — throughput comes from the kernel
    # itself, not lane parallelism); HBM refs are whole stacked arrays
    # (the ANY-space rule) indexed by a per-step row offset, the VMEM d
    # output is grid-blocked per element
    if batched:
        pid = pl.program_id(0)
        boff_band = pid * jnp.int32((nb + bw) * stride)
        boff_invl = pid * jnp.int32((nb + bw) * b)

        def dstore(sl, val):
            d_ref[0, sl, :] = val
    else:
        boff_band = jnp.int32(0)
        boff_invl = jnp.int32(0)

        def dstore(sl, val):
            d_ref[sl, :] = val

    # tail rows (columns nb..nb+bw-1 are band padding, never factored):
    # a STATIC disjoint write — the per-column rows below are written
    # exactly once each, so no dynamic-offset write-after-write exists
    dstore(slice(nb, None), jnp.ones((bw, b), d_ref.dtype))
    tri = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) > (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )
    eye_b = (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )

    def clamp(col):
        return jnp.clip(col, jnp.int32(0), jnp.int32(nb + bw - 1))

    def start_r(col, s):
        # col is traced (HBM offsets may be dynamic — DMA engines handle
        # that); s is a PYTHON int so the VMEM-side offset is static.
        pltpu.make_async_copy(
            band_hbm.at[
                pl.ds(boff_band + clamp(col) * jnp.int32(stride), stride), :
            ],
            win.at[pl.ds(s * stride, stride), :],
            sem_r.at[_i(s)],
        ).start()

    def wait_r(s):
        pltpu.make_async_copy(
            band_hbm.at[pl.ds(boff_band, stride), :],
            win.at[pl.ds(s * stride, stride), :],
            sem_r.at[_i(s)],
        ).wait()

    def start_w(col, s):
        pltpu.make_async_copy(
            win.at[pl.ds(s * stride, stride), :],
            out_hbm.at[
                pl.ds(boff_band + clamp(col) * jnp.int32(stride), stride), :
            ],
            sem_w.at[_i(s), _i(0)],
        ).start()
        pltpu.make_async_copy(
            invl_s.at[_i(s)],
            invl_hbm.at[pl.ds(boff_invl + clamp(col) * jnp.int32(b), b), :],
            sem_w.at[_i(s), _i(1)],
        ).start()

    def wait_w(s):
        pltpu.make_async_copy(
            win.at[pl.ds(s * stride, stride), :],
            out_hbm.at[pl.ds(boff_band, stride), :],
            sem_w.at[_i(s), _i(0)],
        ).wait()
        pltpu.make_async_copy(
            invl_s.at[_i(s)],
            invl_hbm.at[pl.ds(boff_invl, b), :],
            sem_w.at[_i(s), _i(1)],
        ).wait()

    # preload columns 0..bw into slots 0..bw; wait 0..bw-1 now (column
    # bw's load is waited by column 0's step 3); prime the wait_w chain
    # with a dummy writeback of (uninitialized) slot bw+1 to the padding
    # column — its content is never read
    for s in range(nslots - 1):
        start_r(jnp.int32(s), s)
    for s in range(nslots - 2):
        wait_r(s)
    start_w(pad_col, nslots - 1)

    def group(g, _):
        base = g * jnp.int32(nslots)
        # static unroll over the window slots: column base+s lives in
        # slot s for every group, so all win[] slices below are static
        for s in range(nslots):
            col = base + jnp.int32(s)
            srow = s * stride
            s_free = (s - 1) % nslots    # slot of column col-1
            s_newest = (s - 2) % nslots  # slot receiving column col+bw

            # [D] diagonal + panel factor (compute only, overlaps DMAs)
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

            # recycle the freed slot: writeback of col-1 has had all of
            # [D] to drain; the incoming load rides under the next [D]+[U]
            wait_w(s_free)
            start_r(col + jnp.int32(bw + 1), s_free)
            # the load of column col+bw (issued at column col-1) must
            # land before [U] touches its slot
            wait_r(s_newest)

            @pl.when(col < jnp.int32(nb))
            def _(s=s, col=col, srow=srow, Lkk=Lkk, dk_row=dk_row,
                  Lcol=Lcol, G=G, invLkk=invLkk):
                # [U] trailing updates (never touches the loading slot)
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
                    Lkk.dtype
                )
                win[srow : srow + b, :] = diag_part
                win[srow + b : srow + stride, :] = Lcol
                invl_s[s, :, :] = invLkk
                dstore(pl.ds(col, 1), dk_row)

            start_w(col, s)              # waited at column col+1

        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(ngroups), group, jnp.int32(0))
    # drain: the last column-step leaves one outstanding load (slot
    # nslots-2) and its own writeback (slot nslots-1)
    wait_r(nslots - 2)
    wait_w(nslots - 1)


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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(((bw + 2) * stride, b), band2d.dtype),
            pltpu.VMEM((bw + 2, b, b), band2d.dtype),
            pltpu.SemaphoreType.DMA((bw + 2,)),
            pltpu.SemaphoreType.DMA((bw + 2, 2)),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(band2d)
    return out, invl, d


@functools.partial(
    jax.jit, static_argnames=("B", "nb", "b", "bw", "interpret", "panel"))
def _stream_factorize_call_batched(
    band3d, B, nb, b, bw, interpret=False, panel=32
):
    """Batch-grid variant: grid=(B,), one sequential grid step per batch
    element (TPU grid steps share the TensorCore), HBM refs are the
    stacked whole arrays (the ANY-space whole-array rule) offset by
    ``program_id`` inside the kernel, the VMEM ``d`` output is
    grid-blocked.  This is how the streaming kernels stay usable under
    ``jax.vmap`` (see `_factorize_cv`): Mosaic rejects vmap's batched
    block specs on ANY-space refs outright."""
    nbp = nb + bw
    stride = (bw + 1) * b
    band2d = band3d.reshape(B * nbp * stride, b)
    out, invl, d = pl.pallas_call(
        functools.partial(
            _stream_factorize_kernel, nb=nb, b=b, bw=bw, panel=panel,
            batched=True),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct(band2d.shape, band2d.dtype),
            jax.ShapeDtypeStruct((B * nbp * b, b), band2d.dtype),
            jax.ShapeDtypeStruct((B, nbp, b), band2d.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            # int32 constants: under jax x64 bare 0s trace as i64 and the
            # mixed-width index-map tuple fails Mosaic's MLIR verifier
            pl.BlockSpec((1, nbp, b), lambda i: (i, _i(0), _i(0))),
        ),
        scratch_shapes=[
            pltpu.VMEM(((bw + 2) * stride, b), band2d.dtype),
            pltpu.VMEM((bw + 2, b, b), band2d.dtype),
            pltpu.SemaphoreType.DMA((bw + 2,)),
            pltpu.SemaphoreType.DMA((bw + 2, 2)),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(band2d)
    return (
        out.reshape(B, nbp * stride, b),
        invl.reshape(B, nbp * b, b),
        d,  # (B, nbp, b) — per-element shape matches the unbatched call
    )


_factorize_cv_cache = {}


def _factorize_cv(nb, b, bw, interpret, panel):
    """`custom_vmap`-wrapped `_stream_factorize_call` (cached per static
    geometry): maps `jax.vmap` onto the batch-grid kernel so the whole
    vmapped solver (`solve_batch`) keeps the streaming Pallas backend."""
    key = (nb, b, bw, interpret, panel)
    if key not in _factorize_cv_cache:

        @jax.custom_batching.custom_vmap
        def fac(band2d):
            return _stream_factorize_call(
                band2d, nb, b, bw, interpret=interpret, panel=panel)

        @fac.def_vmap
        def _rule(axis_size, in_batched, band3d):
            if not in_batched[0]:
                band3d = jnp.broadcast_to(
                    band3d[None], (axis_size,) + band3d.shape)
            out = _stream_factorize_call_batched(
                band3d, axis_size, nb, b, bw, interpret=interpret,
                panel=panel)
            return out, (True, True, True)

        _factorize_cv_cache[key] = fac
    return _factorize_cv_cache[key]


def pallas_banded_factorize_stream(
    struct: BandStructure, band: jax.Array, interpret: bool = False,
    panel: int = 32,
) -> BandedFactor:
    """Streaming drop-in for ``banded.banded_factorize``.  ``panel`` is the
    corner width of the panel-blocked diagonal factorization
    (pallas_banded._ldlt_with_inverse); 0 selects the scalar fallback.
    vmap-compatible via the batch-grid custom_vmap rule."""
    nb, b, bw, nbp = struct.nb, struct.b, struct.bw, struct.nbp
    band2d = band.reshape(nbp * (bw + 1) * b, b)
    out, invl, d = _factorize_cv(nb, b, bw, interpret, panel)(band2d)
    return BandedFactor(
        band=out.reshape(nbp, bw + 1, b, b),
        invL=invl.reshape(nbp, b, b),
        d=d.reshape(nbp * b)[: nb * b],
    )


def _stream_solve_kernel(
    band_hbm, invl_hbm, rhs_ref, out_ref, zbuf, colbuf, invbuf, sem,
    *, nb, b, bw, k, batched=False
):
    """Transposed-RHS layout: the solution lives in VMEM as (k, N) — k on
    SUBLANES, N on lanes — so a multi-RHS solve costs k/8 of a sublane
    tile instead of padding every RHS column to 128 lanes (the (N, k)
    layout costs N*128*4 bytes of VMEM for ANY k ≤ 128: 11.7 MB at
    N = 22k, which OOMs scoped VMEM — the round-1 nb=5000 failure).

    Hazard-free dataflow (see module docstring): both sweeps carry the
    active window as a fori_loop VALUE; ``zbuf``/``out_ref`` are each
    written exactly once per lane region and ``zbuf`` is only read by the
    backward sweep (a different, sequenced loop).

    Round-3: DOUBLE-BUFFERED column DMAs.  The round-2 kernel waited two
    synchronous copies per column per sweep (≈44 waits at nb=600 — the
    measured 2.7 ms solve wall was DMA latency, not bandwidth or flops).
    Now columns stream through two VMEM slots: each step waits the load
    issued two steps earlier, consumes it, and immediately re-issues the
    slot for column j±2, so the next column's copy rides under the current
    column's compute.  Loop bodies are statically 2-unrolled so every
    VMEM-side offset stays static (Mosaic's best-tested addressing path);
    out-of-range prefetch indices are clamped (their data is never read).
    Start/wait pairs are balanced per slot: 2 preloads + one start per
    step, one wait per step + 2 drains per sweep."""
    stride = (bw + 1) * b
    ngroups = -(-nb // 2)
    # batch-grid mode: see `_stream_factorize_kernel` — ANY-space factor
    # arrays offset by program_id, VMEM rhs/out grid-blocked per element
    if batched:
        pid = pl.program_id(0)
        boff_band = pid * jnp.int32((nb + bw) * stride)
        boff_invl = pid * jnp.int32((nb + bw) * b)

        def rload(cols):
            return rhs_ref[0, :, cols]

        def ostore(cols, val):
            out_ref[0, :, cols] = val
    else:
        boff_band = jnp.int32(0)
        boff_invl = jnp.int32(0)

        def rload(cols):
            return rhs_ref[:, cols]

        def ostore(cols, val):
            out_ref[:, cols] = val

    eye_b = (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )

    def clamp(col):
        return jnp.clip(col, jnp.int32(0), jnp.int32(nb + bw - 1))

    def start_load(col, s):
        col = clamp(col)
        pltpu.make_async_copy(
            band_hbm.at[pl.ds(boff_band + col * jnp.int32(stride), stride), :],
            colbuf.at[_i(s)], sem.at[_i(s), _i(0)],
        ).start()
        pltpu.make_async_copy(
            invl_hbm.at[pl.ds(boff_invl + col * jnp.int32(b), b), :],
            invbuf.at[_i(s)], sem.at[_i(s), _i(1)],
        ).start()

    def wait_load(s):
        pltpu.make_async_copy(
            band_hbm.at[pl.ds(boff_band, stride), :], colbuf.at[_i(s)],
            sem.at[_i(s), _i(0)],
        ).wait()
        pltpu.make_async_copy(
            invl_hbm.at[pl.ds(boff_invl, b), :], invbuf.at[_i(s)],
            sem.at[_i(s), _i(1)],
        ).wait()

    def diag_div(s):
        # the factor column's diagonal block carries d_j on its diagonal
        dk_row = jnp.sum(
            jnp.where(eye_b, colbuf[s, 0:b, :], 0.0), axis=0, keepdims=True
        )
        return jnp.where(jnp.abs(dk_row) <= ZERO_PIVOT_TOL, jnp.inf, dk_row)

    # forward sweep: W carries the partially-updated rhs for columns
    # j..j+bw (the only lanes a banded L touches ahead of the pivot)
    start_load(jnp.int32(0), 0)
    start_load(jnp.int32(1), 1)

    def fwd_group(g, W):
        for s in (0, 1):                     # static unroll: slot = j % 2
            j = 2 * g + jnp.int32(s)
            wait_load(s)
            rj = W[:, :b]                                        # (k, b)
            zj = jnp.dot(
                rj, invbuf[s].T, preferred_element_type=rj.dtype)
            Pj = colbuf[s, b:stride, :]                          # (bw*b, b)
            rest = W[:, b:] - jnp.dot(
                zj, Pj.T, preferred_element_type=rj.dtype)
            zout = zj / diag_div(s)

            # fuse the D^{-1} step: z_j is final after step j (guarded:
            # the 2-unroll's overhang step computes garbage, writes nothing)
            @pl.when(j < jnp.int32(nb))
            def _(j=j, zout=zout):
                zbuf[:, pl.ds(j * jnp.int32(b), b)] = zout

            start_load(j + jnp.int32(2), s)  # slot consumed — re-issue
            # shift in the rhs of column j+bw+1 (clamped: the final
            # iterations' shifted-in lanes are never consumed)
            nxt = rload(pl.ds(clamp(j + jnp.int32(bw + 1))
                              * jnp.int32(b), b))
            W = jnp.concatenate([rest, nxt], axis=1)
        return W

    W0 = rload(slice(0, stride))
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(ngroups), fwd_group, W0)
    wait_load(0)                             # drain the two overhang loads
    wait_load(1)

    # backward sweep: X carries x for columns j+1..j+bw (nearest first)
    start_load(jnp.int32(nb - 1), 0)
    start_load(jnp.int32(nb - 2), 1)

    def bwd_group(g, X):
        for s in (0, 1):
            t = 2 * g + jnp.int32(s)
            j = jnp.int32(nb - 1) - t
            wait_load(s)
            Pj = colbuf[s, b:stride, :]
            wj = zbuf[:, pl.ds(clamp(j) * jnp.int32(b), b)]      # (k, b)
            tj = wj - jnp.dot(X, Pj, preferred_element_type=wj.dtype)
            xj = jnp.dot(tj, invbuf[s], preferred_element_type=wj.dtype)

            @pl.when(j >= jnp.int32(0))
            def _(j=j, xj=xj):
                ostore(pl.ds(j * jnp.int32(b), b), xj)

            start_load(j - jnp.int32(2), s)
            if bw > 1:
                X = jnp.concatenate([xj, X[:, : (bw - 1) * b]], axis=1)
            else:
                X = xj
        return X

    X0 = jnp.zeros((k, bw * b), rhs_ref.dtype)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(ngroups), bwd_group, X0)
    wait_load(0)
    wait_load(1)

    # the padding lanes (columns nb..nb+bw-1) are never written above and
    # never read by the host slice; zero them once, statically
    ostore(slice(nb * b, None), jnp.zeros((k, bw * b), rhs_ref.dtype))


@functools.partial(jax.jit, static_argnames=("nb", "b", "bw", "k", "interpret"))
def _stream_solve_call(band2d, invl2d, rhs_t, nb, b, bw, k, interpret=False):
    stride = (bw + 1) * b
    return pl.pallas_call(
        functools.partial(_stream_solve_kernel, nb=nb, b=b, bw=bw, k=k),
        out_shape=jax.ShapeDtypeStruct(rhs_t.shape, rhs_t.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(rhs_t.shape, rhs_t.dtype),
            pltpu.VMEM((2, stride, b), rhs_t.dtype),
            pltpu.VMEM((2, b, b), rhs_t.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(band2d, invl2d, rhs_t)


@functools.partial(
    jax.jit, static_argnames=("B", "nb", "b", "bw", "k", "interpret"))
def _stream_solve_call_batched(
    band3d, invl3d, rhs_t, B, nb, b, bw, k, interpret=False
):
    """Batch-grid solve: see `_stream_factorize_call_batched`."""
    nbp = nb + bw
    stride = (bw + 1) * b
    band2d = band3d.reshape(B * nbp * stride, b)
    invl2d = invl3d.reshape(B * nbp * b, b)
    out = pl.pallas_call(
        functools.partial(
            _stream_solve_kernel, nb=nb, b=b, bw=bw, k=k, batched=True),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct(rhs_t.shape, rhs_t.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, nbp * b), lambda i: (i, _i(0), _i(0))),
        ],
        out_specs=pl.BlockSpec((1, k, nbp * b), lambda i: (i, _i(0), _i(0))),
        scratch_shapes=[
            pltpu.VMEM((k, nbp * b), rhs_t.dtype),
            pltpu.VMEM((2, stride, b), rhs_t.dtype),
            pltpu.VMEM((2, b, b), rhs_t.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(band2d, invl2d, rhs_t)
    return out


_solve_cv_cache = {}


def _solve_cv(nb, b, bw, kp, interpret):
    """`custom_vmap`-wrapped `_stream_solve_call` (cached per geometry)."""
    key = (nb, b, bw, kp, interpret)
    if key not in _solve_cv_cache:

        @jax.custom_batching.custom_vmap
        def sol(band2d, invl2d, work):
            return _stream_solve_call(
                band2d, invl2d, work, nb, b, bw, kp, interpret=interpret)

        @sol.def_vmap
        def _rule(axis_size, in_batched, band3d, invl3d, work3d):
            ins = [band3d, invl3d, work3d]
            for i, batched in enumerate(in_batched):
                if not batched:
                    ins[i] = jnp.broadcast_to(
                        ins[i][None], (axis_size,) + ins[i].shape)
            out = _stream_solve_call_batched(
                ins[0], ins[1], ins[2], axis_size, nb, b, bw, kp,
                interpret=interpret)
            return out, True

        _solve_cv_cache[key] = sol
    return _solve_cv_cache[key]


def pallas_banded_solve_stream(
    struct: BandStructure, f: BandedFactor, rhs: jax.Array,
    interpret: bool = False,
):
    """Streaming drop-in for ``banded.banded_solve`` (permuted rhs).
    vmap-compatible via the batch-grid custom_vmap rule."""
    nb, b, bw, nbp, N = struct.nb, struct.b, struct.bw, struct.nbp, struct.N
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    k = r.shape[1]
    kp = max(8, -(-k // 8) * 8)
    work = jnp.zeros((kp, nbp * b), r.dtype).at[:k, :N].set(r.T)
    band2d = f.band.reshape(nbp * (bw + 1) * b, b)
    invl2d = f.invL.reshape(nbp * b, b)
    out = _solve_cv(nb, b, bw, kp, interpret)(band2d, invl2d, work)
    x = out[:k, :N].T
    return x[:, 0] if squeeze else x
