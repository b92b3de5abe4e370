"""Analytic FLOP/byte accounting + roofline/MFU reporting (BASELINE.md:26-30).

The reference tracks only wall-clock splits (``src/utils.jl:116-151``);
for a TPU build the meaningful efficiency statement is *achieved FLOP/s
against the chip's roofline*: ``min(peak_flops, bytes x BW)`` over the
factorization's analytic work.  All counts below are exact polynomial
counts of the algorithms in ``ops/`` (2 flops per MAC), computed from the
STATIC problem geometry — no tracing cost models.
"""

from __future__ import annotations

from typing import NamedTuple


class Roofline(NamedTuple):
    flops: float          # analytic flop count of the operation
    bytes: float          # HBM traffic lower bound (read + write once)
    t_compute_s: float    # flops / peak
    t_memory_s: float     # bytes / bandwidth
    t_roofline_s: float   # max of the two — the speed-of-light wall
    achieved_gflops: float
    mfu: float            # achieved / peak (matrix-unit utilization)
    roofline_frac: float  # t_roofline / t_measured (1.0 = at the roofline)


# (peak f32 matmul flop/s with precision=highest, HBM bytes/s) per chip.
# TPU f32 matmuls at jax_default_matmul_precision='highest' run 6 bf16
# MXU passes, so the *f32* peak is peak_bf16/6 — that is the honest
# denominator for this package, which forces highest precision globally
# (a correctness requirement for KKT factorizations, CLAUDE.md).
_PEAKS = {
    # device_kind substring -> (bf16 peak flop/s, HBM B/s)
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),
}
_F32_HIGHEST_PASSES = 6


def device_peaks(device=None):
    """(f32-highest matmul peak flop/s, HBM B/s) for ``device`` (default:
    jax.devices()[0]); falls back to v5e numbers for unknown kinds."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, (bf16, bw) in _PEAKS.items():
        if key in kind:
            return bf16 / _F32_HIGHEST_PASSES, bw
    if device.platform == "cpu":
        return 5e10, 5e10  # nominal host numbers; ratios only
    return _PEAKS["v5e"][0] / _F32_HIGHEST_PASSES, _PEAKS["v5e"][1]


# -- analytic counts ---------------------------------------------------------

def banded_factorize_flops(nb: int, b: int, bw: int) -> float:
    """Right-looking block-banded LDLt (ops/banded.py:banded_factorize):
    per block column — b x b unblocked LDLt (b^3/3 MACs), unit-triangular
    inverse (b^3/2 MACs), panel X = P @ invL^T (bw*b^2 MACs x b), trailing
    G = Lcol @ X^T ((bw*b)^2 x b MACs) and its scatter-subtract."""
    per_col = 2.0 * (b**3 / 3 + b**3 / 2 + bw * b**3 + (bw * b) ** 2 * b)
    return nb * per_col


def banded_factorize_bytes(nb: int, b: int, bw: int, itemsize: int) -> float:
    """Band read + write once, invL write, d write."""
    band = (nb + bw) * (bw + 1) * b * b * itemsize
    return 2.0 * band + (nb + bw) * b * b * itemsize + nb * b * itemsize


def banded_solve_flops(nb: int, b: int, bw: int, nrhs: int = 1) -> float:
    """Forward + diagonal + backward sweeps: each off-diagonal band block
    contributes one b x b mat-vec per sweep."""
    per_sweep = nb * (bw + 1) * 2.0 * b * b * nrhs
    return 2.0 * per_sweep + nb * b * nrhs


def dense_ldlt_flops(n: int) -> float:
    """Blocked dense LDLt: n^3/3 MACs."""
    return 2.0 * n**3 / 3


def dense_solve_flops(n: int, nrhs: int = 1) -> float:
    return 2.0 * n * n * nrhs


def bchol_flops(nw: int, m: int) -> float:
    """Range-space block Cholesky (ops/dense_solvers.py:_bchol_factorize):
    chol(W) + X = L1^-1 A^T + S = X^T X - C + chol(S)."""
    return 2.0 * (nw**3 / 6 + nw**2 * m / 2 + nw * m**2 / 2 + m**3 / 6)


def hykkt_flops(nw: int, m: int) -> float:
    """K_gamma = W + gamma A^T A build + Cholesky/LDLt of K_gamma."""
    return 2.0 * (nw**2 * m / 2 + nw**3 / 6)


def roofline(flops: float, bytes_: float, t_measured_s: float,
             device=None) -> Roofline:
    peak, bw = device_peaks(device)
    t_c = flops / peak
    t_m = bytes_ / bw
    t_r = max(t_c, t_m)
    ach = flops / max(t_measured_s, 1e-12)
    return Roofline(
        flops=flops, bytes=bytes_, t_compute_s=t_c, t_memory_s=t_m,
        t_roofline_s=t_r, achieved_gflops=ach / 1e9, mfu=ach / peak,
        roofline_frac=min(1.0, t_r / max(t_measured_s, 1e-12)),
    )


def banded_roofline(struct, t_fact_s: float, itemsize: int = 4,
                    device=None) -> Roofline:
    """Roofline for one banded factorization given its measured wall."""
    nb, b, bw = struct.nb, struct.b, struct.bw
    return roofline(
        banded_factorize_flops(nb, b, bw),
        banded_factorize_bytes(nb, b, bw, itemsize),
        t_fact_s, device,
    )


def dense_roofline(n: int, t_fact_s: float, itemsize: int = 4,
                   device=None) -> Roofline:
    return roofline(
        dense_ldlt_flops(n), 2.0 * n * n * itemsize, t_fact_s, device,
    )
