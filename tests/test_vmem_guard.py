"""Backend-feasibility guard for the streaming Pallas band kernels
(VERDICT r4 weak #1 regression).

BENCH_r04 shipped rc=1 because the bench default (case118x4 ring) produced
a band geometry (b=256, bw=4) whose streaming-factorize scratch is
~17.9 MB — over Mosaic's 16 MB scoped-VMEM limit — and the backend
resolver picked the Pallas kernel with no feasibility check.  These tests
assert, ON CPU, that every geometry the bench defaults can produce
resolves to a configuration that fits, so this class of failure can never
again reach the chip untested.  (Reference analogue: the smart presets of
src/IPM/options.jl:209-228 always resolve to a *working* solver.)
"""

import os

import numpy as np
import pytest

from madnlp_tpu import LinearSolver, MadNLPSolver
from madnlp_tpu.kkt.sparse import resolve_banded_config
from madnlp_tpu.ops.pallas_banded_stream import (
    VMEM_BUDGET_FRACTION,
    VMEM_SCOPED_LIMIT,
    stream_factorize_vmem_bytes,
    stream_fits_vmem,
)
from madnlp_tpu.utils.options import MadNLPOptions

DATA = os.path.join(os.path.dirname(__file__), "data")


def _bench_model(spec):
    """Builds bench.py's model for a given spec (same construction)."""
    import bench

    return bench._make_model(spec)[0]


def _band_geometry(model):
    """(N, W) of the banded KKT for this model under bench options —
    obtained from the actual solver's BandStructure (built on CPU; W is
    permutation-determined, independent of block size and platform)."""
    s = MadNLPSolver(
        model, dtype="float32", linear_solver=LinearSolver.BANDED
    )
    bs = s.kernel.kkt.bstruct
    return bs.N, bs.W


# every geometry class the bench CLI can select (defaults + the
# structurally-diverse round-5 topologies, incl. the W=1717 grid2d x9
# whose band exceeds ANY feasible Pallas geometry → must resolve to xla)
BENCH_SPECS = ["case118", "case118x4", "nb600", "case118x4grid",
               "case118x9grid", "mix57+118"]


@pytest.mark.parametrize("spec", BENCH_SPECS)
def test_bench_default_geometry_fits_vmem_on_tpu(spec):
    """The TPU-resolved banded config for every bench-default geometry
    must be runnable: Pallas only if 128-aligned AND within scoped VMEM.
    Fails on round-4 HEAD for case118x4 (resolver picked b=256/pallas)."""
    N, W = _band_geometry(_bench_model(spec))
    b, backend = resolve_banded_config(N, W, MadNLPOptions(), "tpu")
    if backend == "pallas":
        bw = max(1, -(-W // b)) if W > 0 else 1
        nbp = max(1, -(-N // b)) + bw
        assert b % 128 == 0
        assert stream_fits_vmem(b, bw, nbp), (
            f"{spec}: resolver chose pallas b={b} bw={bw} but scratch "
            f"{stream_factorize_vmem_bytes(b, bw, nbp) / 1e6:.1f} MB "
            f"exceeds the scoped-VMEM budget"
        )
    else:
        assert backend == "xla"


def test_case118x4_ring_reblocks_not_falls_back():
    """The specific BENCH_r04 failure geometry: the resolver must fix it
    by RE-BLOCKING (b=128 fits at ~11.5 MB), keeping the Pallas kernel,
    not by abandoning it for the XLA loop."""
    N, W = _band_geometry(_bench_model("case118x4"))
    assert W > 512, "ring ties should widen the band past bw=2@256"
    b, backend = resolve_banded_config(N, W, MadNLPOptions(), "tpu")
    assert backend == "pallas"
    assert b == 128


def test_infeasible_wide_band_falls_back_to_xla():
    """A band too wide for any 128-multiple block must resolve to the
    XLA backend (which has no scoped scratch), never to a config that
    compiles into the VMEM wall."""
    b, backend = resolve_banded_config(8192, 4000, MadNLPOptions(), "tpu")
    assert backend == "xla"


def test_pinned_block_size_is_honored():
    """User-pinned banded_block_size is never silently overridden: if the
    pinned geometry doesn't fit, the backend falls back to XLA instead."""
    opts = MadNLPOptions(banded_block_size=256)
    b, backend = resolve_banded_config(2320, 779, opts, "tpu")
    assert b == 256
    assert backend == "xla"


def test_estimator_matches_mosaic_calibration():
    """Pin the estimator against the one measured Mosaic data point:
    (b=256, bw=4) compiled to a reported 17.87 MB scoped allocation; the
    estimate must bracket it (within 10%) and must be judged infeasible."""
    est = stream_factorize_vmem_bytes(256, 4, nbp=14)
    measured = 17.87 * 1024 * 1024  # Mosaic reports MiB
    assert abs(est - measured) / measured < 0.10
    assert not stream_fits_vmem(256, 4, nbp=14)
    # the re-blocked geometry for the same band fits with headroom
    assert stream_fits_vmem(128, 7, nbp=26)
    assert (
        stream_factorize_vmem_bytes(128, 7, nbp=26)
        <= VMEM_SCOPED_LIMIT * VMEM_BUDGET_FRACTION
    )


def test_resolved_config_solves_on_cpu():
    """End-to-end: the re-blocked b=128 geometry is not just feasible but
    correct — case118x4 ring solves with an explicitly pinned b=128 (the
    TPU-resolved block) to the same objective as the default CPU config."""
    from madnlp_tpu import Status, madnlp

    model = _bench_model("case118x4")
    ref = madnlp(model, linear_solver=LinearSolver.BANDED)
    s = madnlp(
        model, linear_solver=LinearSolver.BANDED, banded_block_size=128
    )
    assert ref.status == Status.SOLVE_SUCCEEDED
    assert s.status == Status.SOLVE_SUCCEEDED
    np.testing.assert_allclose(s.objective, ref.objective, rtol=1e-8)
