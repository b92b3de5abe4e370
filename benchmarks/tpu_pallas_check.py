"""On-chip Pallas unit checks (VERDICT r1 #9) — run on the REAL TPU so a
Mosaic/streaming-kernel regression fails loudly instead of surfacing only
as a bench slowdown (CPU pytest runs the interpret/XLA fallback and can't
see it):

  nohup python benchmarks/tpu_pallas_check.py > /tmp/pallas_check.log &

Checks, at several band geometries:
  1. streaming factorize == XLA block-banded factorize (factor payloads)
  2. streaming solve reproduces K x = b to f32 accuracy
  3. a full sparse+banded IPM solve with backend=pallas matches
     backend=xla in ITERATION COUNT and objective (golden rule on chip)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def random_band_system(rng, N, b, bw):
    """STRICTLY diagonally dominant band matrix (certainly SPD).

    A fixed small diagonal (the original generator used diag = 3 + |N(0,.1)|)
    goes INDEFINITE once the bandwidth is large (0.1-scale off-diagonals sum
    past the diagonal: at bw*b = 384 the matrix had ~100 negative
    eigenvalues) — and an unpivoted LDLt of an indefinite matrix amplifies
    any reordering of f32 ops into O(1)-or-worse factor differences.  That
    made the streaming-vs-XLA comparison a conditioning test, not a kernel
    test (round-2 postmortem: what looked like a Mosaic miscompile at
    bw*b >= 384 was exactly this).  Diagonal = 1.1 * (row |off-diag| sum) + 1
    keeps the comparison meaningful at every geometry."""
    from madnlp_tpu.ops.banded import BandStructure

    rows, cols = [], []
    W = bw * b - 1
    for i in range(N):
        for j in range(max(0, i - W), i + 1):
            if rng.random() < 0.4 or i == j:
                rows.append(i)
                cols.append(j)
    rows, cols = np.asarray(rows), np.asarray(cols)
    bs = BandStructure(rows, cols, N, block=b, perm=np.arange(N))
    vals = rng.standard_normal(len(rows)) * 0.1
    off = rows != cols
    rowsum = np.zeros(N)
    np.add.at(rowsum, rows[off], np.abs(vals[off]))
    np.add.at(rowsum, cols[off], np.abs(vals[off]))
    vals[~off] = 1.1 * rowsum[rows[~off]] + 1.0
    idx = bs.map(rows, cols)
    band = bs.assemble(jnp.asarray(idx), jnp.asarray(vals), jnp.float32)
    # dense mirror for the residual check
    K = np.zeros((N, N))
    K[rows, cols] = vals
    K = K + np.tril(K, -1).T
    return bs, band, K


def main():
    assert jax.default_backend() == "tpu", (
        f"this check must run on the TPU (got {jax.default_backend()})")
    from madnlp_tpu.ops import banded as bn
    from madnlp_tpu.ops import pallas_banded_stream as pb

    rng = np.random.default_rng(0)
    fails = 0
    for (N, b, bw) in [(512, 128, 2), (1000, 128, 3), (2048, 256, 2)]:
        bs, band, K = random_band_system(rng, N, b, bw)
        f_x = jax.jit(lambda bd: bn.banded_factorize(bs, bd))(band)
        f_p = jax.jit(lambda bd: pb.pallas_banded_factorize_stream(bs, bd))(
            band)
        d_err = float(jnp.max(jnp.abs(f_p.d[:N] - f_x.d[:N])))
        # compare the REAL factored columns only: the round-3 pipelined
        # kernel's unconditional (clamped) DMA schedule uses the band's
        # padding columns [nb:] as a garbage sink — their content is
        # unspecified by contract and never read by any consumer (solve
        # sweeps and inertia guard to col < nb; assembly overwrites)
        b_err = float(jnp.max(jnp.abs(
            f_p.band[: bs.nb] - f_x.band[: bs.nb])))
        b_err_pad = float(jnp.max(jnp.abs(f_p.band - f_x.band)))
        rhs = jnp.asarray(rng.standard_normal(N), jnp.float32)
        x_p = jax.jit(lambda f, r: pb.pallas_banded_solve_stream(bs, f, r))(
            f_p, rhs)
        res = float(np.max(np.abs(K @ np.asarray(x_p, np.float64)
                                  - np.asarray(rhs, np.float64))))
        # isolate the solve kernel: solve with the XLA factor
        x_px = jax.jit(lambda f, r: pb.pallas_banded_solve_stream(bs, f, r))(
            f_x, rhs)
        res_x = float(np.max(np.abs(K @ np.asarray(x_px, np.float64)
                                    - np.asarray(rhs, np.float64))))
        ok = d_err < 1e-4 and b_err < 1e-3 and res < 1e-2 and res_x < 1e-2
        fails += not ok
        print(json.dumps({
            "check": f"stream_vs_xla_N{N}_b{b}_bw{bw}",
            "factor_d_err": d_err, "factor_band_err": b_err,
            "factor_band_err_incl_padding": b_err_pad,
            "solve_residual_inf": res,
            "solve_residual_xla_factor": res_x, "ok": bool(ok)}), flush=True)

    # full-solver golden rule on chip: pallas backend == xla backend
    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.models.instances import opf

    model = opf.build_sparse(nb=300, seed=0)
    st_p = MadNLPSolver(model, dtype="float32",
                        linear_solver=LinearSolver.BANDED,
                        banded_backend="pallas").solve_jitted()
    st_x = MadNLPSolver(model, dtype="float32",
                        linear_solver=LinearSolver.BANDED,
                        banded_backend="xla").solve_jitted()
    ok = (st_p.status == Status.SOLVE_SUCCEEDED
          and int(st_p.iter) == int(st_x.iter)
          and abs(st_p.objective - st_x.objective)
          / abs(st_x.objective) < 1e-6)
    fails += not ok
    print(json.dumps({
        "check": "full_solve_golden_nb300",
        "iter_pallas": int(st_p.iter), "iter_xla": int(st_x.iter),
        "obj_rel_delta": abs(st_p.objective - st_x.objective)
        / abs(st_x.objective),
        "ok": bool(ok)}), flush=True)
    print(json.dumps({"pallas_onchip_checks": "PASS" if not fails
                      else f"FAIL({fails})"}), flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
