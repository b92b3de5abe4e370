"""Batched-solve throughput on chip (VERDICT r3 next #4).

``solve_batch`` — the whole-solver vmap analogue of cuDSS uniform
batching (``/root/reference/lib/MadNLPGPU/ext/MadNLPGPUCUDAExt/cudss.jl:139-148``)
— had correctness/parity tests but zero recorded on-chip throughput.
This probe sweeps batch sizes over same-structure instances (load-scale
scenarios) at two scales:

* REAL case57 (n=320 after reformulation) — small-instance regime where
  batching should shine (one instance leaves the chip idle);
* flagship nb=600 synthetic (n=1474) — the large-instance regime.

Reports instances/s and aggregate iterations/s vs the B=1 baseline,
with the chunked+sorted scheduling variants (difficulty-sorted chunks,
docstring of ``solver.solve_batch``).

Usage: python -m benchmarks.probe_batch [case57|nb600|all]
"""

import json
import os
import sys
import time

import jax.numpy as jnp


def make_parametric(spec):
    if spec.startswith("case"):
        from madnlp_tpu.models import matpower

        case = matpower.parse_case(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "data", f"{spec}.m"))
        return matpower.build_acopf(case, sparse=True, parametric=True)
    from madnlp_tpu.models.instances import opf

    return opf.build_sparse(nb=int(spec[2:]), seed=0, parametric=True)


def run_spec(spec, batches=(1, 4, 16, 64)):
    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.ipm.solver import batch_summary

    from madnlp_tpu.utils import flops as F

    model = make_parametric(spec)
    solver = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED)
    bs = solver.kernel.kkt.bstruct
    fact_flops = F.banded_factorize_flops(bs.nb, bs.b, bs.bw)
    peak, _ = F.device_peaks()
    base = None
    for B in batches:
        scales = jnp.linspace(0.92, 1.08, B) if B > 1 else jnp.ones((1,))
        modes = [("bulk", dict(chunk_size=None))]
        if B > 16:
            modes.append(("chunk16_sorted",
                          dict(chunk_size=16, probe_iters=3)))
        for label, kw in modes:
            try:
                t0 = time.time()
                st = solver.solve_batch(scales, **kw)   # compile + warm
                compile_s = time.time() - t0
            except Exception as e:  # noqa: BLE001 — one faulting config
                # must not lose the finished rows (B=64 nb600 faulted the
                # device in round 5; containment mirrors bench.py)
                print(json.dumps({
                    "spec": spec, "B": B, "mode": label,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)
                continue
            walls = []
            for r in range(3):
                # perturb per repeat: the axon tunnel backend memoizes
                # identical (executable, args) dispatches — round-5 v2
                # probe measured 0.0 s walls for repeated identical calls
                t0 = time.time()
                st = solver.solve_batch(scales + 1e-12 * (r + 1), **kw)
                walls.append(time.time() - t0)
            walls.sort()
            wall = walls[len(walls) // 2]
            summ = batch_summary(solver.prob, st)
            ok = (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()
            iters = summ["iter"]
            rec = {
                "spec": spec, "B": B, "mode": label,
                "wall_s": round(wall, 3),
                "inst_per_s": round(B / wall, 3),
                "agg_iter_per_s": round(float(iters.sum()) / wall, 1),
                "iter_min_max": [int(iters.min()), int(iters.max())],
                "ok": bool(ok),
                "compile_s": round(compile_s, 1),
                # aggregate factorization-chain MFU (same convention as
                # the scale table in docs/benchmarks.md): batching B
                # independent pivot chains is the repo's stated answer to
                # the single-chain latency wall — this is the number that
                # must rise with B (VERDICT r4 weak #4 / next #2)
                "agg_fact_mfu_pct": round(
                    100 * float(iters.sum()) * fact_flops / wall / peak, 2
                ),
            }
            if base is None and B == 1:
                base = rec["inst_per_s"]
            if base:
                rec["speedup_vs_B1"] = round(rec["inst_per_s"] / base, 2)
            print(json.dumps(rec), flush=True)


def main(spec="all"):
    specs = ["case57", "nb600"] if spec == "all" else [spec]
    for s in specs:
        run_spec(s)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
