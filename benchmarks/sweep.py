"""Benchmark sweep — pglib-style case-size sweep across formulations, plus
batched-throughput modes.  Prints one JSON line per configuration (and a
markdown table at the end) so results can be pasted into docs/benchmarks.md.

Usage (TPU runs are slow to compile — run under nohup):

    python benchmarks/sweep.py single 118 300 600
    python benchmarks/sweep.py batch 64
    python benchmarks/sweep.py all
"""

import json
import sys
import time


def _timed(solver):
    stats = solver.solve_jitted()          # compile + warm
    t0 = time.time()
    stats = solver.solve_jitted()
    return stats, time.time() - t0


def sweep_single(sizes):
    import jax

    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.models.instances import opf

    rows = []
    for nb in sizes:
        configs = [
            ("dense", dict(), opf.build(nb=nb, seed=0)),
            ("dense_hykkt", dict(linear_solver=LinearSolver.HYKKT),
             opf.build(nb=nb, seed=0)),
        ]
        sp = opf.build_sparse(nb=nb, seed=0)
        for name, lin in [
            ("banded", LinearSolver.BANDED),
            ("multifrontal", LinearSolver.MULTIFRONTAL),
            ("block_arrow", LinearSolver.BLOCK_ARROW),
        ]:
            configs.append((name, dict(linear_solver=lin),
                            opf.build_sparse(nb=nb, seed=0)))
        for name, kw, model in configs:
            try:
                solver = MadNLPSolver(model, dtype="float32", **kw)
                stats, wall = _timed(solver)
                ok = stats.status in (Status.SOLVE_SUCCEEDED,
                                      Status.SOLVED_TO_ACCEPTABLE_LEVEL)
                rec = {
                    "sweep": "single", "case": f"nb={nb}", "config": name,
                    "n": model.n, "m": model.m, "iters": int(stats.iter),
                    "wall_s": round(wall, 3),
                    "iter_per_s": round(stats.iter / wall, 2),
                    "status": stats.status.name, "ok": bool(ok),
                }
            except Exception as e:  # record failures, keep sweeping
                rec = {"sweep": "single", "case": f"nb={nb}", "config": name,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(rec), flush=True)
            rows.append(rec)
    return rows


def sweep_batch(B):
    import jax.numpy as jnp
    import numpy as np

    from madnlp_tpu import MadNLPSolver, Status
    from madnlp_tpu.ipm.solver import batch_summary
    from madnlp_tpu.models.instances import opf

    model = opf.build(nb=118, seed=0, parametric=True)
    solver = MadNLPSolver(model, dtype="float32")
    scales = jnp.linspace(0.85, 1.15, B)
    rows = []
    for label, kw in [
        ("bulk_vmap", dict(chunk_size=None)),
        ("chunk16", dict(chunk_size=16, probe_iters=0)),
        ("chunk16_sorted", dict(chunk_size=16, probe_iters=3)),
        ("chunk8_sorted", dict(chunk_size=8, probe_iters=3)),
    ]:
        st = solver.solve_batch(scales, **kw)     # compile + warm
        t0 = time.time()
        st = solver.solve_batch(scales, **kw)
        wall = time.time() - t0
        summ = batch_summary(solver.prob, st)
        ok = (summ["status"] == int(Status.SOLVE_SUCCEEDED)).all()
        rec = {
            "sweep": "batch", "B": B, "mode": label,
            "wall_s": round(wall, 3),
            "inst_per_s": round(B / wall, 3),
            "iter_spread": [int(summ["iter"].min()), int(summ["iter"].max())],
            "ok": bool(ok),
        }
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    return rows


def main(argv):
    mode = argv[0] if argv else "all"
    rows = []
    if mode in ("single", "all"):
        sizes = [int(a) for a in argv[1:] if a.isdigit()] or [118, 300, 600]
        rows += sweep_single(sizes)
    if mode in ("batch", "all"):
        B = int(argv[1]) if mode == "batch" and len(argv) > 1 else 64
        rows += sweep_batch(B)
    # markdown summary
    print("\n| sweep | case | config | iters | wall s | rate |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['sweep']} | {r.get('case','')} | {r['config']} | "
                  f"ERROR | | {r['error']} |")
        elif r["sweep"] == "single":
            print(f"| single | {r['case']} (n={r['n']}) | {r['config']} | "
                  f"{r['iters']} | {r['wall_s']} | {r['iter_per_s']} iter/s |")
        else:
            print(f"| batch | B={r['B']} | {r['mode']} | "
                  f"{r['iter_spread']} | {r['wall_s']} | "
                  f"{r['inst_per_s']} inst/s |")


if __name__ == "__main__":
    main(sys.argv[1:])
