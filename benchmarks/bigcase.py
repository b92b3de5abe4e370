"""Large-scale single-chip probe: case9241-class synthetic sparse ACOPF.

Usage: PYTHONPATH=/root/repo python benchmarks/bigcase.py [nb]
Runs the sparse edge-local model with the banded factorization (the
general sparse direct path) at case2869/case9241 scale on one chip and
prints a one-line JSON result.
"""

import json
import sys
import time


def main(nb):
    from madnlp_tpu import LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.models.instances import opf

    model = opf.build_sparse(nb=nb, seed=0)
    solver = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED)
    stats = solver.solve_jitted()
    t0 = time.time()
    stats = solver.solve_jitted()
    wall = time.time() - t0
    ok = stats.status in (Status.SOLVE_SUCCEEDED,
                          Status.SOLVED_TO_ACCEPTABLE_LEVEL)
    print(json.dumps({
        "case": f"nb={nb}", "n": model.n, "m": model.m,
        "iters": int(stats.iter), "wall_s": round(wall, 2),
        "iter_per_s": round(int(stats.iter) / wall, 2),
        "status": stats.status.name, "ok": bool(ok),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
