"""Decompose the full-solve wall at scale: counters vs kernel times.

  nohup python benchmarks/probe_fullsolve.py 3000 5000 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from madnlp_tpu import LinearSolver, MadNLPSolver, Status


def main(sizes):
    from madnlp_tpu.models.instances import opf

    for nb in sizes:
        model = opf.build_sparse(nb=nb, seed=0)
        sv = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED)
        st = sv.solve_jitted()  # compile + warm
        t0 = time.time()
        st = sv.solve_jitted()
        wall = time.time() - t0
        c = st.counters
        print(json.dumps({
            "nb": nb, "iter": int(st.iter), "status": int(st.status),
            "wall_s": round(wall, 2),
            "s_per_iter": round(wall / max(int(st.iter), 1), 3),
            "counters": {k: int(v) for k, v in c.items()
                         if isinstance(v, (int, float))},
        }), flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [3000, 5000])
