"""On-chip probe for the nb>=3000 per-iteration blow-up (VERDICT r1 #2).

Times build+factorize, one refined backsolve, one full IPM step, and the
model-eval callbacks at each scale, so the superlinear component is
attributable.  Run on the TPU:  nohup python benchmarks/probe_scale.py &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from madnlp_tpu import LinearSolver, MadNLPSolver
from madnlp_tpu.models.instances import opf
from madnlp_tpu.utils.timing import timing_callbacks, timing_linear_solver


def main(sizes=(600, 1500, 3000, 5000), block=None):
    dev = jax.devices()[0].platform
    for nb in sizes:
        t0 = time.time()
        model = opf.build_sparse(nb=nb, seed=0)
        kw = {} if block is None else {"ldl_block_size": block}
        sv = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED, **kw)
        bs = sv.kernel.kkt.bstruct
        lin = timing_linear_solver(sv, ntrials=5)
        cb = timing_callbacks(sv, ntrials=5)
        st = sv.state if sv.state is not None else sv._init_fn()
        step = jax.jit(sv.kernel.regular_step)
        st2 = jax.block_until_ready(step(st))  # compile
        t1 = time.time()
        for _ in range(5):
            st2 = step(st)
        jax.block_until_ready(st2)
        t_step = (time.time() - t1) / 5
        # full solve, timed on device (stats.solve_time excludes host-side
        # stats extraction — the round-2 'blow-up' numbers did not)
        stats = sv.solve_jitted()
        stats = sv.solve_jitted()
        print(json.dumps({
            "nb": nb, "N": bs.N, "b": bs.b, "bw": bs.bw,
            "device": dev,
            "t_fact_ms": round(lin["t_build_factorize"] * 1e3, 2),
            "t_solve_ms": round(lin["t_backsolve"] * 1e3, 2),
            "t_step_ms": round(t_step * 1e3, 2),
            "t_jac_ms": round(cb["t_jac"] * 1e3, 2),
            "t_hess_ms": round(cb["t_hess"] * 1e3, 2),
            "solve_s": round(stats.solve_time, 3),
            "iters": int(stats.iter),
            "ms_per_iter": round(stats.solve_time / max(int(stats.iter), 1)
                                 * 1e3, 2),
            "status": int(stats.status),
            "backsolves": stats.counters["backsolve_cnt"],
            "setup_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    sizes = tuple(int(a) for a in sys.argv[1:]) or (600, 1500, 3000, 5000)
    main(sizes)
