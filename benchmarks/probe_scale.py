"""On-chip scale sweep: per-iteration cost and factorization attribution
at nb=600..5000, for BOTH banded backends — the plain sequential kernel
and the round-4 SPIKE partitioned kernel (ops/spike.py), whose vmapped
interior chains are the depth cut the MFU analysis called for
(docs/benchmarks.md "roofline"; VERDICT r3 next #2).

Times build+factorize and one refined backsolve (dispatch-corrected
chains), one full IPM step, the model-eval callbacks, and the full
device-timed solve at each scale.  MFU is reported against the USEFUL
N·w² roofline (the spike kernel's ~3x extra spike-solve flops are
overhead, not useful work — same denominator keeps configs comparable).

Run on the TPU:  nohup python benchmarks/probe_scale.py &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from madnlp_tpu import LinearSolver, MadNLPSolver
from madnlp_tpu.models.instances import opf
from madnlp_tpu.utils import flops as F
from madnlp_tpu.utils.timing import timing_callbacks, timing_linear_solver


def run_one(nb, config, block=None):
    dev = jax.devices()[0].platform
    t0 = time.time()
    model = opf.build_sparse(nb=nb, seed=0)
    kw = {} if block is None else {"ldl_block_size": block}
    if config == "spike":
        kw["banded_partitions"] = -1
    sv = MadNLPSolver(model, dtype="float32",
                      linear_solver=LinearSolver.BANDED, **kw)
    bs = sv.kernel.kkt.bstruct
    spike = getattr(sv.kernel.kkt, "_spike", None)
    if config == "spike" and spike is None:
        print(json.dumps({"nb": nb, "config": config,
                          "skipped": "spike did not activate (band too short)"}),
              flush=True)
        return
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
    rl = F.banded_roofline(bs, lin["t_build_factorize"])
    # full solve, timed on device (stats.solve_time excludes host-side
    # stats extraction — the round-2 'blow-up' numbers did not)
    stats = sv.solve_jitted()
    stats = sv.solve_jitted()
    rec = {
        "nb": nb, "config": config, "N": bs.N, "b": bs.b, "bw": bs.bw,
        "device": dev,
        "t_fact_ms": round(lin["t_build_factorize"] * 1e3, 2),
        "t_solve_ms": round(lin["t_backsolve"] * 1e3, 2),
        "t_step_ms": round(t_step * 1e3, 2),
        "t_jac_ms": round(cb["t_jac"] * 1e3, 2),
        "t_hess_ms": round(cb["t_hess"] * 1e3, 2),
        "mfu_pct": round(100 * rl.mfu, 2),
        "solve_s": round(stats.solve_time, 3),
        "iters": int(stats.iter),
        "ms_per_iter": round(stats.solve_time / max(int(stats.iter), 1)
                             * 1e3, 2),
        "status": int(stats.status),
        "backsolves": stats.counters["backsolve_cnt"],
        "setup_s": round(time.time() - t0, 1),
    }
    if spike is not None:
        rec["spike"] = {
            "P": spike.P, "sg": [int(x) for x in spike.sg],
            "Ni": spike.Ni, "hw": spike.hw, "tw": spike.tw,
        }
    print(json.dumps(rec), flush=True)


def main(sizes=(600, 1500, 3000, 5000), configs=("plain", "spike"),
         block=None):
    for nb in sizes:
        for config in configs:
            run_one(nb, config, block=block)


if __name__ == "__main__":
    sizes = tuple(int(a) for a in sys.argv[1:] if a.isdigit()) or (
        600, 1500, 3000, 5000)
    cfgs = ("spike",) if "--spike-only" in sys.argv else (
        ("plain",) if "--plain-only" in sys.argv else ("plain", "spike"))
    main(sizes, cfgs)
