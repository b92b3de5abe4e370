"""Scaling-efficiency measurements (BASELINE.md:29-30, VERDICT r1 #3).

Part A (real chip): batch-throughput scaling B=1..64 on parametric
ACOPF instances — the cuDSS-uniform-batch analogue.  Efficiency(B) =
throughput(B) / (B * throughput(1)) would be the strong-scaling number
for B devices; on ONE chip the meaningful number is throughput growth
until the chip saturates.

  nohup python benchmarks/probe_scaling.py chip &

Part B (8 virtual CPU devices): strong scaling of the Schur scenario
axis 1 -> 8 devices on a fixed 16-scenario problem.

  python benchmarks/probe_scaling.py mesh
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chip():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from madnlp_tpu import LinearSolver, MadNLPSolver
    from madnlp_tpu.models.instances import opf

    model = opf.build_parametric(nb=118, seed=0)
    sv = MadNLPSolver(model, dtype="float32",
                      linear_solver=LinearSolver.BANDED)
    rng = np.random.default_rng(0)
    base = None
    for B in (1, 8, 16, 32, 64):
        thetas = jnp.asarray(rng.uniform(-0.2, 0.2, (B,)))
        stb = sv.solve_batch(thetas)  # compile+warm (chunked auto)
        t0 = time.time()
        stb = sv.solve_batch(thetas)
        wall = time.time() - t0
        thr = B / wall
        if base is None:
            base = thr
        print(json.dumps({
            "B": B, "wall_s": round(wall, 2),
            "inst_per_s": round(thr, 3),
            "speedup_vs_B1": round(thr / base, 2),
            "batch_efficiency": round(thr / (B * base), 3),
        }), flush=True)


def mesh():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from madnlp_tpu import KKTSystem, MadNLPSolver
    from madnlp_tpu.models.instances import twostage

    model, ts = twostage.build(N=16, nv=40, nd=12, ms=20, n_eq=4)
    walls = {}
    for nd_ in (1, 2, 4, 8):
        devs = jax.devices()[:nd_]
        m = Mesh(np.array(devs), ("scen",))
        sv = MadNLPSolver(
            model, kkt_system=KKTSystem.SCHUR, schur_structure=ts,
            schur_sharding=NamedSharding(m, P("scen")),
        )
        st = sv.solve_jitted()
        t0 = time.time()
        st = sv.solve_jitted()
        walls[nd_] = time.time() - t0
        eff = walls[1] / (nd_ * walls[nd_])
        print(json.dumps({
            "devices": nd_, "wall_s": round(walls[nd_], 2),
            "iter": int(st.iter),
            "speedup": round(walls[1] / walls[nd_], 2),
            "scaling_efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    (chip if mode == "chip" else mesh)()
