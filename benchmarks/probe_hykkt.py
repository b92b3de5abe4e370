"""HyKKT end-to-end tuning probe (VERDICT r1 #4): gamma / cg_tol schedule
sweep at nb=600, f32 and f64, against the LDLt reference trajectory.

CPU (trajectory quality):  python benchmarks/probe_hykkt.py cpu
TPU (wall clock):          nohup python benchmarks/probe_hykkt.py tpu &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(device="cpu", nb=600):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from madnlp_tpu import KKTSystem, LinearSolver, MadNLPSolver, Status
    from madnlp_tpu.models.instances import opf

    model = opf.build(nb=nb, seed=0)  # dense-Ybus (the HYKKT path is dense)

    def run(**kw):
        sv = MadNLPSolver(model, kkt_system=KKTSystem.DENSE, **kw)
        st = sv.solve_jitted()  # compile+warm
        st = sv.solve_jitted()
        return st, st.solve_time  # device wall (round-3 timing fix)

    ref, wall_ref = run(linear_solver=LinearSolver.LDL, dtype="float32")
    print(json.dumps({"cfg": "LDL-f32-ref", "iter": int(ref.iter),
                      "status": int(ref.status),
                      "obj": float(ref.objective),
                      "wall": round(wall_ref, 2),
                      "iter_per_s": round(ref.iter / wall_ref, 2)}),
          flush=True)

    if device == "tpu":
        # on-chip: walls only, for the configs the CPU trajectory sweep
        # already validated (docs/benchmarks.md "HyKKT conclusion") —
        # each config is a minutes-long whole-solver compile over the
        # tunnel, so the 24-config grid is CPU-only.  The backend
        # dimension (VERDICT r4 #3): the auto "ldl" backend everywhere,
        # plus "native" XLA cholesky ONLY at small nb — embedding native
        # cholesky at KKT sizes ≳1500 in a whole-solver program faults
        # the TPU device (CLAUDE.md known environment bug), and a faulted
        # device wedges the single-client tunnel
        grid = [("float32", None, 1e-4, None), ("float32", None, 1e-2, None),
                ("float64", None, 1e-4, None)]
        if nb <= 300:
            grid += [("float32", None, 1e-4, "native"),
                     ("float64", None, 1e-4, "native")]
    else:
        grid = [(d, g, c, None) for d in ("float32", "float64")
                for g in (None, 1e4, 1e5, 1e6)
                for c in (1e-2, 1e-4, 1e-6)]
    for dtype, gamma, cg_tol, backend in grid:
        try:
            st, wall = run(
                linear_solver=LinearSolver.HYKKT, dtype=dtype,
                hykkt_gamma=gamma, hykkt_cg_tol=cg_tol,
                hykkt_backend=backend,
            )
            ok = st.status in (Status.SOLVE_SUCCEEDED,
                               Status.SOLVED_TO_ACCEPTABLE_LEVEL)
            print(json.dumps({
                "cfg": f"HYKKT-{dtype[-2:]}-g{gamma}-ct{cg_tol}"
                       + (f"-{backend}" if backend else ""),
                "iter": int(st.iter), "status": int(st.status),
                "obj": float(st.objective),
                "obj_rel_err": abs(float(st.objective)
                                   - float(ref.objective))
                / abs(float(ref.objective)),
                "iter_delta_vs_ref": int(st.iter) - int(ref.iter),
                "wall": round(wall, 2),
                "iter_per_s": round(st.iter / wall, 2),
                "ok": bool(ok),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            print(json.dumps({
                "cfg": f"HYKKT-{dtype[-2:]}-g{gamma}-ct{cg_tol}"
                       + (f"-{backend}" if backend else ""),
                "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "cpu",
         int(sys.argv[2]) if len(sys.argv) > 2 else 600)
