"""Standalone on-chip micro-benchmark of the banded factorize/solve
kernels at the flagship geometry — no solver jit, so each kernel's wall
is attributed directly (the whole-solver probe hid which phase was slow).

Usage: python benchmarks/probe_kernels.py [nb600|case118] [panels...]
"""

import json
import sys
import time

import numpy as np


def main(spec="nb600", panels=(0, 8, 16, 32, 64)):
    import jax
    import jax.numpy as jnp

    from benchmarks.probe_profile import make_model
    from madnlp_tpu import LinearSolver, MadNLPSolver
    from madnlp_tpu.ops import banded as B
    from madnlp_tpu.ops import pallas_banded_stream as PBS
    from madnlp_tpu.utils import flops as F

    model = make_model(spec)
    solver = MadNLPSolver(model, dtype="float32",
                          linear_solver=LinearSolver.BANDED)
    bs = solver.kernel.kkt.bstruct
    print(json.dumps({"geometry": {
        "N": bs.N, "b": bs.b, "bw": bs.bw, "nb": bs.nb,
        "band_MB": round(bs.flat_size * 4 / 1e6, 2)}}), flush=True)

    # synthetic quasidefinite band (diagonally dominant, mixed signs like
    # the Ruiz-scaled augmented KKT)
    rng = np.random.default_rng(0)
    nbp, bw, b = bs.nbp, bs.bw, bs.b
    band = rng.standard_normal((nbp, bw + 1, b, b)) * 0.1
    eye = np.eye(b)
    sgn = np.where(rng.uniform(size=b * nbp).reshape(nbp, b) < 0.7, 1.0, -1.0)
    for j in range(nbp):
        band[j, 0] = np.tril(band[j, 0]) + np.diag(3.0 * sgn[j])
    band = jnp.asarray(band, jnp.float32)

    def t(fn, n=10):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.time() - t0) / n

    results = {}
    fac = None
    for panel in panels:
        f = jax.jit(lambda band=band, panel=panel:
                    PBS.pallas_banded_factorize_stream(bs, band, panel=panel))
        t0 = time.time()
        fac = f()
        jax.block_until_ready(fac)
        compile_s = time.time() - t0
        wall = t(f)
        rl = F.banded_roofline(bs, wall)
        results[f"pallas_panel{panel}"] = {
            "ms": round(wall * 1e3, 3), "compile_s": round(compile_s, 1),
            "gflops": round(rl.achieved_gflops, 1),
            "mfu_pct": round(100 * rl.mfu, 2)}
        print(json.dumps({f"pallas_panel{panel}":
                          results[f"pallas_panel{panel}"]}), flush=True)

    fx = jax.jit(lambda: B.banded_factorize(bs, band))
    wall = t(fx, n=3)
    rl = F.banded_roofline(bs, wall)
    print(json.dumps({"xla": {"ms": round(wall * 1e3, 3),
                              "gflops": round(rl.achieved_gflops, 1),
                              "mfu_pct": round(100 * rl.mfu, 2)}}), flush=True)

    # cross-check: panel factor == scalar factor == xla factor on chip
    f_ref = jax.jit(lambda: PBS.pallas_banded_factorize_stream(
        bs, band, panel=0))()
    f_new = jax.jit(lambda: PBS.pallas_banded_factorize_stream(
        bs, band, panel=32))()
    f_x = fx()
    for name, fa, fb in (("panel_vs_scalar", f_new, f_ref),
                         ("panel_vs_xla", f_new, f_x)):
        db = float(jnp.max(jnp.abs(fa.d - fb.d)))
        bb = float(jnp.max(jnp.abs(fa.band - fb.band)))
        print(json.dumps({name: {"d_maxdiff": db, "band_maxdiff": bb}}),
              flush=True)

    # solve kernels
    rhs = jnp.asarray(rng.standard_normal(bs.N), jnp.float32)
    s1 = jax.jit(lambda: PBS.pallas_banded_solve_stream(bs, f_new, rhs))
    print(json.dumps({"pallas_solve1_ms": round(t(s1) * 1e3, 3)}), flush=True)
    sx = jax.jit(lambda: B.banded_solve(bs, f_new, rhs))
    print(json.dumps({"xla_solve1_ms": round(t(sx, 3) * 1e3, 3)}), flush=True)
    err = float(jnp.max(jnp.abs(s1() - sx())))
    print(json.dumps({"solve_maxdiff": err}), flush=True)


if __name__ == "__main__":
    spec = sys.argv[1] if len(sys.argv) > 1 else "nb600"
    panels = [int(a) for a in sys.argv[2:]] or (0, 8, 16, 32, 64)
    main(spec, panels)
