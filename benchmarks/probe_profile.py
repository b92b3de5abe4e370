"""Per-phase attribution of the flagship solve (VERDICT r2 weak #3).

Splits the banded linear-solver wall into assemble / Ruiz / scale /
factorize / triangular-solve and measures both banded backends (Pallas
streaming vs XLA fori_loop) plus the callback and whole-step times, so
the 0.9%-MFU factorization and the 71 ms/iter gap are attributed to
specific operations instead of guessed at.

Usage:  python benchmarks/probe_profile.py [nb600|case118|nb3000] [block]
Writes one JSON line per measurement (stdout), suitable for pasting into
docs/benchmarks.md.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _avg(fn, ntrials=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ntrials):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / ntrials


def make_model(spec):
    import os

    if spec.startswith("case"):
        from madnlp_tpu.models import matpower

        case = matpower.parse_case(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tests", "data", f"{spec}.m"))
        return matpower.build_acopf(case, sparse=True)
    from madnlp_tpu.models.instances import opf

    return opf.build_sparse(nb=int(spec[2:]), seed=0)


def main(spec="nb600", block=None):
    from madnlp_tpu import LinearSolver, MadNLPSolver
    from madnlp_tpu.utils import flops as F

    model = make_model(spec)
    rows = {}

    for backend in ("pallas", "xla"):
        kw = dict(linear_solver=LinearSolver.BANDED, dtype="float32",
                  banded_backend=backend)
        if block:
            kw["ldl_block_size"] = int(block)
        solver = MadNLPSolver(model, **kw)
        kern = solver.kernel
        kkt = kern.kkt
        bs = kkt.bstruct
        st = solver._init_fn()
        zero = jnp.zeros(())
        ctx = jax.jit(lambda: kern._factorize(st, zero, zero))()
        jax.block_until_ready(ctx)

        # reconstruct the assembly inputs exactly as build_and_factorize does
        vals = jnp.concatenate(
            [ctx.pr_diag, ctx.du_diag, ctx.jac, ctx.hess])

        from madnlp_tpu.ops.banded import (
            banded_symmetrize, ruiz_band, scale_band)

        @jax.jit
        def assemble():
            return bs.assemble(kkt.band_idx_sorted, vals[kkt.band_order],
                               vals.dtype, sorted_indices=True)

        raw = assemble()

        @jax.jit
        def symm():
            return banded_symmetrize(bs, raw)

        raw_sym = symm()

        @jax.jit
        def ruiz():
            return ruiz_band(bs, raw_sym)

        d_perm = ruiz()

        @jax.jit
        def scale():
            return scale_band(bs, raw, d_perm).astype(kkt.fact_dtype)

        band = scale()

        @jax.jit
        def factorize():
            return kkt._band_factorize(bs, band)

        fac = factorize()
        rhs1 = jnp.ones((bs.N,), kkt.fact_dtype)

        @jax.jit
        def solve1():
            return kkt._band_solve(bs, fac, rhs1)

        rhs_vec = kern._aug_rhs(st, st.c, st.mu)

        @jax.jit
        def refined():
            return kkt.solve_refine(ctx, rhs_vec)[0]

        @jax.jit
        def build_fact():
            return kern._factorize(st, zero, zero)

        r = {
            "assemble_ms": _avg(assemble) * 1e3,
            "symmetrize_ms": _avg(symm) * 1e3,
            "ruiz_ms": _avg(ruiz) * 1e3,
            "scale_ms": _avg(scale) * 1e3,
            "factorize_ms": _avg(factorize) * 1e3,
            "solve1_ms": _avg(solve1) * 1e3,
            "refined_backsolve_ms": _avg(refined) * 1e3,
            "build_factorize_total_ms": _avg(build_fact) * 1e3,
        }
        rl = F.banded_roofline(bs, r["factorize_ms"] / 1e3)
        r["factorize_gflops"] = round(rl.achieved_gflops, 1)
        r["factorize_mfu_pct"] = round(100 * rl.mfu, 2)
        r["roofline_us"] = round(rl.t_roofline_s * 1e6, 1)
        rows[backend] = {k: round(v, 3) if isinstance(v, float) else v
                         for k, v in r.items()}
        print(json.dumps({"backend": backend, "geometry": {
            "N": bs.N, "b": bs.b, "bw": bs.bw, "nb": bs.nb}, **rows[backend]}),
            flush=True)

        if backend == "pallas":
            # callbacks + one whole step + full solve, flagship backend only
            from madnlp_tpu.utils.timing import timing_callbacks

            cb = timing_callbacks(solver, ntrials=10)
            step = jax.jit(kern.regular_step)
            t_step = _avg(lambda: step(st), ntrials=5)
            stats = solver.solve_jitted()
            t0 = time.time()
            stats = solver.solve_jitted()
            wall = time.time() - t0
            print(json.dumps({
                "callbacks_ms": {k: round(v * 1e3, 3) for k, v in cb.items()},
                "regular_step_ms": round(t_step * 1e3, 2),
                "solve_wall_s": round(wall, 3),
                "iters": int(stats.iter),
                "iter_per_s": round(int(stats.iter) / wall, 2),
                "status": int(stats.status),
            }), flush=True)


if __name__ == "__main__":
    spec = sys.argv[1] if len(sys.argv) > 1 else "nb600"
    block = sys.argv[2] if len(sys.argv) > 2 else None
    main(spec, block)
