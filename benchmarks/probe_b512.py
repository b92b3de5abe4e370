"""Wide-block MFU probe (round 5): the derived single-chain bound says
MFU₁ ≈ F_col/(L_col·peak), so wider blocks (F_col ~ b³, L_col sub-linear)
are the single-chip lever past the ~10% bound measured at b=256.  This
times the STREAMING FACTORIZE KERNEL ALONE (dispatch-corrected chained
timing, utils/timing.py style) on the flagship nb-ACOPF band geometry at
b ∈ {256, 512} and reports achieved GF/s + MFU.

Usage: python benchmarks/probe_b512.py [nb=5000]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(nb_case=5000, ntrials=8, interpret=False):
    from madnlp_tpu import LinearSolver, MadNLPSolver
    from madnlp_tpu.ops import pallas_banded_stream as pb
    from madnlp_tpu.utils import flops as F
    from madnlp_tpu.models.instances import opf

    model = opf.build_sparse(nb=nb_case, seed=0)
    # b=512 one-pass streaming is scoped-VMEM infeasible (est ~20 MB:
    # the 4·b² diagonal temporaries + masks dominate at bw=1); b=384 is
    # the widest 128-aligned block that fits
    for block in (256, 384, 512):
        solver = MadNLPSolver(
            model, dtype="float32", linear_solver=LinearSolver.BANDED,
            banded_block_size=block,
        )
        kkt = solver.kernel.kkt
        bs = kkt.bstruct
        if not pb.stream_fits_vmem(bs.b, bs.bw, bs.nbp):
            print(json.dumps({"b": block, "skip": "vmem-infeasible",
                              "bw": bs.bw}), flush=True)
            continue
        # diagonally dominant on-device band (tunnel: no big host uploads)
        idx = bs.map(*kkt._band_pattern()[:2])
        nvals = len(idx)

        @jax.jit
        def chain(seed):
            vals = 0.05 * jax.random.normal(
                jax.random.PRNGKey(seed), (nvals,), jnp.float32)
            band = bs.assemble(jnp.asarray(idx), vals, jnp.float32)
            eye = jnp.eye(bs.b, dtype=jnp.float32) * 50.0
            band = band.at[:, 0].add(eye)
            f = None
            for _ in range(ntrials):
                f = pb.pallas_banded_factorize_stream(
                    bs, band, interpret=interpret)
                band = band.at[0, 0, 0, 0].add(f.d[0] * 1e-30)
            return f.d

        d = chain(0)
        jax.block_until_ready(d)
        t0 = time.time()
        d = chain(1)
        jax.block_until_ready(d)
        t = (time.time() - t0) / ntrials
        fl = F.banded_factorize_flops(bs.nb, bs.b, bs.bw)
        peak, _ = F.device_peaks()
        print(json.dumps({
            "b": block, "bw": bs.bw, "nb_cols": bs.nb, "N": bs.N,
            "t_factorize_ms": round(t * 1e3, 2),
            "gflops": round(fl / t / 1e9, 1),
            "mfu_pct": round(100 * fl / t / peak, 2),
            "us_per_col": round(t * 1e6 / bs.nb, 1),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
