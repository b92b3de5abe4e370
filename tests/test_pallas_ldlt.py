"""Pallas LDLᵀ kernel — numerics validated in interpreter mode (CPU).

Status: experimental.  The kernel traces and runs correctly under the
Pallas interpreter; compiled-mode status on the current remote Mosaic
compile service is documented in ops/pallas_ldlt.py (the per-piece kernels
compile; the full factorization kernel compiles extremely slowly).  Not
wired into the default solve path yet."""

import jax.numpy as jnp
import numpy as np
import pytest

from madnlp_tpu.ops import ldlt
from madnlp_tpu.ops.pallas_ldlt import pallas_ldlt


@pytest.mark.parametrize("n,m", [(128, 30), (256, 50), (300, 60)])
def test_pallas_ldlt_interpret(n, m):
    rng = np.random.default_rng(n)
    H = rng.standard_normal((n - m, n - m))
    H = H @ H.T + n * np.eye(n - m)
    J = rng.standard_normal((m, n - m))
    K = jnp.asarray(
        np.block([[H, J.T], [J, np.zeros((m, m))]]), dtype=jnp.float32
    )
    f = pallas_ldlt(K, block=128, interpret=True)
    rec = f.L[:n, :n] @ jnp.diag(f.d[:n]) @ f.L[:n, :n].T
    err = float(jnp.max(jnp.abs(rec - K)) / jnp.max(jnp.abs(K)))
    assert err < 5e-6  # f32
    pos, zero, neg = ldlt.ldlt_inertia(f)
    assert int(pos) == n - m and int(zero) == 0 and int(neg) == m
