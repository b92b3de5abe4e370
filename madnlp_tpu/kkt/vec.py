"""KKT right-hand-side / direction vectors.

TPU-native re-design of the reference's ``UnreducedKKTVector``
(``/root/reference/src/KKT/rhs.jl:90-184``): where the reference stores one
flat buffer with unsafe-wrapped segment views and index-gathered ``xp_lr``
sub-views, we keep a NamedTuple of four *full-length masked* arrays:

* ``xp``  (nw,)  primal (variables + slacks)
* ``y``   (m,)   constraint duals
* ``zl``  (nw,)  lower-bound duals — zero where the component has no lower bound
* ``zu``  (nw,)  upper-bound duals — zero where no upper bound

Masked full-length storage removes every gather/scatter from the hot path:
all IPM kernels become fused elementwise VPU ops of static shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KKTVec(NamedTuple):
    xp: jax.Array
    y: jax.Array
    zl: jax.Array
    zu: jax.Array

    def axpy(self, alpha, other: "KKTVec") -> "KKTVec":
        return KKTVec(*(a + alpha * b for a, b in zip(self, other)))

    def scale(self, alpha) -> "KKTVec":
        return KKTVec(*(alpha * a for a in self))


def kkt_zeros(nw: int, m: int, dtype=jnp.float64) -> KKTVec:
    return KKTVec(
        xp=jnp.zeros((nw,), dtype),
        y=jnp.zeros((m,), dtype),
        zl=jnp.zeros((nw,), dtype),
        zu=jnp.zeros((nw,), dtype),
    )


def norm_inf(v: KKTVec) -> jax.Array:
    return jnp.maximum(
        jnp.maximum(_amax(v.xp), _amax(v.y)),
        jnp.maximum(_amax(v.zl), _amax(v.zu)),
    )


def _amax(x):
    return jnp.max(jnp.abs(x)) if x.size else jnp.zeros((), x.dtype)
