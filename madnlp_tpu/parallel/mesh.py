"""Multi-host / multi-chip execution helpers.

The reference is a single-process solver with no distributed backend
(SURVEY.md §2.5: MUMPS built sequential, `src/LinearSolvers/mumps.jl:180`;
threads only for Schur scenario blocks, `src/KKT/Schur/schur.jl:953`).
The TPU-native distribution model implemented here:

* **instance batch axis ("dp")** — independent NLP instances (the cuDSS
  uniform-batching analogue lifted to whole solves) have *zero* cross-
  instance communication, so this axis maps onto **DCN** (cross-host) where
  bandwidth is scarce;
* **Schur scenario axis ("scen")** — per-scenario block factorizations are
  embarrassingly parallel and communicate only at the two Schur reduction
  points (an all-reduce of `Σ_k C_kᵀA_k⁻¹C_k` and of the coupling RHS,
  SURVEY.md §3.5), so this axis maps onto **ICI** (intra-slice) where the
  all-reduce is cheap.

Mechanics follow the standard recipe: build one `jax.sharding.Mesh` whose
slowest-varying axes are the DCN axes (`mesh_utils.create_hybrid_device_mesh`
puts same-slice devices contiguous), annotate array shardings
(`NamedSharding`/`with_sharding_constraint`), and let XLA GSPMD insert the
collectives.  No explicit `psum` calls are needed anywhere in the solver.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Initialize `jax.distributed` for multi-host execution.

    On TPU pods all arguments auto-detect from the environment; pass them
    explicitly for manual (e.g. GPU/CPU) clusters.  Safe to call twice."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def hybrid_mesh(
    ici_axes: Dict[str, int],
    dcn_axes: Optional[Dict[str, int]] = None,
    devices=None,
):
    """Build a `Mesh` with the DCN (cross-host) axes slowest-varying.

    ``hybrid_mesh({"scen": 4}, {"dp": 2})`` on 8 devices returns a
    ``(dp=2, scen=4)`` mesh where — under multi-host execution — each
    ``dp`` shard lives inside one host/slice (so "scen" collectives ride
    ICI and "dp" needs no communication at all).  On a single host the
    same named mesh is built over local devices, which is what the tests
    and the driver's virtual-device dry run exercise."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    dcn_axes = dcn_axes or {}
    names = tuple(dcn_axes) + tuple(ici_axes)
    if jax.process_count() > 1:
        ici_shape = tuple([1] * len(dcn_axes)) + tuple(ici_axes.values())
        dcn_shape = tuple(dcn_axes.values()) + tuple([1] * len(ici_axes))
        dev = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices
        )
    else:
        shape = tuple(dcn_axes.values()) + tuple(ici_axes.values())
        dev = (
            mesh_utils.create_device_mesh(shape, devices=devices)
            if devices is None or len(devices) == int(np.prod(shape))
            else np.asarray(devices).reshape(shape)
        )
    return Mesh(dev, names)


def batch_sharding(mesh, axis: str = "dp"):
    """NamedSharding placing a leading batch axis on ``axis`` (replicated
    over every other mesh axis) — pass to ``MadNLPSolver.solve_batch``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))


def scenario_sharding(mesh, axis: str = "scen"):
    """NamedSharding for the Schur scenario axis — pass as
    ``MadNLPSolver(..., schur_sharding=...)``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))
