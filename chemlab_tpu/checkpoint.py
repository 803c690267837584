"""Full device-state checkpointing.

The reference can only restart from its written .gro/.top (thermostat, RNG,
reaction, and topology runtime state are lost; SURVEY.md §5.4).  Here the
whole MDState pytree round-trips through one ``.npz`` file, so a resumed run
continues bit-exactly: positions/velocities/forces, dynamic bond/angle/
dihedral tables with lambdas and groups, exclusions, adjacency, molecule ids,
PRNG key, reaction rates/counters, FixDistances constraints, barostat piston.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {"__n__": np.asarray(len(leaves))}
    for i, leaf in enumerate(leaves):
        arrays["leaf_%d" % i] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template):
    """Restore into the template's pytree structure (shapes must match the
    build that produced the checkpoint — same inputs and capacities)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    n = int(data["__n__"])
    if n != len(leaves):
        raise ValueError("checkpoint has %d leaves, state needs %d"
                         % (n, len(leaves)))
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data["leaf_%d" % i]
        if arr.shape != tuple(leaf.shape):
            raise ValueError("leaf %d shape %s != expected %s — was the "
                             "checkpoint made with different inputs?"
                             % (i, arr.shape, tuple(leaf.shape)))
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
