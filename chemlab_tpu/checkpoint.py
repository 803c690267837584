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


def save_state(path: str, state, cfg=None) -> None:
    """Write the MDState pytree; with ``cfg`` also record the neighbor
    capacities so a post-regrowth checkpoint can restore into a fresh
    build whose derived caps are smaller."""
    from .engine import build

    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {"__n__": np.asarray(len(leaves))}
    for i, leaf in enumerate(leaves):
        arrays["leaf_%d" % i] = np.asarray(leaf)
    if cfg is not None:
        arrays["__caps__"] = np.asarray(
            [getattr(cfg, f) for f in build.NEIGHBOR_CAP_FIELDS], np.int64)
        arrays["__term_caps__"] = np.asarray(
            [getattr(cfg, f) for f in build.TERM_CAP_FIELDS]
            + [state.excl.shape[0]], np.int64)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template, cfg=None, spec=None):
    """Restore into the template's pytree structure.

    With ``cfg``/``spec`` given, neighbor capacities recorded in the file
    are applied first (regrowing the template's scratch shapes), so
    checkpoints written after a ``grow_neighbor_caps`` regrowth restore
    into a freshly built system; returns ``(state, cfg)``.  Without them
    the legacy behavior applies (shapes must match; returns ``state``).
    """
    data = np.load(path)
    want_cfg = cfg is not None
    if want_cfg and "__caps__" in data:
        from .engine import build

        caps = {f: int(v) for f, v in zip(build.NEIGHBOR_CAP_FIELDS,
                                          data["__caps__"])}
        if any(getattr(cfg, f) != v for f, v in caps.items()):
            cfg, template = build.apply_neighbor_caps(cfg, spec, template,
                                                      caps)
    if want_cfg and "__term_caps__" in data:
        from .engine import build

        tvals = data["__term_caps__"]
        tcaps = {f: int(v) for f, v in zip(build.TERM_CAP_FIELDS, tvals)}
        excl_pair_cap = int(tvals[len(build.TERM_CAP_FIELDS)])
        if (any(getattr(cfg, f) != v for f, v in tcaps.items())
                or excl_pair_cap != template.excl.shape[0]):
            cfg, template = build.apply_term_caps(cfg, template, tcaps,
                                                  excl_pair_cap)
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
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return (state, cfg) if want_cfg else state
