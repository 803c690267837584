"""Full device-state checkpointing.

The reference can only restart from its written .gro/.top (thermostat, RNG,
reaction, and topology runtime state are lost; SURVEY.md §5.4).  Here the
whole MDState pytree round-trips through one ``.npz`` file, so a resumed run
continues bit-exactly: positions/velocities/forces, dynamic bond/angle/
dihedral tables with lambdas and groups, exclusions, adjacency, molecule ids,
PRNG key, reaction rates/counters, FixDistances constraints, barostat piston.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

# Derived state excluded from the on-disk format: the dense/irregular bonded
# operands are pure functions of the canonical bonds/angles tables
# (engine.bonded_dense.rederive), so they are stripped on save and rebuilt on
# load.  This also makes checkpoints portable across the CHEMLAB_BONDED
# default flip — files never carry the derived subtrees either way.
_DERIVED_FIELDS = ("bonds_dense", "bonds_irr", "angles_dense", "angles_irr")
# derived exclusion operands (excl_dense.derive): same strip-and-rederive
# treatment, independently optional (feature is env-gated separately)
_DERIVED_EXCL = ("excl_masks", "excl_irr")


def _strip_derived(state):
    upd = {}
    if getattr(state, _DERIVED_FIELDS[0], None) is not None:
        upd.update({f: None for f in _DERIVED_FIELDS})
    if getattr(state, _DERIVED_EXCL[0], None) is not None:
        upd.update({f: None for f in _DERIVED_EXCL})
    return dataclasses.replace(state, **upd) if upd else state


def save_state(path: str, state, cfg=None) -> None:
    """Write the MDState pytree; with ``cfg`` also record the neighbor
    capacities so a post-regrowth checkpoint can restore into a fresh
    build whose derived caps are smaller."""
    from .engine import build

    leaves, treedef = jax.tree_util.tree_flatten(_strip_derived(state))
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
    has_dense = getattr(template, _DERIVED_FIELDS[0], None) is not None
    stripped = _strip_derived(template)
    leaves, treedef = jax.tree_util.tree_flatten(stripped)
    n = int(data["__n__"])
    if n != len(leaves):
        # migration: files written before the derived-subtree strip carry
        # the 4 dense/irregular TermTables as TRAILING leaves (the fields
        # are declared last in MDState) — accept and ignore them
        n_extra_ok = (len(jax.tree_util.tree_leaves(template))
                      - len(leaves)) if has_dense else 0
        if not (n_extra_ok and n == len(leaves) + n_extra_ok):
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
    if has_dense:
        # rebuild the derived operands from the restored canonical tables
        from .engine import bonded_dense

        npart = state.pos.shape[0]
        bdn, bir, _ = bonded_dense.derive_aligned(
            state.bonds, npart, template.bonds_irr.capacity)
        adn, air, _ = bonded_dense.derive_aligned(
            state.angles, npart, template.angles_irr.capacity)
        state = dataclasses.replace(state, bonds_dense=bdn, bonds_irr=bir,
                                    angles_dense=adn, angles_irr=air)
    if getattr(template, "excl_masks", None) is not None:
        # rebuild the derived exclusion operands from the restored flat
        # list (same strip-and-rederive contract as the bonded subtrees)
        if cfg is None or not cfg.excl_offsets:
            raise ValueError("template carries dense-exclusion operands; "
                             "pass cfg (with excl_offsets) to load_state")
        from .engine import excl_dense

        # a checkpoint written after mid-run growth can carry more
        # irregular pairs than a fresh build's irr cap: grow it first
        e = np.asarray(state.excl)
        ev = (e[:, 0] >= 0) & (e[:, 1] >= 0)
        n_irr = int((ev & ~np.isin(np.abs(e[:, 1] - e[:, 0]),
                                   cfg.excl_offsets)).sum())
        if n_irr + 128 > cfg.excl_irr_cap:
            cfg = dataclasses.replace(
                cfg, excl_irr_cap=-(-(n_irr + 128) // 128) * 128)
        masks, irr, _ = excl_dense.derive(
            state.excl, state.pos.shape[0], cfg.excl_offsets,
            cfg.excl_irr_cap)
        state = dataclasses.replace(state, excl_masks=masks, excl_irr=irr)
    return (state, cfg) if want_cfg else state
