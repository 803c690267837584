"""Dense-static bonded operands: chain terms on rolled planes.

The per-step bonded pass costs one 16-byte-row gather forward and one
scatter-add backward over every term-endpoint slot; at 100k that scatter
is ~5.2 ms and is not beatable by any index-order or layout variant
(TPU_NUMBERS_r04.md "Bonded-pass anatomy").  But almost every STATIC
term in a chain topology has endpoints at fixed small offsets from a
base particle (bonds (b, b+1), angles (b, b+1, b+2) — GROMACS molecule
blocks number atoms consecutively), so the evaluation can instead run on
SHIFTED COPIES of the particle plane: term slot = base particle id,
endpoint k read from ``jnp.roll(pos4, -k)``.  Rolls are sequential
copies (~free on v5e HBM), and reverse-mode AD through a roll is the
inverse roll — zero gather, zero scatter.  Measured: the whole static
bonds+angles pass this way is 2.37 ms at 100k vs 8.13 ms for the
gather/AD/scatter form.

This module derives, from the canonical TermTables (which stay the
single source of truth — the reactive layer is untouched), the aligned
DENSE operands plus a compacted IRREGULAR remainder table for terms that
do not fit the offset pattern (reaction-created bonds between arbitrary
pairs, ring/branch closures).  Derivation is jit-friendly and runs at
build time and at the end of every reaction interval, the only places
term tables change.

Layout invariants of a dense table (arity A):
  - capacity == N_pad, row b owns the term whose endpoints are
    (b, b+1, ..., b+A-1); idx rows are filled accordingly so the
    standard ``TermTable.valid`` / ``_resolve`` machinery applies.
  - a dead slot has idx[-1]s, func 0, lam 1, group -1 (same as padding
    rows of the canonical tables).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .state import I32, TermTable

__all__ = ["derive_aligned", "roll_rows", "rederive"]


def roll_rows(pos4, arity: int):
    """(N, arity, 4) endpoint rows for a dense table: endpoint k is the
    particle plane rolled UP by k (row b sees particles b..b+arity-1).
    The boundary wrap rows are dead by construction (a term based within
    arity of N_pad would run off the store; derivation never claims
    them)."""
    return jnp.stack([jnp.roll(pos4, -k, axis=0) for k in range(arity)],
                     axis=1)


def _scatter_columns(table: TermTable, sel, base, n: int, arity: int):
    """Dense TermTable: scatter the selected rows' columns to slot=base."""
    dest = jnp.where(sel, base, n)      # n = dropped
    idx = jnp.full((n, arity), -1, I32)
    for k in range(arity):
        idx = idx.at[dest, k].set(base + k, mode="drop")
    return TermTable(
        idx=idx,
        func=jnp.zeros(n, I32).at[dest].set(table.func, mode="drop"),
        params=jnp.zeros((n, table.params.shape[1]), table.params.dtype)
                  .at[dest].set(table.params, mode="drop"),
        typelookup=jnp.zeros(n, bool).at[dest].set(table.typelookup,
                                                   mode="drop"),
        lam=jnp.ones(n, table.lam.dtype).at[dest].set(table.lam, mode="drop"),
        group=jnp.full(n, -1, I32).at[dest].set(table.group, mode="drop"),
        count=jnp.asarray(n, I32),
    )


def _compact(table: TermTable, sel, irr_cap: int):
    """Compact the selected rows into an ``irr_cap``-row TermTable."""
    dest = jnp.cumsum(sel.astype(I32)) - 1
    overflow = jnp.any(sel & (dest >= irr_cap))
    dest = jnp.where(sel & (dest < irr_cap), dest, irr_cap)
    arity = table.idx.shape[1]
    out = TermTable(
        idx=jnp.full((irr_cap, arity), -1, I32).at[dest].set(table.idx,
                                                             mode="drop"),
        func=jnp.zeros(irr_cap, I32).at[dest].set(table.func, mode="drop"),
        params=jnp.zeros((irr_cap, table.params.shape[1]),
                         table.params.dtype).at[dest].set(table.params,
                                                          mode="drop"),
        typelookup=jnp.zeros(irr_cap, bool).at[dest].set(table.typelookup,
                                                         mode="drop"),
        lam=jnp.ones(irr_cap, table.lam.dtype).at[dest].set(table.lam,
                                                            mode="drop"),
        group=jnp.full(irr_cap, -1, I32).at[dest].set(table.group,
                                                      mode="drop"),
        count=jnp.minimum(jnp.sum(sel.astype(I32)), irr_cap),
    )
    return out, overflow


def derive_aligned(table: TermTable, n: int, irr_cap: int):
    """Split a canonical TermTable into (dense, irregular, overflow).

    A row is ALIGNED when its endpoint ids are exactly (b, b+1, ..,
    b+A-1) in some order for bonds (A=2, orientation normalized) or in
    the stored order for A>2 (angle/dihedral geometry is
    orientation-sensitive, so only forward-consecutive rows go dense;
    reversed-consecutive rows evaluate identically through the
    irregular path), the base claims a free dense slot, and the term
    does not run off the particle store.  First claim wins on the rare
    duplicate base (a duplicated bond row); losers stay irregular.
    ``overflow`` is sticky-flag material: the irregular remainder did
    not fit ``irr_cap``.
    """
    arity = table.idx.shape[1]
    valid = table.idx[:, 0] >= 0
    if arity == 2:
        i, j = table.idx[:, 0], table.idx[:, 1]
        base = jnp.minimum(i, j)
        aligned = valid & (jnp.maximum(i, j) == base + 1)
    else:
        base = table.idx[:, 0]
        aligned = valid
        for k in range(1, arity):
            aligned = aligned & (table.idx[:, k] == base + k)
    aligned = aligned & (base >= 0) & (base + arity - 1 < n)

    # claim: lowest row id wins a contested base slot
    rows = jnp.arange(table.capacity, dtype=I32)
    claim = jnp.full(n, jnp.iinfo(jnp.int32).max, I32).at[
        jnp.where(aligned, base, n)].min(rows, mode="drop")
    claimed = aligned & (claim[jnp.clip(base, 0, n - 1)] == rows)

    dense = _scatter_columns(table, claimed, base, n, arity)
    irr, overflow = _compact(table, valid & ~claimed, irr_cap)
    return dense, irr, overflow


def rederive(cfg, state):
    """Refresh the dense/irregular operands from the canonical tables
    (jit-friendly; call wherever bonds/angles may have changed — the end
    of a reaction interval, build, term-cap repad).  Any irregular-
    capacity overflow folds into the sticky flag; by the lockstep-growth
    invariant (irr_cap tracks cap - n_aligned_static, spec.py) it cannot
    fire unless the invariant is broken."""
    if not cfg.bonded_dense:
        return state
    n = state.pos.shape[0]
    bdn, bir, o1 = derive_aligned(state.bonds, n, cfg.bond_irr_cap)
    adn, air, o2 = derive_aligned(state.angles, n, cfg.angle_irr_cap)
    nbr = dataclasses.replace(state.nbr,
                              overflow=state.nbr.overflow | o1 | o2)
    return dataclasses.replace(state, bonds_dense=bdn, bonds_irr=bir,
                               angles_dense=adn, angles_irr=air, nbr=nbr)
