"""On-device topology manager.

TPU-native replacement for espressopp's ``integrator.TopologyManager``
(ref: SURVEY.md §2.3; chemlab call sites start_simulation.py:397-441):
the global bond graph lives as a fixed-degree adjacency table ``adj (N, DEG)``
plus the padded TermTables; this module provides the shape-static primitives
the reaction kernel composes:

  - adjacency edge insert/remove
  - molecule-id maintenance: pairwise merges on bond creation, and a
    pointer-jumping connected-components relabel after bond removal
  - new angle/dihedral enumeration around a new bond (the
    register_triplet/register_quadruplet behavior: terms are created only
    when the per-type-signature parameter table has an entry)
  - term-table append with cursor + overflow flag
  - invalidation of angles/dihedrals containing removed edges

All functions are pure and jit-safe; indices are 0-based rows, -1 = padding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .state import TermTable

I32 = jnp.int32


# ---------------------------------------------------------------------------
# adjacency
# ---------------------------------------------------------------------------

def adj_add_edge(adj, i, j, enable=True):
    """Insert undirected edge (i, j) into the fixed-degree adjacency.

    Returns (adj, overflow).  No-op (and no overflow) when ``enable`` is
    False or i/j < 0.
    """
    deg_cap = adj.shape[1]
    valid = enable & (i >= 0) & (j >= 0)

    def insert(adj, a, b):
        row = adj[a]
        free = row < 0
        slot = jnp.argmax(free)          # first free slot
        ok = free[slot]
        new_row = row.at[jnp.where(ok, slot, deg_cap - 1)].set(
            jnp.where(ok, b, row[deg_cap - 1]))
        return adj.at[a].set(jnp.where(ok & valid, new_row, row)), ~ok & valid

    a = jnp.maximum(i, 0)
    b = jnp.maximum(j, 0)
    adj, ov1 = insert(adj, a, b)
    adj, ov2 = insert(adj, b, a)
    return adj, ov1 | ov2


def adj_remove_edge(adj, i, j, enable=True):
    """Remove undirected edge (i, j); silently no-op if absent."""
    valid = enable & (i >= 0) & (j >= 0)
    a = jnp.maximum(i, 0)
    b = jnp.maximum(j, 0)
    row_a = adj[a]
    row_b = adj[b]
    new_a = jnp.where(valid & (row_a == b), -1, row_a)
    new_b = jnp.where(valid & (row_b == a), -1, row_b)
    return adj.at[a].set(new_a).at[b].set(new_b)


def adj_has_edge(adj, i, j):
    return jnp.any(adj[jnp.maximum(i, 0)] == j) & (i >= 0) & (j >= 0)


# ---------------------------------------------------------------------------
# molecule ids
# ---------------------------------------------------------------------------

def merge_molecules(mol_id, i, j, enable=True):
    """Union the components of i and j: relabel max(a,b) -> min(a,b)."""
    valid = enable & (i >= 0) & (j >= 0)
    a = mol_id[jnp.maximum(i, 0)]
    b = mol_id[jnp.maximum(j, 0)]
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    return jnp.where(valid & (mol_id == hi), lo, mol_id)


def relabel_components(adj, active):
    """Connected components by min-label propagation with pointer jumping.

    Labels are particle rows, so ``label[label[i]]`` is path compression;
    combined with one hop of neighbor-min per iteration this converges in
    O(log N) iterations for any graph (espressopp recomputes residues inside
    the TopologyManager after bond removal; ref SURVEY.md §3.3).
    """
    n = adj.shape[0]
    idx = jnp.arange(n, dtype=I32)
    label0 = jnp.where(active, idx, idx)

    def body(state):
        label, _ = state
        nbr = jnp.where(adj >= 0, label[jnp.maximum(adj, 0)], n)
        new = jnp.minimum(label, jnp.min(nbr, axis=1).astype(I32))
        new = jnp.minimum(new, new[new])      # pointer jumping
        changed = jnp.any(new != label)
        return new, changed

    def cond(state):
        return state[1]

    label, _ = jax.lax.while_loop(
        cond, lambda s: body(s), (label0, jnp.asarray(True)))
    return label


# ---------------------------------------------------------------------------
# term-table edits
# ---------------------------------------------------------------------------

def table_append(table: TermTable, cand_idx, cand_func, cand_params, cand_valid,
                 typelookup=None, lam=None, group=None):
    """Append masked candidate rows to a TermTable at its cursor.

    cand_idx: (M, arity), cand_func: (M,), cand_params: (M, P),
    cand_valid: (M,) bool.  Returns (table, overflow).
    """
    cap = table.capacity
    m = cand_idx.shape[0]
    offs = jnp.cumsum(cand_valid.astype(I32)) - 1
    dest = table.count + offs
    overflow = jnp.any(cand_valid & (dest >= cap))
    dest = jnp.where(cand_valid & (dest < cap), dest, cap)  # drop junk
    new_idx = table.idx.at[dest].set(cand_idx, mode="drop")
    new_func = table.func.at[dest].set(cand_func, mode="drop")
    new_par = table.params.at[dest].set(cand_params, mode="drop")
    tl = jnp.ones(m, bool) if typelookup is None else typelookup
    new_tl = table.typelookup.at[dest].set(tl, mode="drop")
    lam_v = jnp.ones(m, table.lam.dtype) if lam is None else lam
    new_lam = table.lam.at[dest].set(lam_v, mode="drop")
    grp = jnp.full(m, -1, I32) if group is None else group
    new_grp = table.group.at[dest].set(grp, mode="drop")
    new_count = jnp.minimum(table.count + jnp.sum(cand_valid.astype(I32)), cap)
    return TermTable(idx=new_idx, func=new_func, params=new_par,
                     typelookup=new_tl, lam=new_lam, group=new_grp,
                     count=new_count), overflow


def invalidate_terms_with_edges(table: TermTable, edges, edge_valid):
    """Invalidate rows whose consecutive-index pairs include any given edge.

    edges: (E, 2) int32 removed bonds; edge_valid: (E,) bool.
    An angle (x,y,z) depends on edges (x,y),(y,z); a dihedral on
    (x,y),(y,z),(z,w).  Bonds (arity 2) match directly.
    """
    idx = table.idx  # (cap, arity)
    arity = idx.shape[1]
    hit = jnp.zeros(idx.shape[0], bool)
    for k in range(arity - 1):
        a, b = idx[:, k], idx[:, k + 1]
        lo = jnp.minimum(a, b)[:, None]
        hi = jnp.maximum(a, b)[:, None]
        elo = jnp.minimum(edges[:, 0], edges[:, 1])[None, :]
        ehi = jnp.maximum(edges[:, 0], edges[:, 1])[None, :]
        hit |= jnp.any((lo == elo) & (hi == ehi) & edge_valid[None, :], axis=1)
    hit &= table.valid
    new_idx = jnp.where(hit[:, None], -1, idx)
    return dataclasses.replace(table, idx=new_idx), hit


# ---------------------------------------------------------------------------
# new-term enumeration around a new bond
# ---------------------------------------------------------------------------

def enumerate_new_angles(adj, a, b):
    """All triples containing the (already inserted) edge (a, b).

    Returns (idx (2*DEG, 3), valid (2*DEG,)): (n, a, b) for n in adj[a]\\{b}
    and (a, b, m) for m in adj[b]\\{a}.
    """
    deg = adj.shape[1]
    na = adj[a]
    nb = adj[b]
    v1 = (na >= 0) & (na != b)
    v2 = (nb >= 0) & (nb != a)
    t1 = jnp.stack([na, jnp.full(deg, a, I32), jnp.full(deg, b, I32)], axis=1)
    t2 = jnp.stack([jnp.full(deg, a, I32), jnp.full(deg, b, I32), nb], axis=1)
    return jnp.concatenate([t1, t2]), jnp.concatenate([v1, v2])


def enumerate_new_dihedrals(adj, a, b):
    """All quadruples containing the (already inserted) edge (a, b).

    Three path families: n-a-b-m (edge central), o-n-a-b and a-b-m-q (edge
    terminal).  Returns (idx (3*DEG*DEG, 4), valid).
    """
    deg = adj.shape[1]
    na = adj[a]                     # (DEG,)
    nb = adj[b]
    va = (na >= 0) & (na != b)
    vb = (nb >= 0) & (nb != a)

    # family 1: n - a - b - m
    n_ = jnp.repeat(na, deg)
    m_ = jnp.tile(nb, deg)
    v1 = jnp.repeat(va, deg) & jnp.tile(vb, deg) & (n_ != m_)
    f1 = jnp.stack([n_, jnp.full(deg * deg, a, I32),
                    jnp.full(deg * deg, b, I32), m_], axis=1)

    # family 2: o - n - a - b  (o in adj[n], n in adj[a]\{b})
    nn = adj[jnp.maximum(na, 0)]            # (DEG, DEG)
    o_ = nn.reshape(-1)
    n2 = jnp.repeat(na, deg)
    v2 = (jnp.repeat(va, deg) & (o_ >= 0) & (o_ != a) & (o_ != b))
    f2 = jnp.stack([o_, n2, jnp.full(deg * deg, a, I32),
                    jnp.full(deg * deg, b, I32)], axis=1)

    # family 3: a - b - m - q  (q in adj[m], m in adj[b]\{a})
    mm = adj[jnp.maximum(nb, 0)]
    q_ = mm.reshape(-1)
    m3 = jnp.repeat(nb, deg)
    v3 = (jnp.repeat(vb, deg) & (q_ >= 0) & (q_ != b) & (q_ != a))
    f3 = jnp.stack([jnp.full(deg * deg, a, I32), jnp.full(deg * deg, b, I32),
                    m3, q_], axis=1)

    return jnp.concatenate([f1, f2, f3]), jnp.concatenate([v1, v2, v3])


# ---------------------------------------------------------------------------
# exclusions
# ---------------------------------------------------------------------------

def excl_append(excl, n_excl, pairs, valid):
    """Append masked (M, 2) pairs to the flat exclusion list."""
    cap = excl.shape[0]
    offs = jnp.cumsum(valid.astype(I32)) - 1
    dest = n_excl + offs
    overflow = jnp.any(valid & (dest >= cap))
    dest = jnp.where(valid & (dest < cap), dest, cap)
    excl = excl.at[dest].set(pairs, mode="drop")
    return excl, jnp.minimum(n_excl + jnp.sum(valid.astype(I32)), cap), overflow


def excl_remove(excl, pairs, valid):
    """Remove exclusion pairs (unordered match); leaves -1 holes."""
    lo = jnp.minimum(excl[:, 0], excl[:, 1])[:, None]
    hi = jnp.maximum(excl[:, 0], excl[:, 1])[:, None]
    plo = jnp.minimum(pairs[:, 0], pairs[:, 1])[None, :]
    phi = jnp.maximum(pairs[:, 0], pairs[:, 1])[None, :]
    hit = jnp.any((lo == plo) & (hi == phi) & valid[None, :], axis=1)
    hit &= excl[:, 0] >= 0
    return jnp.where(hit[:, None], -1, excl)


def bfs_distances(adj, source, max_level: int):
    """Hop distance from ``source`` up to ``max_level`` (else max_level+1).

    Bounded breadth-first relaxation over the fixed-degree adjacency —
    the device analog of TopologyManager's neighbour BFS used by
    PostProcessChangeNeighboursProperty (ref: reaction_post_process.py:76-115).
    """
    n = adj.shape[0]
    big = max_level + 1
    dist = jnp.full(n, big, I32).at[jnp.maximum(source, 0)].set(
        jnp.where(source >= 0, 0, big))
    for _ in range(max_level):
        nbr_dist = jnp.where(adj >= 0, dist[jnp.maximum(adj, 0)], big)
        dist = jnp.minimum(dist, jnp.min(nbr_dist, axis=1) + 1)
    return dist
