"""Unit tests for the on-device topology manager primitives."""

import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu.engine import topo
from chemlab_tpu.engine.state import TermTable


def make_adj(n, deg, edges):
    adj = np.full((n, deg), -1, np.int32)
    cnt = np.zeros(n, np.int32)
    for i, j in edges:
        adj[i, cnt[i]] = j
        adj[j, cnt[j]] = i
        cnt[i] += 1
        cnt[j] += 1
    return jnp.asarray(adj)


def test_adj_add_remove():
    adj = make_adj(6, 4, [(0, 1), (1, 2)])
    adj2, ov = topo.adj_add_edge(adj, jnp.asarray(2), jnp.asarray(3))
    assert not bool(ov)
    assert bool(topo.adj_has_edge(adj2, 2, 3))
    assert bool(topo.adj_has_edge(adj2, 3, 2))
    adj3 = topo.adj_remove_edge(adj2, jnp.asarray(2), jnp.asarray(3))
    assert not bool(topo.adj_has_edge(adj3, 2, 3))
    # no-op on disabled
    adj4, ov = topo.adj_add_edge(adj, jnp.asarray(4), jnp.asarray(5),
                                 jnp.asarray(False))
    assert np.array_equal(np.asarray(adj4), np.asarray(adj))


def test_adj_overflow_flag():
    adj = make_adj(4, 2, [(0, 1), (0, 2)])
    _, ov = topo.adj_add_edge(adj, jnp.asarray(0), jnp.asarray(3))
    assert bool(ov)


def test_relabel_components():
    # chain 0-1-2, pair 3-4, isolated 5
    adj = make_adj(6, 4, [(0, 1), (1, 2), (3, 4)])
    lab = np.asarray(topo.relabel_components(adj, jnp.ones(6, bool)))
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4]
    assert lab[0] != lab[3] != lab[5]


def test_relabel_long_chain():
    n = 300
    edges = [(i, i + 1) for i in range(n - 1)]
    adj = make_adj(n, 2, edges)
    lab = np.asarray(topo.relabel_components(adj, jnp.ones(n, bool)))
    assert np.all(lab == lab[0])


def test_merge_molecules():
    mol = jnp.asarray([0, 0, 2, 2, 4], jnp.int32)
    merged = np.asarray(topo.merge_molecules(mol, jnp.asarray(1), jnp.asarray(2)))
    assert merged.tolist() == [0, 0, 0, 0, 4]


def test_enumerate_new_angles():
    # star: 0-1 existing, new edge (1, 2); adj already contains the new edge
    adj = make_adj(5, 4, [(0, 1), (1, 2), (2, 3)])
    idx, valid = topo.enumerate_new_angles(adj, jnp.asarray(1), jnp.asarray(2))
    got = {tuple(r) for r, v in zip(np.asarray(idx), np.asarray(valid)) if v}
    assert got == {(0, 1, 2), (1, 2, 3)}


def test_enumerate_new_dihedrals():
    # path 0-1-2-3-4, new edge = (2, 3)
    adj = make_adj(5, 4, [(0, 1), (1, 2), (2, 3), (3, 4)])
    idx, valid = topo.enumerate_new_dihedrals(adj, jnp.asarray(2), jnp.asarray(3))
    got = {tuple(r) for r, v in zip(np.asarray(idx), np.asarray(valid)) if v}
    assert (1, 2, 3, 4) in got
    assert (0, 1, 2, 3) in got
    # every returned quad must contain the new edge (2,3) consecutively
    for quad in got:
        pairs = {tuple(sorted(p)) for p in zip(quad, quad[1:])}
        assert (2, 3) in pairs


def test_table_append_and_overflow():
    t = TermTable.create(4, 2, [(0, 1)], [1], [[1.0, 2.0]])
    cand = jnp.asarray([[2, 3], [4, 5], [6, 7]], jnp.int32)
    funcs = jnp.asarray([1, 1, 1], jnp.int32)
    pars = jnp.zeros((3, 6), jnp.float32)
    valid = jnp.asarray([True, False, True])
    t2, ov = topo.table_append(t, cand, funcs, pars, valid)
    assert not bool(ov)
    assert int(t2.count) == 3
    rows = np.asarray(t2.idx[:3])
    assert rows.tolist() == [[0, 1], [2, 3], [6, 7]]
    # overflow: capacity 4, two more valid rows
    t3, ov = topo.table_append(t2, cand, funcs, pars, jnp.asarray([True, True, True]))
    assert bool(ov)
    assert int(t3.count) == 4


def test_invalidate_terms_with_edges():
    angles = TermTable.create(4, 3, [(0, 1, 2), (1, 2, 3), (3, 4, 5)],
                              [1, 1, 1], np.zeros((3, 2)))
    edges = jnp.asarray([[1, 2]], jnp.int32)
    t2, hit = topo.invalidate_terms_with_edges(angles, edges, jnp.asarray([True]))
    assert np.asarray(hit)[:3].tolist() == [True, True, False]
    assert np.asarray(t2.valid)[:3].tolist() == [False, False, True]


def test_excl_append_remove():
    excl = jnp.full((8, 2), -1, jnp.int32).at[0].set(jnp.asarray([0, 1]))
    n = jnp.asarray(1, jnp.int32)
    pairs = jnp.asarray([[2, 3], [4, 5]], jnp.int32)
    excl2, n2, ov = topo.excl_append(excl, n, pairs, jnp.asarray([True, True]))
    assert int(n2) == 3 and not bool(ov)
    excl3 = topo.excl_remove(excl2, jnp.asarray([[3, 2]], jnp.int32),
                             jnp.asarray([True]))
    rows = {tuple(r) for r in np.asarray(excl3) if r[0] >= 0}
    assert rows == {(0, 1), (4, 5)}


def test_bfs_distances():
    # chain 0-1-2-3-4
    adj = make_adj(5, 2, [(0, 1), (1, 2), (2, 3), (3, 4)])
    d = np.asarray(topo.bfs_distances(adj, jnp.asarray(0), 3))
    assert d.tolist() == [0, 1, 2, 3, 4]  # 4 == max_level+1 (unreached)
    d = np.asarray(topo.bfs_distances(adj, jnp.asarray(-1), 3))
    assert np.all(d == 4)
