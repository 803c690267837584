"""RemoveNeighboursBonds: >max_rm matching bonds must raise the sticky
overflow flag instead of silently leaving stale angles/exclusions behind
(ref: reaction_post_process.py:117-137; repo reactions._remove_neighbour_bonds).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import reaction_parser, testsystems, topfile
from chemlab_tpu.engine import build, reactions, runner, topo
from chemlab_tpu.engine.state import N_BOND_PARAMS
from chemlab_tpu.topology import compile_system_topology

RB_CFG = """
[general]
interval: 10

[ext_rm]
ext_type:RemoveNeighboursBonds
bonds_to_remove=FA->MA:ML:1
invoke_on=type_1

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97
extensions:rm

[reaction_r]
reaction: MA(1,2) + MA(1,2) -> FA(1):DA(1)
cutoff: 1.5
rate: 400.0
active: True
group: g1
"""


def _build(n_hubs: int):
    """Reactive trimer melt where particle 0 (MA) is additionally bonded to
    the ML hub of `n_hubs` foreign trimers. Each hub carries 2 (MA,ML)
    bonds at BFS level 1 from particle 0, plus particle 0's own trimer
    contributes 1; the event partner (particle 3) turns DA first, removing
    one of hub 4's hits — net level-1 hits = 2*n_hubs.
    """
    top = topfile.parse_lines(
        testsystems._melt_topology_text(40).splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(40, 0.4, seed=5)
    rcfg = reaction_parser.parse_config_lines(RB_CFG.splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, gen_velocity=True, rng_seed=5,
                            max_events=8)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)

    hubs = [3 * (k + 1) + 1 for k in range(n_hubs)]   # ML of trimers 1..n
    idx = jnp.asarray([[0, h] for h in hubs], jnp.int32)
    bonds, ov = topo.table_append(
        st.bonds, idx, jnp.ones(n_hubs, jnp.int32),
        jnp.zeros((n_hubs, N_BOND_PARAMS), st.bonds.params.dtype),
        jnp.ones(n_hubs, bool))
    assert not bool(ov)
    adj = st.adj
    for h in hubs:
        adj, ov2 = topo.adj_add_edge(adj, jnp.asarray(0), jnp.asarray(h),
                                     jnp.asarray(True))
        assert not bool(ov2)
    st = dataclasses.replace(st, bonds=bonds, adj=adj)
    return spec, cfg, st


def _fire_event(spec, cfg, st):
    m = cfg.max_events
    ev_valid = jnp.zeros(m, bool).at[0].set(True)
    ev_a = jnp.full(m, -1, jnp.int32).at[0].set(0)    # anchor MA -> FA
    ev_b = jnp.full(m, -1, jnp.int32).at[0].set(3)    # partner MA (trimer 1)
    ev_r = jnp.zeros(m, jnp.int32)
    return reactions.apply_reaction_events(spec, cfg, st, ev_valid, ev_a,
                                           ev_b, ev_r)


def test_overflow_raised_beyond_cap():
    spec, cfg, st = _build(n_hubs=5)     # 10 level-1 hits > max_rm=8
    st2, overflow = _fire_event(spec, cfg, st)
    assert bool(overflow)


def test_no_overflow_within_cap():
    spec, cfg, st = _build(n_hubs=2)     # 4 level-1 hits <= 8
    n_bonds0 = int(jnp.sum(st.bonds.valid))
    st2, overflow = _fire_event(spec, cfg, st)
    assert not bool(overflow)
    # 4 matching (MA,ML) bonds removed (partner b=3 turns DA before the rb
    # scan, so hub 4 keeps its (3,4) bond); the event itself added one bond
    n_bonds1 = int(jnp.sum(st2.bonds.valid))
    assert n_bonds1 == n_bonds0 - 4 + 1
    # adjacency is consistent with the bond table after removal
    idx = np.asarray(st2.bonds.idx)
    valid = np.asarray(st2.bonds.valid)
    adj = np.asarray(st2.adj)
    for i, j in idx[valid]:
        assert j in adj[i] and i in adj[j]
