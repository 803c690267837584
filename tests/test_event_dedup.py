"""Constructed-topology regressions for batched event application.

Two deterministic cases the random-melt equivalence test can't reach:

1. Dihedral spanning TWO same-interval new bonds (two hops apart), in all
   four (a,b) orientation combinations.  Each owning event enumerates the
   dihedral in family 2 or family 3 depending only on its own orientation,
   so the dedup must be orientation-independent (keep exactly one copy) —
   and must append the 1-4 exclusion exactly once (a duplicate would be
   double-subtracted by the pallas excluded-pair correction).

2. ChangeNeighboursProperty BFS around particle 0: the batched frontier
   pads with -1 which is clamped to 0 before the adjacency gather, so
   adj[0]'s neighbors enter the seen-set with a False validity bit; the
   exact-distance dedup must not let those suppress genuine level>=2
   candidates that happen to be bonded to particle 0.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import files_io, reaction_parser, topfile
from chemlab_tpu.engine import build, reactions
from chemlab_tpu.topology import compile_system_topology

TOPOL = """
[ defaults ]
1 3

[ atomtypes ]
  A    1.0      0.000     A        1            1
  B    1.0      0.000     A        1            1
  C    1.0      0.000     A        1            1

[ atomstate ]
C 0

[ bondtypes ]
A A 1 0.97 60.0
A B 1 0.97 60.0

[ angletypes ]
A A A 1 180.0 2.5

[ dihedraltypes ]
A A A A 1 0.0 3.0 1

[ moleculetype ]
M 3

[ atoms ]
1 A 1 MON X 1 0.000000 1

[ system ]
constructed

[ molecules ]
M 12
"""

CFG = """
[general]
interval: 10
nearest=0

[ext_nb]
ext_type=ChangeNeighboursProperty
invoke_on=both
type_transfers=B:3->C

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97
extensions=nb

[reaction_a]
reaction: A(0, 9) + A(0, 9) -> A(1):A(1)
cutoff: 1.2
rate: 1.0
intramolecular: 1
intraresidual: 1
active: True
group: g1
"""


def _build():
    top = topfile.parse_lines(TOPOL.splitlines(), "<constructed>")
    systop = compile_system_topology(top)
    n = 12
    rng = np.random.RandomState(0)
    box = np.array([10.0, 10.0, 10.0])
    coords = files_io.Coordinates(
        title="constructed", atom_ids=np.arange(1, n + 1),
        res_idx=np.arange(1, n + 1), res_names=["MON"] * n,
        atom_names=["X"] * n, pos=rng.uniform(0, 10.0, size=(n, 3)),
        vel=None, box=box)
    rcfg = reaction_parser.parse_config_lines(CFG.splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, thermostat="lv", thermostat_gamma=1.0,
                            gen_velocity=False, rng_seed=0, max_events=16)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop


def _set_edges(state, edges):
    """Overwrite adjacency with the given undirected edge list."""
    adj = np.full(np.asarray(state.adj).shape, -1, np.int32)
    deg = np.zeros(adj.shape[0], np.int32)
    for i, j in edges:
        adj[i, deg[i]] = j
        adj[j, deg[j]] = i
        deg[i] += 1
        deg[j] += 1
    return dataclasses.replace(state, adj=jnp.asarray(adj))


def _events(pairs, cap=16):
    ev_valid = np.zeros(cap, bool)
    ev_a = np.full(cap, -1, np.int32)
    ev_b = np.full(cap, -1, np.int32)
    ev_r = np.full(cap, -1, np.int32)
    for k, (a, b) in enumerate(pairs):
        ev_valid[k] = True
        ev_a[k], ev_b[k], ev_r[k] = a, b, 0
    return (jnp.asarray(ev_valid), jnp.asarray(ev_a), jnp.asarray(ev_b),
            jnp.asarray(ev_r))


def _dih_multiset(table):
    idx = np.asarray(table.idx)
    ok = np.asarray(table.valid)
    rows = idx[ok][:, :4]
    flipped = rows[:, ::-1]
    canon = np.where(rows[:, :1] <= flipped[:, :1], rows, flipped)
    return sorted(map(tuple, canon.tolist()))


def _excl_multiset(state):
    e = np.asarray(state.excl)
    ok = e[:, 0] >= 0
    return sorted(map(tuple, np.sort(e[ok], 1).tolist()))


def test_spanning_dihedral_all_orientations():
    built, _ = _build()
    spec, cfg = built.spec, built.cfg
    assert cfg.n_rb == 0 and not cfg.has_fixd  # batched path active
    base = _set_edges(built.state, [(5, 6)])   # old middle bond
    cfg_seq = dataclasses.replace(cfg, has_fixd=True)  # force the exact scan

    for e1 in ((4, 5), (5, 4)):
        for e2 in ((6, 7), (7, 6)):
            ev = _events([e1, e2])
            out_b, ov_b = reactions.apply_reaction_events(spec, cfg, base, *ev)
            out_s, ov_s = reactions.apply_reaction_events(spec, cfg_seq, base,
                                                          *ev)
            dih_b = _dih_multiset(out_b.dihedrals)
            dih_s = _dih_multiset(out_s.dihedrals)
            # the spanning dihedral 4-5-6-7 exists exactly once
            assert dih_b.count((4, 5, 6, 7)) == 1, (e1, e2, dih_b)
            assert dih_b == dih_s, (e1, e2, dih_b, dih_s)
            # exclusions as MULTISET: a duplicated 1-4 pair would be
            # double-subtracted by the pallas excluded-pair correction
            assert _excl_multiset(out_b) == _excl_multiset(out_s), (e1, e2)
            assert not bool(ov_b) and not bool(ov_s)


def test_ppnb_bfs_candidate_bonded_to_particle_zero():
    built, systop = _build()
    spec, cfg = built.spec, built.cfg
    assert cfg.max_nb_level >= 3
    tA = systop.atomsym_atomtype["A"]
    tB = systop.atomsym_atomtype["B"]
    tC = systop.atomsym_atomtype["C"]

    # chain 4-5-6-7 plus bond 0-7: particle 7 sits at BFS level 3 from the
    # event endpoint 4 AND in adj[0], the row the -1 frontier padding gathers
    st = _set_edges(built.state, [(4, 5), (5, 6), (6, 7), (0, 7)])
    tid = np.asarray(st.type_id).copy()
    tid[7] = tB
    st = dataclasses.replace(st, type_id=jnp.asarray(tid))

    ev = _events([(4, 10)])
    out_b, _ = reactions.apply_reaction_events(spec, cfg, st, *ev)
    cfg_seq = dataclasses.replace(cfg, has_fixd=True)
    out_s, _ = reactions.apply_reaction_events(spec, cfg_seq, st, *ev)

    assert int(out_b.type_id[7]) == tC, "level-3 transfer wrongly suppressed"
    assert np.array_equal(np.asarray(out_b.type_id), np.asarray(out_s.type_id))
    assert np.array_equal(np.asarray(out_b.chem_state),
                          np.asarray(out_s.chem_state))
    assert int(out_b.type_id[4]) == tA  # endpoint itself is not a neighbor
