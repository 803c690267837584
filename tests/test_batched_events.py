"""Batched event application == sequential scan.

Systems without ppnb/RemoveNeighboursBonds/FixDistances take the batched
path; forcing has_fixd=True (with zero release/join work) routes the same
events through the reference-order scan.  The resulting topology must be
identical — including the dihedral-dedup case where two same-interval bonds
sit two hops apart.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import reactions, runner


def _term_set(table, arity):
    idx = np.asarray(table.idx)
    ok = np.asarray(table.valid)
    rows = idx[ok][:, :arity]
    # canonical orientation (tables store either direction)
    flipped = rows[:, ::-1]
    canon = np.where((rows[:, :1] <= flipped[:, :1]), rows, flipped)
    return sorted(map(tuple, canon.tolist()))


def test_batched_matches_sequential_scan():
    built, systop, _ = testsystems.build_melt(n_mols=300, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    assert cfg.n_rb == 0 and not cfg.has_fixd  # batched path active
    assert cfg.max_ppnb > 0  # exercises the batched ppnb transfers too
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=150)
    st = testsystems.activate_initiators(built, systop, st, n=120)
    st = dataclasses.replace(st, step=jnp.asarray(0, jnp.int32),
                             reactions_on=jnp.asarray(True))

    ev = reactions.match_reactions(spec, cfg, st, jnp.uint32(0))
    ev_valid, ev_a, ev_b, ev_r = ev[0], ev[1], ev[2], ev[3]
    assert int(jnp.sum(ev_valid)) >= 4, "need several simultaneous events"

    out_b, ov_b = reactions.apply_reaction_events(spec, cfg, st, ev_valid,
                                                  ev_a, ev_b, ev_r)
    # forcing has_fixd routes through the sequential scan; with no release
    # counts and r_join_def == -1 the fixd hooks are no-ops
    cfg_seq = dataclasses.replace(cfg, has_fixd=True)
    out_s, ov_s = reactions.apply_reaction_events(spec, cfg_seq, st, ev_valid,
                                                  ev_a, ev_b, ev_r)

    assert _term_set(out_b.bonds, 2) == _term_set(out_s.bonds, 2)
    assert _term_set(out_b.angles, 3) == _term_set(out_s.angles, 3)
    assert _term_set(out_b.dihedrals, 4) == _term_set(out_s.dihedrals, 4)
    assert np.array_equal(np.asarray(out_b.type_id), np.asarray(out_s.type_id))
    assert np.array_equal(np.asarray(out_b.chem_state),
                          np.asarray(out_s.chem_state))
    # molecule labels: same partition (labels may differ by representative)
    mb = np.asarray(out_b.mol_id)
    ms = np.asarray(out_s.mol_id)
    act = np.asarray(out_b.active)
    import collections
    def part(m):
        groups = collections.defaultdict(list)
        for i in np.where(act)[0]:
            groups[m[i]].append(i)
        return sorted(tuple(v) for v in groups.values())
    assert part(mb) == part(ms)
    # exclusion MULTISETS equal (order may differ; duplicates may NOT —
    # a duplicated 1-4 pair is double-subtracted on the pallas path).
    # The deterministic two-hop dihedral-dedup orientations are covered by
    # tests/test_event_dedup.py with a constructed fixture.
    def excl_multiset(s):
        e = np.asarray(s.excl)
        ok = e[:, 0] >= 0
        return sorted(map(tuple, np.sort(e[ok], 1).tolist()))
    assert excl_multiset(out_b) == excl_multiset(out_s)
    assert bool(ov_b) == bool(ov_s)
