"""Integration tests for the reactive layer on the reference atrp_lj inputs.

The reference has no engine-level tests (SURVEY.md §4); these property tests
cover the contracts its C++ engine enforced: state windows, one reaction per
particle per interval, topology auto-generation, conservation of particle
count, and determinism of the parallel matching.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import files_io, reaction_parser
from chemlab_tpu.engine import build, observables, reactions, runner
from chemlab_tpu.topology import build_system_topology

EX = "/root/reference/examples/atrp_lj"

pytestmark = pytest.mark.skipif(not os.path.isdir(EX),
                                reason="reference examples not mounted")


@pytest.fixture(scope="module")
def atrp_system():
    systop = build_system_topology(EX + "/topol.top")
    coords = files_io.read_gro(EX + "/conf.gro")
    rcfg = reaction_parser.parse_config(EX + "/atrp.cfg")
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, thermostat="lv", thermostat_gamma=1.0,
                            table_dirs=(EX,), gen_velocity=True, max_events=64)
    bs = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return bs, systop


def activate_initiators(bs, systop, n=20, seed=1):
    """The hooks.py equivalent: flip n MA monomers to FA radicals, state 3."""
    st = runner.initial_forces(bs.spec, bs.cfg, bs.state)
    tsym = systop.atomsym_atomtype
    rng = np.random.RandomState(seed)
    rows = np.where((np.asarray(st.type_id) == tsym["MA"])
                    & np.asarray(st.active))[0]
    picks = rng.choice(rows, n, replace=False)
    tid = np.array(st.type_id)
    tid[picks] = tsym["FA"]
    chem = np.array(st.chem_state)
    chem[picks] = 3
    return dataclasses.replace(st, type_id=jnp.asarray(tid),
                               chem_state=jnp.asarray(chem),
                               reactions_on=jnp.asarray(True))


def test_reaction_step_properties(atrp_system):
    bs, systop = atrp_system
    st0 = activate_initiators(bs, systop)
    n_bonds0 = int(jnp.sum(st0.bonds.valid))
    st = reactions.reaction_step(bs.spec, bs.cfg, st0, rng_seed=7)

    counts = np.asarray(st.reaction_counts)
    n_events = counts.sum()
    assert n_events > 0, "no reactions fired in a dense reactive system"

    # one bond per event
    n_bonds = int(jnp.sum(st.bonds.valid))
    assert n_bonds == n_bonds0 + n_events

    # particle count conserved
    assert int(jnp.sum(st.active)) == int(jnp.sum(st0.active))

    # every created bond links a (FA|DA|RA)-(DA) pair after type updates:
    # reaction products per the cfg equations
    tsym = systop.atomsym_atomtype
    new_rows = np.asarray(st.bonds.group) >= 0
    idx = np.asarray(st.bonds.idx)[new_rows & np.asarray(st.bonds.valid)]
    tid = np.asarray(st.type_id)
    for i, j in idx:
        ts = {tid[i], tid[j]}
        assert tsym["DA"] in ts

    # no particle appears in more than one new bond
    flat = idx.reshape(-1)
    assert len(flat) == len(set(flat.tolist()))

    # states respect windows: FA product state = 3+1 = 4, DA product = 2+2 = 4
    chem = np.asarray(st.chem_state)
    for i, j in idx:
        for p in (i, j):
            assert chem[p] >= 1


def test_reaction_step_deterministic(atrp_system):
    bs, systop = atrp_system
    st0 = activate_initiators(bs, systop)
    st1 = reactions.reaction_step(bs.spec, bs.cfg, st0, rng_seed=7)
    st2 = reactions.reaction_step(bs.spec, bs.cfg, st0, rng_seed=7)
    assert np.array_equal(np.asarray(st1.type_id), np.asarray(st2.type_id))
    assert np.array_equal(np.asarray(st1.bonds.idx), np.asarray(st2.bonds.idx))
    # a different seed gives a different (but valid) event set
    st3 = reactions.reaction_step(bs.spec, bs.cfg, st0, rng_seed=8)
    assert not np.array_equal(np.asarray(st1.bonds.idx), np.asarray(st3.bonds.idx))


def test_reactions_gated_off(atrp_system):
    bs, systop = atrp_system
    st0 = activate_initiators(bs, systop)
    st0 = dataclasses.replace(st0, reactions_on=jnp.asarray(False))
    st = runner.run_block(bs.spec, bs.cfg, st0, 5)
    assert int(jnp.sum(st.reaction_counts)) == 0
    assert int(jnp.sum(st.bonds.valid)) == int(jnp.sum(st0.bonds.valid))


def test_run_block_with_reactions(atrp_system):
    bs, systop = atrp_system
    st = activate_initiators(bs, systop)
    # step to just before the interval boundary, then across it
    st = runner.run_block(bs.spec, bs.cfg, st, 200)
    m = runner.measure(bs.spec, bs.cfg, st)
    assert int(m["reaction_counts"].sum()) > 0
    assert not bool(m["overflow"])
    # angles were auto-generated for new bonds (every new bond has a
    # neighbour on the monomer side)
    assert int(m["n_angles"]) > 2000
    assert np.isfinite(float(m["T"]))


def test_state_window_blocks_reaction(atrp_system):
    """FA with state outside [3,4) must not react."""
    bs, systop = atrp_system
    st0 = activate_initiators(bs, systop)
    chem = np.array(st0.chem_state)
    tsym = systop.atomsym_atomtype
    chem[np.asarray(st0.type_id) == tsym["FA"]] = 0   # below min_state=3
    st0 = dataclasses.replace(st0, chem_state=jnp.asarray(chem))
    st = reactions.reaction_step(bs.spec, bs.cfg, st0, rng_seed=7)
    assert int(jnp.sum(st.reaction_counts)) == 0
