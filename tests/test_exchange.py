"""Exchange-reaction semantics (ref: reaction_setup.py:167-255).

Grammar: A(min,max):B(min,max) + C(min,max) -> A'(dA):C'(dC) + B'(dB)
  - A (type_1) must be bonded to a B (type_2) in the given state window
  - C (type_3) is the Verlet partner; the channel is virtual (no new bond)
  - A and C change type/state directly; B changes via a level-1
    neighbour-property transfer with B's state window
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import reaction_parser, testsystems, topfile
from chemlab_tpu.engine import build, reactions, runner
from chemlab_tpu.topology import compile_system_topology

EXCHANGE_CFG = """
[general]
interval: 10

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97

[reaction_x]
reaction: MA(1,2):ML(%(mlmin)d,%(mlmax)d) + MA(1,2) -> FA(1):DA(1) + PL(1)
cutoff: 1.5
rate: 400.0
intramolecular: 1
intraresidual: 1
active: True
group: g1
"""


def build_exchange(ml_window=(0, 9)):
    top = topfile.parse_lines(
        testsystems._melt_topology_text(60).splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(60, 0.4, seed=5)
    cfg_text = EXCHANGE_CFG % {"mlmin": ml_window[0], "mlmax": ml_window[1]}
    rcfg = reaction_parser.parse_config_lines(cfg_text.splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, gen_velocity=True, rng_seed=5, max_events=16)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop


def test_exchange_fires_and_transfers():
    built, systop = build_exchange()
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = dataclasses.replace(st, reactions_on=jnp.asarray(True))
    n_bonds0 = int(jnp.sum(st.bonds.valid))
    st2 = reactions.reaction_step(spec, cfg, st, rng_seed=3)
    events = int(jnp.sum(st2.reaction_counts))
    assert events > 0

    # virtual: no bond was created
    assert int(jnp.sum(st2.bonds.valid)) == n_bonds0

    tsym = systop.atomsym_atomtype
    tid = np.asarray(st2.type_id)
    act = np.asarray(st2.active)

    def count(sym):
        return int(((tid == tsym[sym]) & act).sum())

    # A side -> FA, C side -> DA, bonded ML neighbours -> PL
    assert count("FA") == events
    assert count("DA") == events
    # each event converts the A side's bonded ML (two events may share a
    # trimer's central ML, so the count can fall just short of events)
    assert 0 < count("PL") <= events

    # states bumped on the reacting pair
    chem = np.asarray(st2.chem_state)
    assert chem[(tid == tsym["FA"]) & act].min() >= 2   # 1 + delta 1


def test_exchange_blocked_by_neighbour_state_window():
    built, systop = build_exchange(ml_window=(5, 6))   # MLs are in state 0
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = dataclasses.replace(st, reactions_on=jnp.asarray(True))
    st2 = reactions.reaction_step(spec, cfg, st, rng_seed=3)
    assert int(jnp.sum(st2.reaction_counts)) == 0
