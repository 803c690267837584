"""Dissociation lambda fade-out (ref: reaction_setup.py:320-354): on break
the particle keeps its old type with lambda reset to 0; BasicDynamicResolution
ramps lambda back at alpha/step and fires the product type (type/mass/q, NOT
chemical state) when lambda crosses 1.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import reaction_parser, testsystems, topfile
from chemlab_tpu.engine import build, reactions, runner
from chemlab_tpu.topology import compile_system_topology

DISS_CFG = """
[general]
interval: 10

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97

[reaction_d]
reaction: MA(0,9):ML(0,9) -> PA(0) + PL(0)
cutoff: 50.0
rate: 0.0
diss_rate: 1000.0
alpha: 0.01
active: True
group: g1
"""


@pytest.fixture(scope="module")
def diss_system():
    top = topfile.parse_lines(
        testsystems._melt_topology_text(40).splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(40, 0.4, seed=5)
    rcfg = reaction_parser.parse_config_lines(DISS_CFG.splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, gen_velocity=True, rng_seed=5,
                            max_events=16)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop


def test_fade_out_keeps_old_type_with_zero_lambda(diss_system):
    built, systop = diss_system
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = dataclasses.replace(st, reactions_on=jnp.asarray(True))
    n_bonds0 = int(jnp.sum(st.bonds.valid))
    idx0 = np.asarray(st.bonds.idx).copy()
    valid0 = np.asarray(st.bonds.valid).copy()
    st2 = reactions.reaction_step(spec, cfg, st, rng_seed=3)
    broke = int(jnp.sum(st2.reaction_counts))
    assert broke > 0
    assert int(jnp.sum(st2.bonds.valid)) == n_bonds0 - broke

    tsym = systop.atomsym_atomtype
    tid = np.asarray(st2.type_id)
    lam = np.asarray(st2.lam)
    act = np.asarray(st2.active)
    # no particle converted instantly
    assert ((tid == tsym["PA"]) & act).sum() == 0
    assert ((tid == tsym["PL"]) & act).sum() == 0
    # the broken endpoints sit at lambda 0 (a trimer's central ML can sit in
    # two broken bonds, so count unique endpoints)
    gone = valid0 & ~np.asarray(st2.bonds.valid)
    endpoints = np.unique(idx0[gone])
    assert endpoints.size > 0
    n_zero = int(((lam == 0.0) & act).sum())
    assert n_zero == endpoints.size
    assert np.all(lam[endpoints] == 0.0)


def test_products_fire_after_ramp(diss_system):
    built, systop = diss_system
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = dataclasses.replace(st, reactions_on=jnp.asarray(True))
    st = reactions.reaction_step(spec, cfg, st, rng_seed=3)
    broke = int(jnp.sum(st.reaction_counts))
    assert broke > 0
    chem_before = np.asarray(st.chem_state).copy()
    zero_rows = np.asarray(st.lam) == 0.0

    # keep further reactions off; 1/alpha = 100 steps completes the ramp
    st = dataclasses.replace(st, reactions_on=jnp.asarray(False))
    st = runner.run_block(spec, cfg, st, 110)

    tsym = systop.atomsym_atomtype
    tid = np.asarray(st.type_id)
    act = np.asarray(st.active)
    lam = np.asarray(st.lam)
    assert lam[act].min() == pytest.approx(1.0)
    # every faded endpoint converted MA->PA / ML->PL
    assert ((tid == tsym["PA"]) & act).sum() > 0
    assert set(tid[zero_rows]) <= {tsym["PA"], tsym["PL"]}
    # untouched particles kept their types
    untouched = act & ~zero_rows
    assert set(tid[untouched]) <= {tsym["MA"], tsym["ML"]}
    # chemical state survives the final property change (no type-default reset)
    np.testing.assert_array_equal(np.asarray(st.chem_state)[zero_rows],
                                  chem_before[zero_rows])


def test_midramp_lambda_progress(diss_system):
    built, _ = diss_system
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = dataclasses.replace(st, reactions_on=jnp.asarray(True))
    st = reactions.reaction_step(spec, cfg, st, rng_seed=3)
    zero_rows = np.asarray(st.lam) == 0.0
    assert zero_rows.sum() > 0
    st = dataclasses.replace(st, reactions_on=jnp.asarray(False))
    st = runner.run_block(spec, cfg, st, 50)
    lam = np.asarray(st.lam)[zero_rows]
    # forces ramp over 1/alpha steps instead of discontinuing: mid-ramp
    assert lam.min() > 0.3 and lam.max() < 0.8
