"""Stacked ReleaseMolecule/JoinMolecule blocks (dacron-class configs).

The reference instantiates one PostProcessReleaseParticles / JoinParticles
per extension block and reactions pick theirs by name
(ref: reaction_setup.py:245-319; examples/dacron/rev_with_water/test_3/
reaction.cfg stacks release+join in one group).  Round 1 raised
NotImplementedError past one block; these tests pin the multi-def lowering:
one FixDistances definition per block, def resolution by dummy type.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import reaction_parser, testsystems, topfile
from chemlab_tpu.engine import build, runner
from chemlab_tpu.topology import compile_system_topology

TWO_RELEASE_CFG = """
[general]
interval: 20

[ext_rel_a]
ext_type=ReleaseMolecule
host_type=MA
target_type=RA
eq_length=0.4
alpha=0.02
init_res=0.000000001
final_type=PL
replicate=1
release_on=bond
release_count=1
release_host=both

[ext_rel_b]
ext_type=ReleaseMolecule
host_type=ML
target_type=DA
eq_length=0.3
alpha=0.05
init_res=0.000000001
final_type=PA
replicate=1
release_on=type

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97
extensions=rel_a,rel_b

[reaction_a]
reaction: FA(3, 4) + MA(1, 2) -> FA(1):DA(2)
cutoff: 1.2
rate: 4.0
intramolecular: 1
active: True
group: g1
exclude_extensions: rel_b
"""

RELEASE_PLUS_JOIN_CFG = """
[general]
interval: 20

[ext_rel]
ext_type=ReleaseMolecule
host_type=MA
target_type=RA
eq_length=0.4
alpha=0.02
init_res=0.000000001
final_type=PL
replicate=1
release_on=bond
release_count=1
release_host=both

[ext_join]
ext_type=JoinMolecule
eq_length=0.5
init_res=0.000000001
final_type=PL
host_type=FA
target_type=ML

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97
extensions=rel,join

[reaction_a]
reaction: FA(3, 4) + ML(0, 1) -> FA(1):DA(2)
cutoff: 1.2
rate: 4.0
intramolecular: 1
active: True
group: g1
"""


def _build(cfg_text, n_mols=80, seed=3):
    top = topfile.parse_lines(
        testsystems._melt_topology_text(n_mols).splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(n_mols, 0.3, seed=seed)
    rcfg = reaction_parser.parse_config_lines(cfg_text.splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, thermostat="lv", thermostat_gamma=1.0,
                            gen_velocity=True, rng_seed=seed, max_events=16)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop


def test_two_release_blocks_build():
    built, systop = _build(TWO_RELEASE_CFG)
    spec, cfg = built.spec, built.cfg
    # two FixDistances definitions, distinct dummy types
    assert cfg.n_fd == 2
    dts = np.asarray(spec.fd_dummy_type)
    assert dts[0] != dts[1]
    # one dummy per MA host + one per ML host
    n_mols = 80
    n_ma = 2 * n_mols   # trimer has 2 MA
    n_ml = n_mols       # 1 ML
    st = built.state
    tid = np.asarray(st.type_id)
    act = np.asarray(st.active)
    assert ((tid == dts[0]) & act).sum() == n_ma
    assert ((tid == dts[1]) & act).sum() == n_ml
    assert int(jnp.sum(st.fixd_host >= 0)) == n_ma + n_ml
    # release targets resolve per def
    assert int(spec.fd_target_type[0]) == systop.atomsym_atomtype["RA"]
    assert int(spec.fd_target_type[1]) == systop.atomsym_atomtype["DA"]
    # def 0 releases on bond (host_type -1), def 1 on host type change
    assert int(spec.fd_host_type[0]) == -1
    assert int(spec.fd_host_type[1]) == systop.atomsym_atomtype["ML"]


def test_two_release_blocks_fire_correct_def():
    built, systop = _build(TWO_RELEASE_CFG)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=60)
    st = testsystems.activate_initiators(built, systop, st, n=8, seed=1)
    st = runner.run_block(spec, cfg, st, 25)   # crosses interval 20
    events = int(jnp.sum(st.reaction_counts))
    assert events > 0
    # only rel_a (MA-host, bond-release) dummies were freed -> they become RA;
    # rel_b releases on ML type change, which never happens here
    tid = np.asarray(st.type_id)
    act = np.asarray(st.active)
    ra = systop.atomsym_atomtype["RA"]
    da = systop.atomsym_atomtype["DA"]
    dts = np.asarray(spec.fd_dummy_type)
    assert ((tid == ra) & act).sum() > 0
    # rel_b dummies all still constrained (DA can also appear from the
    # reaction's own type change on MA -> count dummies instead)
    assert ((tid == dts[1]) & act).sum() == 80


def test_release_plus_join_capture():
    built, systop = _build(RELEASE_PLUS_JOIN_CFG)
    spec, cfg = built.spec, built.cfg
    assert cfg.n_fd == 2
    # join def must be index 1 (releases first) with FA host
    assert int(spec.fd_host_type[1]) == systop.atomsym_atomtype["FA"]
    r_join_def = np.asarray(spec.r_join_def)
    assert (r_join_def == 1).all()

    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=60)
    st = testsystems.activate_initiators(built, systop, st, n=8, seed=1)
    n_con0 = int(jnp.sum(st.fixd_host >= 0))
    st = runner.run_block(spec, cfg, st, 25)
    events = int(jnp.sum(st.reaction_counts))
    assert events > 0
    # each event captured its ML side as a join dummy (type = join def's
    # dummy type, lambda = init_res) and released an MA-host dummy
    tid = np.asarray(st.type_id)
    act = np.asarray(st.active)
    jd = int(spec.fd_dummy_type[1])
    captured = ((tid == jd) & act).sum()
    assert captured == events
    # side a (an FA, formerly MA) still hosts a release dummy from ext_rel:
    # each event frees one (release def 0 -> dummy becomes RA) and captures
    # one (join def 1), so the net constraint count is unchanged
    ra = systop.atomsym_atomtype["RA"]
    assert ((tid == ra) & act).sum() == events
    n_con = int(jnp.sum(st.fixd_host >= 0))
    assert n_con == n_con0
