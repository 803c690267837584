"""Extended sharded-vs-single-device equivalence.

Round-1 sharded tests covered one bond-forming reaction interval only; these
cross the remaining stateful transitions under an 8-device mesh and assert
*integer* state equality (bond tables, types, constraints) so divergence
cannot hide inside a float tolerance:

  - a dissociation reaction (lambda fade-out) over >= 3 reaction intervals
  - a ReleaseMolecule/FixDistances release crossing a reaction interval
  - capacity regrowth (grow_neighbor_caps) mid-run
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import reaction_parser, testsystems, topfile
from chemlab_tpu.engine import build, runner
from chemlab_tpu.parallel import (make_mesh, meshed_cfg, shard_state,
                                  shard_system)
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
diss_rate: 6.0
alpha: 0.01
active: True
group: g1
"""

RELEASE_CFG = """
[general]
interval: 20

[ext_release]
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

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97
extensions=release

[reaction_a]
reaction: FA(3, 4) + MA(1, 2) -> FA(1):DA(2)
cutoff: 1.2
rate: 4.0
intramolecular: 1
active: True
group: g1
"""


def _build(cfg_text, n_mols, density=0.3, seed=7, max_events=16):
    top = topfile.parse_lines(
        testsystems._melt_topology_text(n_mols).splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(n_mols, density, seed=seed)
    rcfg = reaction_parser.parse_config_lines(cfg_text.splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, thermostat="lv", thermostat_gamma=1.0,
                            gen_velocity=True, rng_seed=seed,
                            max_events=max_events)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop


def _assert_integer_state_equal(ref, out):
    assert np.array_equal(np.asarray(ref.bonds.idx), np.asarray(out.bonds.idx))
    assert np.array_equal(np.asarray(ref.bonds.valid),
                          np.asarray(out.bonds.valid))
    assert np.array_equal(np.asarray(ref.type_id), np.asarray(out.type_id))
    assert np.array_equal(np.asarray(ref.active), np.asarray(out.active))
    assert np.array_equal(np.asarray(ref.reaction_counts),
                          np.asarray(out.reaction_counts))


def test_sharded_dissociation_three_intervals():
    built, systop = _build(DISS_CFG, n_mols=64, density=0.4, seed=5)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=60)
    st = dataclasses.replace(st, reactions_on=jnp.asarray(True))

    # 35 steps with interval 10 crosses >= 3 reaction boundaries
    ref = runner.run_block(spec, cfg, st, 35)

    mesh = make_mesh(8)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    out = runner.run_block(spec_s, meshed_cfg(cfg, mesh), st_s, 35)
    jax.block_until_ready(out.pos)

    assert int(jnp.sum(ref.reaction_counts)) > 0, "no dissociation fired"
    _assert_integer_state_equal(ref, out)
    # lambda fade-out bookkeeping must match exactly too
    assert np.array_equal(np.asarray(ref.lam) == 0.0,
                          np.asarray(out.lam) == 0.0)


def test_sharded_release_crosses_interval():
    built, systop = _build(RELEASE_CFG, n_mols=64, density=0.3, seed=3)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=60)
    st = testsystems.activate_initiators(built, systop, st, n=6, seed=2)

    ref = runner.run_block(spec, cfg, st, 25)    # crosses interval 20

    mesh = make_mesh(8)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    out = runner.run_block(spec_s, meshed_cfg(cfg, mesh), st_s, 25)
    jax.block_until_ready(out.pos)

    assert int(jnp.sum(ref.reaction_counts)) > 0, "no reaction fired"
    _assert_integer_state_equal(ref, out)
    # the FixDistances constraint releases must agree row-for-row
    assert np.array_equal(np.asarray(ref.fixd_host), np.asarray(out.fixd_host))
    assert np.array_equal(np.asarray(ref.fixd_dummy),
                          np.asarray(out.fixd_dummy))
    rel = np.asarray(st.fixd_host >= 0) & np.asarray(ref.fixd_host == -1)
    assert rel.sum() > 0, "no constraint released"


def test_sharded_capacity_regrowth():
    built, systop, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=60)
    st = testsystems.activate_initiators(built, systop, st, n=6)

    # regrow capacities (as the CLI does on overflow) and keep running:
    # the regrown config must still produce sharded == single results
    cfg2, st2 = build.grow_neighbor_caps(cfg, spec, st)
    assert cfg2.max_neighbors > cfg.max_neighbors

    ref = runner.run_block(spec, cfg2, st2, 12)

    mesh = make_mesh(8)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st2)
    out = runner.run_block(spec_s, meshed_cfg(cfg2, mesh), st_s, 12)
    jax.block_until_ready(out.pos)

    _assert_integer_state_equal(ref, out)
    np.testing.assert_allclose(np.asarray(ref.pos), np.asarray(out.pos),
                               atol=1e-5)
