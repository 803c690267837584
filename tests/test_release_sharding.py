"""Tests for ReleaseMolecule/FixDistances and multi-device sharding."""

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

RELEASE_CFG = """
[general]
interval: 50

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


def build_release_system(n_mols=120):
    top = topfile.parse_lines(
        testsystems._melt_topology_text(n_mols).splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(n_mols, 0.27, seed=3)
    rcfg = reaction_parser.parse_config_lines(RELEASE_CFG.splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, thermostat="lv", thermostat_gamma=1.0,
                            gen_velocity=True, rng_seed=3, max_events=32)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop


def test_release_build():
    built, systop = build_release_system()
    n_mols = 120
    # one dummy per MA host: 2 MA per molecule
    assert built.cfg.n_particles == 3 * n_mols + 2 * n_mols
    assert built.cfg.has_fixd
    st = built.state
    n_con = int(jnp.sum(st.fixd_host >= 0))
    assert n_con == 2 * n_mols
    dummy_tid = systop.atomsym_atomtype["DUMMY_7"]
    assert int(jnp.sum(jnp.where(st.active, st.type_id == dummy_tid, False))) \
        == 2 * n_mols
    # dummies are not thermostatted
    assert not bool(built.spec.thermal_type_mask[dummy_tid])


def test_fix_distance_projection_and_release():
    built, systop = build_release_system()
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=150)
    # constraints hold at eq_length after MD steps
    st = runner.run_block(spec, cfg, st, 20)
    h = np.asarray(st.fixd_host)
    d = np.asarray(st.fixd_dummy)
    sel = h >= 0
    pos = np.asarray(st.pos)
    box = np.asarray(st.box)
    dr = pos[d[sel]] - pos[h[sel]]
    dr -= box * np.round(dr / box)
    dist = np.linalg.norm(dr, axis=1)
    assert np.allclose(dist, 0.4, atol=1e-3)

    # fire reactions; released dummies become RA at lambda 0 and fade in
    st = testsystems.activate_initiators(built, systop, st, n=10, seed=2)
    st = runner.run_block(spec, cfg, st, 60)     # crosses interval 50
    events = int(jnp.sum(st.reaction_counts))
    assert events > 0
    ra = systop.atomsym_atomtype["RA"]
    tid = np.asarray(st.type_id)
    lam = np.asarray(st.lam)
    released = np.asarray(st.fixd_host) == -1
    n_released = int(released.sum() - (~np.asarray(built.state.fixd_host >= 0)).sum())
    assert n_released >= events  # one constraint freed per event side (both MA)
    # released dummies exist as RA with small lambda, ramping up
    ra_rows = (tid == ra) & np.asarray(st.active)
    assert ra_rows.sum() > 0
    assert lam[ra_rows].max() <= 1.0
    # run longer: lambda reaches 1 and final type PL appears
    st = runner.run_block(spec, cfg, st, 60)
    tid = np.asarray(st.type_id)
    pl = systop.atomsym_atomtype["PL"]
    assert ((tid == pl) & np.asarray(st.active)).sum() > 0


def test_sharded_run_matches_single_device():
    built, systop, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)
    st = testsystems.activate_initiators(built, systop, st, n=4)

    ref = runner.run_block(spec, cfg, st, 5)

    mesh = make_mesh(8)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    out = runner.run_block(spec_s, meshed_cfg(cfg, mesh), st_s, 5)

    np.testing.assert_allclose(np.asarray(ref.pos), np.asarray(out.pos),
                               atol=5e-4)
    assert np.array_equal(np.asarray(ref.type_id), np.asarray(out.type_id))


def test_sharded_reaction_interval():
    built, systop, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)
    st = testsystems.activate_initiators(built, systop, st, n=6)
    st = dataclasses.replace(st, step=jnp.asarray(cfg.reaction_interval - 2,
                                                  jnp.int32))

    mesh = make_mesh(8)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    out = runner.run_block(spec_s, meshed_cfg(cfg, mesh), st_s, 4)   # crosses the boundary
    jax.block_until_ready(out.pos)
    # the sharded reaction step must agree with the unsharded one
    ref = runner.run_block(spec, cfg, st, 4)
    assert np.array_equal(np.asarray(ref.bonds.idx), np.asarray(out.bonds.idx))
    assert np.array_equal(np.asarray(ref.type_id), np.asarray(out.type_id))
