"""Slab + ppermute halo variant (pallas_halo.py) vs the single-device
colt2 kernel: the multi-chip pallas path must reproduce the same physics
(the reference's ghost-exchange analog, ref start_simulation.py:155-171).

Runs on the virtual 8-device CPU mesh from conftest.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import testsystems
from chemlab_tpu.engine import integrate, pallas_halo, runner
from chemlab_tpu.parallel import make_mesh, meshed_cfg, shard_state, shard_system


@pytest.fixture(scope="module")
def melt():
    # box ~13 nm -> 4 x-layers of 2.9 nm cells: divisible by a 2- or
    # 4-device slab mesh
    built, systop, _ = testsystems.build_melt(n_mols=200, density=0.27,
                                              reactive=False, seed=9,
                                              use_pallas=True)
    st = runner.initial_forces(built.spec, built.cfg, built.state)
    st = testsystems.warmup(built, st, steps=50)
    return built, st


def test_geometry(melt):
    built, _ = melt
    assert built.cfg.use_pallas
    assert built.cfg.cell_dims[0] % 4 == 0, built.cfg.cell_dims


def test_halo_forces_match_single_device(melt, monkeypatch):
    monkeypatch.setenv("CHEMLAB_HALO", "1")
    built, st = melt
    spec, cfg = built.spec, built.cfg

    f_ref, e_ref, _ = integrate.compute_forces(spec, cfg, st)

    mesh = make_mesh(4)
    cfg_m = meshed_cfg(cfg, mesh)
    assert pallas_halo.supports(cfg_m)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    f_h, e_h, _ = integrate.compute_forces(spec_s, cfg_m, st_s)

    # identical tile math and candidate ordering per cell: agreement is at
    # epilogue-reduction rounding, not fit/method tolerance
    np.testing.assert_allclose(np.asarray(f_h), np.asarray(f_ref),
                               atol=1e-5, rtol=1e-6)
    assert float(e_h["lj"]) == pytest.approx(float(e_ref["lj"]), rel=1e-6)


def test_halo_virial_matches(melt, monkeypatch):
    monkeypatch.setenv("CHEMLAB_HALO", "1")
    built, st = melt
    p_ref = float(integrate.virial_pressure(built.spec, built.cfg, st))
    mesh = make_mesh(4)
    cfg_m = meshed_cfg(built.cfg, mesh)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    p_h = float(integrate.virial_pressure(spec_s, cfg_m, st_s))
    assert p_h == pytest.approx(p_ref, rel=1e-5, abs=1e-6)


def test_halo_md_step_matches(melt, monkeypatch):
    monkeypatch.setenv("CHEMLAB_HALO", "1")
    built, st = melt
    a = integrate.md_step(built.spec, built.cfg, st)
    mesh = make_mesh(2)
    cfg_m = meshed_cfg(built.cfg, mesh)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    b = integrate.md_step(spec_s, cfg_m, st_s)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel),
                               atol=1e-4)


def test_halo_reactive_block_matches(monkeypatch):
    """The halo pair path under the FULL reactive step (VERDICT r4 item 3):
    a run_block crossing a reaction interval on the 4-device slab mesh must
    reproduce the single-device trajectory AND the integer topology events
    (reaction matching/topology updates stay GSPMD; only the pair force is
    slab-decomposed, and each particle's force is computed wholly inside
    its owner slab, so equality is exact, not approximate)."""
    monkeypatch.setenv("CHEMLAB_HALO", "1")
    built, systop, _ = testsystems.build_melt(n_mols=200, density=0.27,
                                              reactive=True, seed=9,
                                              use_pallas=True, max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=50)
    st = testsystems.activate_initiators(built, systop, st, n=6)
    # jump to just before a reaction interval so a short block crosses it
    st = dataclasses.replace(
        st, step=jnp.asarray(cfg.reaction_interval - 2, jnp.int32))

    a = runner.run_block(spec, cfg, st, 5)

    mesh = make_mesh(4)
    cfg_m = meshed_cfg(cfg, mesh)
    from chemlab_tpu.engine import pallas_halo
    assert pallas_halo.supports(cfg_m)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    b = runner.run_block(spec_s, cfg_m, st_s, 5)

    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert np.array_equal(np.asarray(a.bonds.idx), np.asarray(b.bonds.idx))
    assert np.array_equal(np.asarray(a.reaction_counts),
                          np.asarray(b.reaction_counts))
    assert int(jnp.sum(a.reaction_counts)) > 0, \
        "fixture must fire at least one reaction for the test to bite"
    assert int(a.n_excl) == int(b.n_excl)


def test_build_rounds_x_layers_for_slab_devices():
    """SimOptions.slab_devices relaxes the halo divisibility gate: the build
    rounds the x-layer count down to a multiple (wider cells stay legal)."""
    built, _, _ = testsystems.build_melt(n_mols=320, density=0.27,
                                         reactive=False, use_pallas=True,
                                         slab_devices=4)
    assert built.cfg.cell_dims[0] % 4 == 0
    assert built.cfg.cell_dims[0] >= 4
