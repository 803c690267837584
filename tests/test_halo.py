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
