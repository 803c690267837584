"""Hybrid-bond lambda ramp and dihedral energy goldens."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import testsystems
from chemlab_tpu.engine import build, runner
from chemlab_tpu.engine.bonded_forces import dihedral_energies
from chemlab_tpu.engine.state import TermTable


def test_hybrid_bond_lambda_ramp():
    """t_hybrid_bond > 0: reaction-created bonds fade in over N steps
    (FixedListDynamicResolution; ref: start_simulation.py:289-293)."""
    built, systop, _ = testsystems.build_melt(n_mols=120, density=0.4,
                                              reactive=True, max_events=16,
                                              t_hybrid_bond=100)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=150)
    st = testsystems.activate_initiators(built, systop, st, n=24)
    st = runner.run_block(spec, cfg, st, 210)    # crosses interval 200
    chem = np.asarray(st.bonds.group) >= 0
    valid = np.asarray(st.bonds.valid)
    lam = np.asarray(st.bonds.lam)
    sel = chem & valid
    if sel.sum() == 0:
        pytest.skip("no reactions fired at this seed")
    # bonds created at step 200 have ramped ~10 steps of 1/100 each
    assert lam[sel].max() < 0.5
    assert lam[sel].min() >= 0.0
    st = runner.run_block(spec, cfg, st, 150)
    lam2 = np.asarray(st.bonds.lam)
    # the original bonds are fully ramped by now
    assert lam2[sel].min() == pytest.approx(1.0)


def test_hybrid_angle_lambda_ramp():
    """t_hybrid_angle > 0: reaction-generated angles fade in (natural
    extension of the t_hybrid_bond ramp; both flags are declared by the
    reference CLI, ref: app_args.py:208)."""
    built, systop, _ = testsystems.build_melt(n_mols=120, density=0.4,
                                              reactive=True, max_events=16,
                                              t_hybrid_angle=100)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    n_ang0 = int(jnp.sum(st.angles.valid))
    st = testsystems.warmup(built, st, steps=150)
    st = testsystems.activate_initiators(built, systop, st, n=24)
    st = runner.run_block(spec, cfg, st, 210)    # crosses interval 200
    valid = np.asarray(st.angles.valid)
    lam = np.asarray(st.angles.lam)
    new = valid.copy()
    new[:n_ang0] = False            # rows appended after build
    if new.sum() == 0:
        pytest.skip("no reaction-generated angles at this seed")
    # pre-existing angles never ramp; new ones are mid-ramp
    assert lam[valid][:n_ang0].min() == pytest.approx(1.0)
    assert lam[new].max() < 0.5
    st = runner.run_block(spec, cfg, st, 150)
    lam2 = np.asarray(st.angles.lam)
    assert lam2[new].min() == pytest.approx(1.0)


def _dihedral_table(spec, idx_rows, funcs, params):
    return TermTable.create(8, 4, idx_rows, funcs, params)


def test_dihedral_energy_goldens():
    """Hand-computed energies for harmonic n-cos, RB, and harmonic dihedrals
    on a known 90-degree geometry (doc/topology.rst formulas)."""
    built, systop, _ = testsystems.build_melt(n_mols=2, density=0.001,
                                              reactive=False)
    spec, cfg = built.spec, built.cfg
    st = built.state
    pos = np.full((cfg.n_pad, 3), 2.0)
    # phi = 90 degrees: b1 = x, b2 = y, b3 = z
    pos[0] = [1.0, 0.0, 0.0]
    pos[1] = [2.0, 0.0, 0.0]
    pos[2] = [2.0, 1.0, 0.0]
    pos[3] = [2.0, 1.0, 1.0]
    pos_j = jnp.asarray(pos, st.pos.dtype)
    pos4 = jnp.concatenate(
        [pos_j, st.type_id.astype(pos_j.dtype)[:, None]], axis=-1)
    phi = math.pi / 2

    # func 1: K (1 + cos(n phi - phi0)), K=2, phi0=0.3, n=2
    t = _dihedral_table(spec, [(0, 1, 2, 3)], [1], [[2.0, 0.3, 2.0]])
    e = dihedral_energies(spec, (1,), pos4[jnp.maximum(t.idx, 0)], st.box, t)
    expect = 2.0 * (1 + math.cos(2 * phi - 0.3))
    assert float(e["dihedral_f1"]) == pytest.approx(expect, rel=1e-5)

    # func 3: RB sum Cn cos(psi)^n with psi = phi - pi -> cos(psi) = 0...
    cpsi = math.cos(phi - math.pi)
    C = [1.0, 0.5, 0.25, 0.1, 0.05, 0.01]
    t = _dihedral_table(spec, [(0, 1, 2, 3)], [3], [C])
    e = dihedral_energies(spec, (3,), pos4[jnp.maximum(t.idx, 0)], st.box, t)
    expect = sum(c * cpsi**n for n, c in enumerate(C))
    assert float(e["dihedral_f3"]) == pytest.approx(expect, rel=1e-4, abs=1e-5)

    # func 12: K wrap(phi - phi0)^2, K=1.5, phi0=0.2
    t = _dihedral_table(spec, [(0, 1, 2, 3)], [12], [[1.5, 0.2]])
    e = dihedral_energies(spec, (12,), pos4[jnp.maximum(t.idx, 0)], st.box, t)
    expect = 1.5 * (phi - 0.2) ** 2
    assert float(e["dihedral_f12"]) == pytest.approx(expect, rel=1e-4)
