"""Physics validation: NVE energy conservation and analytic golden values.

The reference's correctness burden sits on its engine (SURVEY.md §4); here
energy conservation under NVE is the end-to-end check that every force term
is the exact gradient of the reported energy.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import testsystems
from chemlab_tpu.engine import build, runner


def test_nve_energy_conservation():
    built, systop, _ = testsystems.build_melt(n_mols=200, reactive=False,
                                              thermostat="no", dt=0.002)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=300, kT=0.5)
    st = runner.initial_forces(spec, cfg, st)

    def etot(s):
        m = runner.measure(spec, cfg, s)
        return float(m["epot"]) + float(m["ekin"])

    e0 = etot(st)
    st = runner.run_block(spec, cfg, st, 500)
    e1 = etot(st)
    # float32 velocity-Verlet at dt=0.002: drift well under 0.1% per 500 steps
    assert abs(e1 - e0) / abs(e0) < 1e-3, (e0, e1)


def test_lj_pair_analytic():
    """Two particles at r: energy/force match the analytic LJ expressions."""
    built, systop, _ = testsystems.build_melt(n_mols=2, density=0.001,
                                              reactive=False, thermostat="no")
    spec, cfg = built.spec, built.cfg
    st = built.state
    # isolate two MA atoms of different molecules at a known distance,
    # park everything else far away in a corner
    pos = np.full((cfg.n_pad, 3), 0.5)
    box = np.asarray(st.box)
    r = 1.5
    pos[0] = [10.0, 10.0, 10.0]
    pos[3] = [10.0 + r, 10.0, 10.0]
    # keep bonded partners glued to their anchors so bonds/angles are relaxed
    pos[1] = pos[0] + [0.0, 0.97, 0.0]
    pos[2] = pos[0] + [0.0, 1.94, 0.0]
    pos[4] = pos[3] + [0.0, 0.97, 0.0]
    pos[5] = pos[3] + [0.0, 1.94, 0.0]
    st = dataclasses.replace(st, pos=jnp.asarray(pos, st.pos.dtype))
    from chemlab_tpu.engine import integrate, neighbor
    st = integrate.maybe_rebuild_neighbors(spec, cfg, st, force=True)
    _, energies, _ = integrate.compute_forces(spec, cfg, st)

    # expected: MA-MA LJ at r plus the cross pairs between the two trimers
    def u(rr, sig=1.0, eps=1.0, rc=2.5):
        if rr >= rc:
            return 0.0
        s6 = (sig / rr) ** 6
        shift = 4 * eps * ((sig / rc) ** 12 - (sig / rc) ** 6)
        return 4 * eps * (s6 * s6 - s6) - shift

    expected = 0.0
    for i in (0, 1, 2):
        for j in (3, 4, 5):
            rr = float(np.linalg.norm(pos[i] - pos[j]))
            expected += u(rr)
    got = float(energies["lj"])
    assert got == pytest.approx(expected, rel=1e-4), (got, expected)


def test_harmonic_bond_analytic():
    built, systop, _ = testsystems.build_melt(n_mols=2, density=0.001,
                                              reactive=False, thermostat="no")
    spec, cfg = built.spec, built.cfg
    st = built.state
    pos = np.full((cfg.n_pad, 3), 0.5)
    # stretch molecule 1's first bond to 1.2 (r0 = 0.97, K_gromacs = 60)
    pos[0] = [10.0, 10.0, 10.0]
    pos[1] = [11.2, 10.0, 10.0]
    pos[2] = [11.2, 10.97, 10.0]
    pos[3] = [20.0, 20.0, 20.0]
    pos[4] = [20.97, 20.0, 20.0]
    pos[5] = [20.97, 20.97, 20.0]
    st = dataclasses.replace(st, pos=jnp.asarray(pos, st.pos.dtype))
    from chemlab_tpu.engine import integrate
    st = integrate.maybe_rebuild_neighbors(spec, cfg, st, force=True)
    _, energies, _ = integrate.compute_forces(spec, cfg, st)
    # espressopp convention U = K/2 (r - r0)^2 with K = 60 (SURVEY §2.1)
    expected = 0.0
    bonds = [(0, 1), (1, 2), (3, 4), (4, 5)]
    for i, j in bonds:
        r = float(np.linalg.norm(pos[i] - pos[j]))
        expected += 0.5 * 60.0 * (r - 0.97) ** 2
    got = float(energies["bond_f1"])
    assert got == pytest.approx(expected, rel=1e-4), (got, expected)
