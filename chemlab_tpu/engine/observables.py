"""On-device observables.

Replaces the reference's espressopp.analysis.* compute() objects
(SURVEY.md §2.3 "Analysis observables") with cheap fused reductions:
conversions (ChemicalConversion / ChemicalConversionTypeState), temperature,
kinetic energy, bond counts per reaction group.
"""

from __future__ import annotations

import jax.numpy as jnp

from .spec import SimSpec
from .state import TermTable


def conversions(spec: SimSpec, type_id, chem_state, active) -> jnp.ndarray:
    """Conversion observables x_o = count_o / total_o.

    Each observable sums one or more (type, state) match counts
    (ref: tools.py:143-155 count_type accumulation; analysis.ChemicalConversion).
    Returns (n_obs,) float32.
    """
    n_obs = spec.obs_total.shape[0]
    counts = jnp.zeros(n_obs, dtype=jnp.float32)
    n_entries = spec.obs_entry_obs.shape[0]
    for e in range(n_entries):
        t = spec.obs_entry_type[e]
        s = spec.obs_entry_state[e]
        match = active & (type_id == t) & ((s < 0) | (chem_state == s))
        counts = counts.at[spec.obs_entry_obs[e]].add(jnp.sum(match).astype(jnp.float32))
    return counts / jnp.maximum(spec.obs_total, 1.0)


def kinetic_energy(mass, vel, active) -> jnp.ndarray:
    v2 = jnp.sum(vel * vel, axis=-1)
    return 0.5 * jnp.sum(jnp.where(active, mass * v2, 0.0))


def temperature(mass, vel, active, type_mask=None, type_id=None) -> jnp.ndarray:
    """Instantaneous kT = 2 Ekin / (3 N) over the thermal group."""
    sel = active
    if type_mask is not None and type_id is not None:
        sel = sel & type_mask[type_id]
    v2 = jnp.sum(vel * vel, axis=-1)
    ekin = 0.5 * jnp.sum(jnp.where(sel, mass * v2, 0.0))
    n = jnp.maximum(jnp.sum(sel), 1)
    return 2.0 * ekin / (3.0 * n)


def group_bond_counts(bonds: TermTable, n_groups: int) -> jnp.ndarray:
    """NFixedPairListEntries per reaction group (chem_fpl counters)."""
    valid = bonds.valid
    counts = jnp.zeros(n_groups, dtype=jnp.int32)
    grp = jnp.where(valid, bonds.group, n_groups)
    counts = counts.at[jnp.clip(grp, 0, n_groups)].add(
        jnp.where(valid & (bonds.group >= 0), 1, 0), mode="drop")
    return counts


def type_counts(type_id, active, n_types: int) -> jnp.ndarray:
    """Particle count per type (ChemicalConversion numerators, counters)."""
    counts = jnp.zeros(n_types, dtype=jnp.int32)
    return counts.at[jnp.where(active, type_id, n_types)].add(1, mode="drop")


def cm_velocity(mass, vel, active):
    m = jnp.where(active, mass, 0.0)
    p = jnp.sum(m[:, None] * vel, axis=0)
    return p / jnp.maximum(jnp.sum(m), 1e-30)


def reset_cm_velocity(mass, vel, active):
    """CMVelocity().reset() equivalent (ref: start_simulation.py:680-682)."""
    v_cm = cm_velocity(mass, vel, active)
    return jnp.where(active[:, None], vel - v_cm, vel)


def max_force(force, active):
    f2 = jnp.sum(force * force, axis=-1)
    return jnp.sqrt(jnp.max(jnp.where(active, f2, 0.0)))


def angle_distribution(pos, box, angles, n_bins: int = 180):
    """Histogram of valid angle-table angles over [0, pi]
    (espressopp analysis.AngleDistribution)."""
    i, j, k = angles.idx[:, 0], angles.idx[:, 1], angles.idx[:, 2]
    valid = i >= 0
    i, j, k = jnp.maximum(i, 0), jnp.maximum(j, 0), jnp.maximum(k, 0)
    rij = pos[i] - pos[j]
    rij -= box * jnp.round(rij / box)
    rkj = pos[k] - pos[j]
    rkj -= box * jnp.round(rkj / box)
    nij = jnp.sqrt(jnp.sum(rij * rij, -1) + 1e-30)
    nkj = jnp.sqrt(jnp.sum(rkj * rkj, -1) + 1e-30)
    c = jnp.clip(jnp.sum(rij * rkj, -1) / (nij * nkj), -1.0, 1.0)
    theta = jnp.arccos(c)
    bins = jnp.clip((theta / jnp.pi * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros(n_bins, jnp.int32)
    return hist.at[jnp.where(valid, bins, n_bins)].add(1, mode="drop")
