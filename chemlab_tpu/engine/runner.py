"""Fused multi-step run blocks.

The reference's hot path is ``integrator.run(integrator_step)`` — a C++ loop
that Python re-enters every ``int_step`` steps for observables/dumps/stop
checks (ref: start_simulation.py:728-797).  Here the same structure is one
jitted ``lax.fori_loop`` over fused MD steps with the interval-gated
extensions (ChemicalReaction, ATRPActivator, hybrid-bond lambda ramp) folded
in, so a whole outer iteration is a single XLA program launch and the host
syncs only at block boundaries.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from . import integrate, observables, reactions
from .spec import EngineConfig, SimSpec
from .state import MDState


def _hybrid_lambda_ramp(spec: SimSpec, state: MDState,
                        cfg: EngineConfig = None) -> MDState:
    """Per-step lambda ramp for reaction-created (hybrid) bonds
    (FixedListDynamicResolution; ref: start_simulation.py:289-293), plus the
    angle/dihedral variants (t_hybrid_angle/t_hybrid_dihedral): any term
    whose lambda sits below 1 was created fading-in and ramps up.

    The dense/irregular bonded operands carry COPIES of lam/group
    (bonded_dense.py); the same elementwise rule applied to the copies
    keeps them in lockstep with the canonical tables between the
    reaction-interval re-derivations."""
    def bond_ramp(t):
        lam = jnp.where((t.group >= 0) & (t.lam < 1.0),
                        jnp.minimum(t.lam + spec.hybrid_bond_rate, 1.0),
                        t.lam)
        return dataclasses.replace(t, lam=lam)

    def angle_ramp(t):
        lam = jnp.where(t.lam < 1.0,
                        jnp.minimum(t.lam + spec.hybrid_angle_rate, 1.0),
                        t.lam)
        return dataclasses.replace(t, lam=lam)

    dihedrals = state.dihedrals
    d_lam = jnp.where(dihedrals.lam < 1.0,
                      jnp.minimum(dihedrals.lam + spec.hybrid_dihedral_rate, 1.0),
                      dihedrals.lam)
    upd = dict(
        bonds=bond_ramp(state.bonds),
        angles=angle_ramp(state.angles),
        dihedrals=dataclasses.replace(dihedrals, lam=d_lam))
    if cfg is not None and cfg.bonded_dense and state.bonds_dense is not None:
        upd.update(bonds_dense=bond_ramp(state.bonds_dense),
                   bonds_irr=bond_ramp(state.bonds_irr),
                   angles_dense=angle_ramp(state.angles_dense),
                   angles_irr=angle_ramp(state.angles_irr))
    return dataclasses.replace(state, **upd)


def step_with_extensions(spec: SimSpec, cfg: EngineConfig, state: MDState,
                         rng_seed: int = 0) -> MDState:
    """One MD step + interval-gated extensions (the engine hot loop)."""
    state = integrate.md_step(spec, cfg, state)
    if cfg.has_reactions:
        state = _hybrid_lambda_ramp(spec, state, cfg)
        fire = state.reactions_on & (state.step % cfg.reaction_interval == 0)

        def _fire(st):
            st = reactions.reaction_step(spec, cfg, st, rng_seed)
            # reaction intervals are the only in-jit site where the term
            # tables change: refresh the dense-static bonded + exclusion
            # operands here
            from . import bonded_dense, excl_dense

            return excl_dense.rederive(cfg, bonded_dense.rederive(cfg, st))

        state = jax.lax.cond(fire, _fire, lambda st: st, state)
    if cfg.has_atrp:
        fire = state.reactions_on & (state.step % cfg.atrp_interval == 0)
        state = jax.lax.cond(
            fire,
            lambda st: reactions.atrp_step(spec, cfg, st),
            lambda st: st,
            state)
    if cfg.has_freeze:
        state = reactions.freeze_region_step(spec, cfg, state)
    if cfg.has_cpt:
        fire = state.reactions_on & (state.step % cfg.cpt_interval == 0)
        state = jax.lax.cond(
            fire,
            lambda st: reactions.change_particle_type_step(spec, cfg, st),
            lambda st: st,
            state)
    return state


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "rng_seed"))
def run_block(spec: SimSpec, cfg: EngineConfig, state: MDState,
              n_steps: int, rng_seed: int = 0) -> MDState:
    """Run ``n_steps`` fused steps (one outer-loop iteration)."""
    def body(_, st):
        return step_with_extensions(spec, cfg, st, rng_seed)

    return jax.lax.fori_loop(0, n_steps, body, state)


@functools.partial(jax.jit, static_argnames=("cfg",))
def initial_forces(spec: SimSpec, cfg: EngineConfig, state: MDState) -> MDState:
    """Populate state.force before the first step (the reference engine
    computes forces during integrator initialization)."""
    force, _, _ = integrate.compute_forces(spec, cfg, state)
    return dataclasses.replace(state, force=force)


@functools.partial(jax.jit, static_argnames=("cfg",))
def measure_cheap(spec: SimSpec, cfg: EngineConfig, state: MDState):
    """Per-block bookkeeping WITHOUT the force/energy recompute: conversions
    (stop criteria), counters, overflow flag.  The full ``measure`` pass
    reruns all forces and is gated to the energy-collect cadence by the CLI
    (the reference's SystemMonitor likewise only evaluates energies at its
    own visit interval, ref: start_simulation.py:728-797)."""
    out = {
        "conversions": observables.conversions(spec, state.type_id,
                                               state.chem_state, state.active),
        "overflow": state.nbr.overflow,
        "reaction_counts": state.reaction_counts,
        "n_bonds": jnp.sum(state.bonds.valid.astype(jnp.int32)),
        "n_angles": jnp.sum(state.angles.valid.astype(jnp.int32)),
        "n_dihedrals": jnp.sum(state.dihedrals.valid.astype(jnp.int32)),
        "n_excl": state.n_excl,
    }
    if cfg.bonded_dense:
        # irregular-table occupancy: every padded irr row costs a per-step
        # gather + AD scatter (bonded_dense.py), so capacity planning sizes
        # the irr caps from THIS telemetry rather than the lockstep
        # worst-case (irr_cap tracking canonical-cap growth 1:1)
        out["n_bonds_irr"] = jnp.sum(state.bonds_irr.valid.astype(jnp.int32))
        out["n_angles_irr"] = jnp.sum(state.angles_irr.valid.astype(jnp.int32))
    if cfg.excl_offsets and state.excl_irr is not None:
        out["n_excl_irr"] = jnp.sum((state.excl_irr[:, 0] >= 0)
                                    .astype(jnp.int32))
    if cfg.n_groups:
        out["group_bonds"] = observables.group_bond_counts(state.bonds,
                                                           cfg.n_groups)
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def measure(spec: SimSpec, cfg: EngineConfig, state: MDState):
    """One fused observable pass: the SystemMonitor analog.

    Returns a dict of scalars: temperature, kinetic energy, per-term
    potential energies, conversions, per-group bond counts, counters.
    """
    force, energies, _ = integrate.compute_forces(spec, cfg, state)
    obs_x = observables.conversions(spec, state.type_id, state.chem_state,
                                    state.active)
    out = dict(energies)
    out["T"] = observables.temperature(state.mass, state.vel, state.active,
                                       spec.thermal_type_mask, state.type_id)
    out["ekin"] = observables.kinetic_energy(state.mass, state.vel, state.active)
    out["epot"] = sum(energies.values())
    out["conversions"] = obs_x
    if cfg.n_groups:
        out["group_bonds"] = observables.group_bond_counts(state.bonds,
                                                           cfg.n_groups)
    if cfg.barostat != "no" or cfg.store_pressure:
        out["P"] = integrate.virial_pressure(spec, cfg, state)
        out["boxL"] = state.box[0]
    out["reaction_counts"] = state.reaction_counts
    out["n_bonds"] = jnp.sum(state.bonds.valid.astype(jnp.int32))
    out["n_angles"] = jnp.sum(state.angles.valid.astype(jnp.int32))
    out["n_dihedrals"] = jnp.sum(state.dihedrals.valid.astype(jnp.int32))
    out["n_excl"] = state.n_excl
    if cfg.bonded_dense:
        out["n_bonds_irr"] = jnp.sum(state.bonds_irr.valid.astype(jnp.int32))
        out["n_angles_irr"] = jnp.sum(state.angles_irr.valid
                                      .astype(jnp.int32))
    if cfg.excl_offsets and state.excl_irr is not None:
        out["n_excl_irr"] = jnp.sum((state.excl_irr[:, 0] >= 0)
                                    .astype(jnp.int32))
    out["n_part"] = jnp.sum(state.active.astype(jnp.int32))
    out["max_force"] = observables.max_force(force, state.active)
    if cfg.has_fixd:
        out["num_fix_distances"] = jnp.sum((state.fixd_host >= 0)
                                           .astype(jnp.int32))
    if cfg.has_pps:
        # NParticlePairScalingEntries analog (ref: start_simulation.py:541-542):
        # func-14 pairs currently tracked in the neighbor list (birth-step
        # ramp entries); each pair appears in both rows of the full list
        j = state.nbr.idx
        slot_ok = j != jnp.arange(state.pos.shape[0], dtype=jnp.int32)[:, None]
        pp = state.type_id[:, None] * cfg.n_types + state.type_id[j]
        out["pair_scale"] = jnp.sum(
            (slot_ok & (spec.pair_pps_incr[pp] > 0.0)).astype(jnp.int32)) // 2
    if cfg.has_reactions:
        # mean lambda of reaction-created bonds (ResolutionFixedPairList)
        chem_rows = state.bonds.valid & (state.bonds.group >= 0)
        nsel = jnp.maximum(jnp.sum(chem_rows), 1)
        out["res_fpl"] = jnp.sum(jnp.where(chem_rows, state.bonds.lam, 0.0)) / nsel
    out["overflow"] = state.nbr.overflow
    return out
