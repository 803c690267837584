"""Velocity-Verlet integration with thermostats.

The reference hot loop (SURVEY.md §3.2) is: half-kick, drift, halo/neighbor
maintenance, forces, thermostat force adjustment, half-kick — with the
thermostat contribution living inside the force array (espressopp
LangevinThermostat adds friction+noise during force evaluation).  This module
reproduces that structure as one jitted step over the padded state.

Thermostats (ref: start_simulation.py:326-354):
  lv   Langevin: f += -gamma m v + sqrt(2 kT gamma m / dt) N(0,1), optionally
       restricted to thermal-group types (add_valid_types)
  vr   canonical (Bussi) stochastic velocity rescaling
  br   Berendsen weak coupling
  iso  isokinetic rescale every ``coupling`` steps
  no   NVE
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import bonded_forces, neighbor, observables, pair_forces
from .spec import EngineConfig, SimSpec
from .state import MDState


def _dense_of(cfg: EngineConfig, state: MDState):
    """The derived dense/irregular bonded operands, when enabled."""
    if cfg.bonded_dense and state.bonds_dense is not None:
        return (state.bonds_dense, state.bonds_irr,
                state.angles_dense, state.angles_irr)
    return None


def _excl_correction(spec: SimSpec, cfg: EngineConfig, state: MDState,
                     obs_x):
    """Excluded-pair correction for the pallas path: the dense-static
    rolled-plane leg (excl_dense.py) when derived operands exist, else
    the flat-list correction."""
    from . import excl_dense, pallas_pair

    kwargs = dict(active=state.active, has_tab=cfg.has_tabulated,
                  cheb=(cfg.cheb_kw, cfg.cheb_ko) if cfg.tab_cheb else None,
                  cheb_mix=cfg.cheb_mix, obs_x=obs_x)
    if cfg.excl_offsets and state.excl_masks is not None:
        return excl_dense.correction(
            spec, cfg, state.pos, state.box, state.type_id,
            state.excl_masks, state.excl_irr, **kwargs)
    return pallas_pair.excluded_pair_correction(
        spec, cfg.n_types, state.pos, state.box, state.type_id, state.excl,
        **kwargs)


def compute_forces(spec: SimSpec, cfg: EngineConfig, state: MDState,
                   want_energy: bool = True):
    """All conservative forces + per-term potential energies + conversions.

    ``want_energy=False`` (the per-step md_step call) lets the pallas fast
    path skip the pair-energy accumulation and — on the Chebyshev tabulated
    branch — the energy-coefficient lookups entirely (half the per-packet
    LUT matmuls); the returned pair energies are then zeros and must not be
    consumed (measure/initial_forces keep the default)."""
    if cfg.needs_conversions:
        obs_x = observables.conversions(spec, state.type_id, state.chem_state,
                                        state.active)
    else:
        # conversions feed no potential: skip the per-step reductions in the
        # hot loop (measure() recomputes them for monitoring)
        obs_x = jnp.zeros(spec.obs_total.shape[0], jnp.float32)
    if cfg.use_pallas:
        # cell-tile pallas kernel: all-pairs sum minus the exclusion list
        from . import pallas_halo, pallas_pair

        interpret = jax.default_backend() != "tpu"
        if pallas_halo.supports(cfg):
            # slab DD + ppermute ghost exchange (the reference's spatial
            # scaling analog; ref start_simulation.py:155-171)
            f_all, e_lj_all, e_tab_all, _ = pallas_halo.cell_pair_forces_halo(
                state.pos, state.type_id, state.active, state.box,
                state.nbr.buckets, cfg.cell_dims, spec,
                cfg.n_types, cfg.cell_cap, cfg.mesh, interpret=interpret,
                uniform_lj=cfg.uniform_lj, all_lj=cfg.all_lj,
                cheb_kw=cfg.cheb_kw if cfg.tab_cheb else 0,
                cheb_ko=cfg.cheb_ko, want_energy=want_energy,
                cheb_ntab=cfg.cheb_ntab, cheb_mix=cfg.cheb_mix,
                obs_x=obs_x)
        else:
            f_all, e_lj_all, e_tab_all, _ = pallas_pair.cell_pair_forces(
                state.pos, state.type_id, state.active, state.box,
                state.nbr.buckets, cfg.cell_dims, spec,
                cfg.n_types, cfg.cell_cap, interpret=interpret,
                uniform_lj=cfg.uniform_lj, all_lj=cfg.all_lj,
                slot_of=state.nbr.slot_of,
                cheb_kw=cfg.cheb_kw if cfg.tab_cheb else 0,
                cheb_ko=cfg.cheb_ko, want_energy=want_energy,
                cheb_ntab=cfg.cheb_ntab, cheb_mix=cfg.cheb_mix,
                obs_x=obs_x)
        f_ex, e_lj_ex, e_tab_ex, _ = _excl_correction(spec, cfg, state,
                                                      obs_x)
        f_pair = f_all - f_ex
        e_pair = {"lj": e_lj_all - e_lj_ex, "lj-tab": e_tab_all - e_tab_ex,
                  "coulomb": jnp.asarray(0.0, state.pos.dtype)}
    else:
        tab_a, tab_b, mix_x = pair_forces.resolve_pair_tables(
            spec, obs_x, cfg.n_mix_entries)
        f_pair, e_pair = pair_forces.pair_forces(
            spec, cfg.n_types, state.pos, state.box, state.type_id, state.q,
            state.lam, state.nbr.idx, state.nbr.excl_mask, tab_a, tab_b, mix_x,
            cfg=cfg, pps_step=state.step if cfg.has_pps else None,
            pps_birth=state.nbr.birth if cfg.has_pps else None)
    f_bond, e_bond = bonded_forces.bonded_forces(
        spec, cfg, state.pos, state.box, state.type_id, state.q,
        state.bonds, state.angles, state.dihedrals, state.pairs14,
        dense=_dense_of(cfg, state))
    force = f_pair + f_bond
    # global CapForce extension (ref: start_simulation.py:321-324);
    # overflow-safe norm: sum(F^2) can exceed float32 range on overlaps
    fmax = jnp.max(jnp.abs(force), axis=-1, keepdims=True)
    fdir = force / jnp.maximum(fmax, 1e-30)
    fmag = fmax * jnp.sqrt(jnp.sum(fdir * fdir, axis=-1, keepdims=True))
    cap = spec.max_force
    force = jnp.where(cap > 0.0, force * jnp.minimum(1.0, cap / jnp.maximum(fmag, 1e-30)), force)
    force = jnp.where(state.active[:, None], force, 0.0)
    energies = {**e_pair, **e_bond}
    return force, energies, obs_x


def _langevin_adjust(spec: SimSpec, state: MDState, force, key):
    """Langevin friction + noise folded into the force array."""
    sel = state.active & spec.thermal_type_mask[state.type_id]
    noise = jax.random.normal(key, state.vel.shape, dtype=state.vel.dtype)
    m = state.mass[:, None]
    amp = jnp.sqrt(2.0 * spec.kT * spec.gamma * m / spec.dt)
    adj = -spec.gamma * m * state.vel + amp * noise
    return force + jnp.where(sel[:, None], adj, 0.0)


def _rescale_thermostat(spec: SimSpec, cfg: EngineConfig, state: MDState, key):
    """Velocity-rescaling thermostats applied post-kick."""
    kT_now = observables.temperature(state.mass, state.vel, state.active,
                                     spec.thermal_type_mask, state.type_id)
    sel = state.active & spec.thermal_type_mask[state.type_id]
    nf = 3.0 * jnp.maximum(jnp.sum(sel), 1)
    if cfg.thermostat == "vr":
        # Bussi CSVR: dK relaxation + Wiener term on the kinetic energy.
        tau = jnp.maximum(spec.gamma, spec.dt)
        c = jnp.exp(-spec.dt / tau)
        k_now = 0.5 * nf * kT_now
        k_target = 0.5 * nf * spec.kT
        r = jax.random.normal(key, ())
        k_new = (k_now * c
                 + k_target / nf * (1.0 - c) * (nf - 1.0 + r * r)
                 + 2.0 * r * jnp.sqrt(k_now * k_target / nf * (1.0 - c) * c))
        scale = jnp.sqrt(jnp.maximum(k_new, 1e-30) / jnp.maximum(k_now, 1e-30))
    elif cfg.thermostat == "br":
        tau = jnp.maximum(spec.gamma, spec.dt)
        scale = jnp.sqrt(1.0 + spec.dt / tau * (spec.kT / jnp.maximum(kT_now, 1e-30) - 1.0))
    elif cfg.thermostat == "iso":
        # rescale only every `coupling` steps (ref Isokinetic coupling =
        # int(thermostat_gamma), ref: start_simulation.py:345-348)
        due = (state.step % cfg.iso_coupling) == 0
        scale = jnp.where(due,
                          jnp.sqrt(spec.kT / jnp.maximum(kT_now, 1e-30)), 1.0)
    else:
        scale = jnp.asarray(1.0, state.vel.dtype)
    vel = jnp.where(sel[:, None], state.vel * scale, state.vel)
    return dataclasses.replace(state, vel=vel)


def virial_pressure(spec: SimSpec, cfg: EngineConfig, state: MDState):
    """Instantaneous pressure P = (2 Ekin + W) / 3V (espressopp
    analysis.Pressure; ref: start_simulation.py:357).

    Row path: virial from the strain derivative W = -dU/ds (positions and
    box scaled by s) — one autodiff pass covers every potential variant.
    Pallas path: the cell-tile kernel's own pair-virial channel (sum of
    (F/r) r^2 minus the excluded pairs' share) plus the strain derivative
    of the bonded terms — the lazy-row fast path keeps no per-step Verlet
    rows for the autodiff form, so NPT no longer forces the slow path."""

    def u_bonded(s):
        e_bond = bonded_forces.bonded_energy_terms(
            spec, cfg, state.pos * s, state.box * s, state.type_id, state.q,
            state.bonds, state.angles, state.dihedrals, state.pairs14,
            dense=_dense_of(cfg, state))
        tot = jnp.asarray(0.0, state.pos.dtype)
        for v in e_bond.values():
            tot = tot + v
        return tot

    if cfg.use_pallas:
        from . import pallas_halo, pallas_pair

        interpret = jax.default_backend() != "tpu"
        obs_x = (observables.conversions(spec, state.type_id,
                                         state.chem_state, state.active)
                 if cfg.cheb_mix else None)
        if pallas_halo.supports(cfg):
            _, _, _, w_all = pallas_halo.cell_pair_forces_halo(
                state.pos, state.type_id, state.active, state.box,
                state.nbr.buckets, cfg.cell_dims, spec,
                cfg.n_types, cfg.cell_cap, cfg.mesh, interpret=interpret,
                uniform_lj=cfg.uniform_lj, all_lj=cfg.all_lj,
                want_virial=True,
                cheb_kw=cfg.cheb_kw if cfg.tab_cheb else 0,
                cheb_ko=cfg.cheb_ko, cheb_ntab=cfg.cheb_ntab,
                cheb_mix=cfg.cheb_mix, obs_x=obs_x)
        else:
            _, _, _, w_all = pallas_pair.cell_pair_forces(
                state.pos, state.type_id, state.active, state.box,
                state.nbr.buckets, cfg.cell_dims, spec,
                cfg.n_types, cfg.cell_cap, interpret=interpret,
                uniform_lj=cfg.uniform_lj, all_lj=cfg.all_lj,
                slot_of=state.nbr.slot_of, want_virial=True,
                cheb_kw=cfg.cheb_kw if cfg.tab_cheb else 0,
                cheb_ko=cfg.cheb_ko, cheb_ntab=cfg.cheb_ntab,
                cheb_mix=cfg.cheb_mix, obs_x=obs_x)
        _, _, _, w_ex = _excl_correction(spec, cfg, state, obs_x)
        w = (w_all - w_ex) - jax.grad(u_bonded)(
            jnp.asarray(1.0, state.pos.dtype))
    else:
        obs_x = observables.conversions(spec, state.type_id, state.chem_state,
                                        state.active)
        tab_a, tab_b, mix_x = pair_forces.resolve_pair_tables(
            spec, obs_x, cfg.n_mix_entries)

        def utotal(s):
            pos = state.pos * s
            box = state.box * s
            _, e_pair = pair_forces.pair_forces(
                spec, cfg.n_types, pos, box, state.type_id, state.q, state.lam,
                state.nbr.idx, state.nbr.excl_mask, tab_a, tab_b, mix_x)
            tot = u_bonded(s)
            for v in e_pair.values():
                tot = tot + v
            return tot

        w = -jax.grad(utotal)(jnp.asarray(1.0, state.pos.dtype))
    ekin = observables.kinetic_energy(state.mass, state.vel, state.active)
    vol = jnp.prod(state.box)
    return (2.0 * ekin + w) / (3.0 * vol)


def _barostat_step(spec: SimSpec, cfg: EngineConfig, state: MDState, key) -> MDState:
    """Isotropic box scaling (ref: start_simulation.py:364-372).

    'br' — Berendsen weak coupling: mu = (1 - dt/tau (P0 - P))^(1/3)
    'lv' — Langevin piston on the log-volume velocity with friction gammaP
           and thermal noise (espressopp LangevinBarostat behavior).
    """
    p_now = virial_pressure(spec, cfg, state)
    dt = spec.dt
    if cfg.barostat == "br":
        # clip the base BEFORE the fractional power: a strongly negative
        # instantaneous pressure could make it negative -> NaN
        base = jnp.clip(1.0 - dt / spec.barostat_tau * (spec.pressure - p_now),
                        0.9, 1.1)
        mu = base ** (1.0 / 3.0)
        baro_v = state.baro_v
    else:  # 'lv'
        w = jnp.maximum(spec.barostat_mass, 1e-6)
        vol = jnp.prod(state.box)
        noise = jax.random.normal(key, ())
        dv = (dt * 3.0 * vol * (p_now - spec.pressure) / w
              - dt * spec.barostat_gammaP * state.baro_v
              + jnp.sqrt(2.0 * spec.kT * spec.barostat_gammaP * dt / w) * noise)
        baro_v = state.baro_v + dv
        mu = jnp.exp(dt * baro_v)
    mu = jnp.clip(mu, 0.98, 1.02)   # keep single-step strain sane
    pos = jnp.where(state.active[:, None], state.pos * mu, state.pos)
    return dataclasses.replace(state, pos=pos, box=state.box * mu,
                               baro_v=baro_v)


def maybe_rebuild_neighbors(spec: SimSpec, cfg: EngineConfig, state: MDState,
                            force: bool = False) -> MDState:
    """Rebuild the Verlet list if the skin criterion triggered (lax.cond)."""
    rc_skin = jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin
    trigger = neighbor.needs_rebuild(state.pos, state.nbr, state.box, spec.skin)
    if force:
        trigger = jnp.asarray(True)

    def rebuild(st):
        if cfg.lazy_rows:
            # pallas cell-tile force path: only the buckets feed the forces;
            # rows are rebuilt transiently at reaction steps (reactions.py)
            nbr = neighbor.refresh_buckets(st.nbr, st.pos, st.box, st.active,
                                           dims=cfg.cell_dims,
                                           cell_cap=cfg.cell_cap)
            return dataclasses.replace(st, nbr=nbr)
        nbr = neighbor.build_neighbor_state(
            st.pos, st.box, st.active, st.excl, rc_skin,
            dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
            max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap,
            track_birth=cfg.has_pps, prev=st.nbr if cfg.has_pps else None,
            step=st.step, mesh=cfg.mesh)
        nbr = dataclasses.replace(
            nbr,
            n_rebuilds=st.nbr.n_rebuilds + 1,
            overflow=st.nbr.overflow | nbr.overflow)
        return dataclasses.replace(st, nbr=nbr)

    return jax.lax.cond(trigger, rebuild, lambda st: st, state)


def _fix_distances(spec: SimSpec, cfg: EngineConfig, state: MDState) -> MDState:
    """FixDistances constraint projection + auto-release
    (ref: reaction_post_process.py:269-289; espressopp integrator.FixDistances).

    Each (host, dummy) row pins the dummy at fd_eq from its host (position
    reset along the current separation, velocity copied from the host).  When
    fd_host_type >= 0, a constraint whose host no longer has that type is
    released: the dummy becomes fd_target_type at lambda 0 and starts the
    BasicDynamicResolution fade-in.
    """
    h = state.fixd_host
    d = state.fixd_dummy
    valid = (h >= 0) & (d >= 0)
    hc = jnp.maximum(h, 0)
    dc = jnp.maximum(d, 0)
    n = state.pos.shape[0]

    # resolve each constraint's owning definition by its dummy's type
    t_dummy = state.type_id[dc]
    def_idx = jnp.zeros_like(h)
    for k in range(cfg.n_fd):
        def_idx = jnp.where(t_dummy == spec.fd_dummy_type[k], k, def_idx)
    eq = spec.fd_eq[def_idx]
    host_t = spec.fd_host_type[def_idx]
    target_t = spec.fd_target_type[def_idx]
    rel_lam = spec.fd_release_lam[def_idx]

    # release on host type change
    release = valid & (host_t >= 0) & (state.type_id[hc] != host_t)
    dsel = jnp.where(release, dc, n)
    type_id = state.type_id.at[dsel].set(jnp.maximum(target_t, 0), mode="drop")
    mass = state.mass.at[dsel].set(
        spec.type_mass[jnp.maximum(target_t, 0)], mode="drop")
    lam = state.lam.at[dsel].set(rel_lam, mode="drop")
    h = jnp.where(release, -1, h)
    d = jnp.where(release, -1, d)
    valid &= ~release

    # constraint projection for remaining rows
    dr = state.pos[dc] - state.pos[hc]
    dr -= state.box * jnp.round(dr / state.box)
    norm = jnp.sqrt(jnp.sum(dr * dr, -1, keepdims=True))
    unit = jnp.where(norm > 1e-9, dr / jnp.maximum(norm, 1e-9),
                     jnp.asarray([[1.0, 0.0, 0.0]], dr.dtype))
    target = state.pos[hc] + eq[:, None] * unit
    target -= state.box * jnp.floor(target / state.box)
    pos = state.pos.at[jnp.where(valid, dc, n)].set(target, mode="drop")
    vel = state.vel.at[jnp.where(valid, dc, n)].set(state.vel[hc], mode="drop")
    return dataclasses.replace(state, pos=pos, vel=vel, type_id=type_id,
                               mass=mass, lam=lam, fixd_host=h, fixd_dummy=d)


def _dynamic_resolution(spec: SimSpec, state: MDState) -> MDState:
    """BasicDynamicResolution: lambda += alpha(type) per step; at lambda >= 1
    fire the final property change (ref: reaction_post_process.py:291-310)."""
    alpha = spec.dr_alpha[state.type_id]
    lam = jnp.where(state.active & (alpha > 0.0),
                    jnp.minimum(state.lam + alpha, 1.0), state.lam)
    final = spec.dr_final_type[state.type_id]
    # fire only on CROSSING 1.0: particles of a ramped type that already sit
    # at full resolution (e.g. never-dissociated reactants) must not convert
    fire = state.active & (alpha > 0.0) & (state.lam < 1.0) \
        & (lam >= 1.0) & (final >= 0)
    fc = jnp.maximum(final, 0)
    type_id = jnp.where(fire, fc, state.type_id)
    mass = jnp.where(fire, spec.type_mass[fc], state.mass)
    q = jnp.where(fire, spec.type_q[fc], state.q)
    # dissociation fade keeps the accumulated chemical state; ReleaseMolecule
    # finals adopt the atomtype default (ref: reaction_post_process.py:296-306
    # vs reaction_setup.py:322-354)
    chem = jnp.where(fire & spec.dr_set_state[state.type_id],
                     spec.type_state[fc], state.chem_state)
    return dataclasses.replace(state, lam=lam, type_id=type_id, mass=mass,
                               q=q, chem_state=chem)


def md_step(spec: SimSpec, cfg: EngineConfig, state: MDState) -> MDState:
    """One velocity-Verlet step (ref hot loop, SURVEY.md §3.2)."""
    dt = spec.dt
    inv_m = jnp.where(state.active, 1.0 / state.mass, 0.0)[:, None]

    # half kick + drift (state.force carries the previous step's full force,
    # including the thermostat contribution, as in the reference engine)
    vel = state.vel + 0.5 * dt * state.force * inv_m
    pos = state.pos + dt * vel
    # fold into the box, tracking periodic images
    shift = jnp.floor(pos / state.box).astype(jnp.int32)
    pos = pos - shift.astype(pos.dtype) * state.box
    state = dataclasses.replace(state, pos=pos, vel=vel,
                                image=state.image + shift)

    if cfg.has_fixd:
        state = _fix_distances(spec, cfg, state)
    if cfg.has_dyn_resolution:
        state = _dynamic_resolution(spec, state)

    state = maybe_rebuild_neighbors(spec, cfg, state)

    force, _, _ = compute_forces(spec, cfg, state, want_energy=False)

    key, sub = jax.random.split(state.key)
    if cfg.thermostat == "lv":
        force = _langevin_adjust(spec, state, force, sub)

    vel = state.vel + 0.5 * dt * force * inv_m
    state = dataclasses.replace(state, vel=vel, force=force, key=key,
                                step=state.step + 1)

    if cfg.thermostat in ("vr", "br", "iso"):
        key, sub = jax.random.split(state.key)
        state = _rescale_thermostat(spec, cfg, dataclasses.replace(state, key=key), sub)

    if cfg.barostat != "no":
        key, sub = jax.random.split(state.key)
        state = _barostat_step(spec, cfg,
                               dataclasses.replace(state, key=key), sub)
    return state
