"""Nonbonded pair forces over the Verlet neighbor rows.

One fused evaluation covers every nonbonded variant the reference registers
as separate VerletList* interaction objects (SURVEY.md §2.3 "Interactions"):
plain/energy-capped LJ, plain/capped/mixed/multi/dynamic-resolution tabulated
potentials, and truncated Coulomb.  Dispatch is branchless: per-type-pair
dispatch tables are gathered per neighbor entry and every kind contributes
through masks (the MXU/VPU-friendly formulation — no data-dependent control
flow).

Conventions:
  - tables store F = -dU/dr (GROMACS convention); the force on particle i
    from j is F(r) * (r_i - r_j)/r
  - LJ energies are shifted so U(cutoff) = 0, matching espressopp's default
    shift="auto" used by the reference (ref: gromacs_topology.py:717)
  - energy-capped variants clamp r to caprad (flat energy, zero force below
    caprad; ref funcs 13/16, gromacs_topology.py:619-641)
  - dynamic-resolution pairs scale U and F by lambda_i * lambda_j
    (ref funcs 11/15, gromacs_topology.py:819-862)
"""

from __future__ import annotations

import jax.numpy as jnp

from . import tables
from .spec import MIX_OBS, PAIR_LJ, PAIR_TAB, SimSpec


def resolve_pair_tables(spec: SimSpec, obs_x, n_mix_entries: int):
    """Resolve conversion-dependent table selection/mixing for this step.

    Returns per-type-pair (tab_a, tab_b, x) with the func-9 MultiTabulated
    range selection and func-17 multi-range mixing applied
    (ref: gromacs_topology.py:724-754).
    """
    tab_a = spec.pair_tab_a
    tab_b = spec.pair_tab_b
    x = jnp.where(spec.pair_mix_mode == MIX_OBS, obs_x[spec.pair_obs], spec.pair_mix_x)
    for m in range(n_mix_entries):
        p = spec.mix_pair[m]
        xv = obs_x[spec.mix_obs[m]]
        active = (xv >= spec.mix_lo[m]) & (xv < spec.mix_hi[m])
        is_blend = spec.mix_tab_a[m] != spec.mix_tab_b[m]
        tab_a = tab_a.at[p].set(jnp.where(active, spec.mix_tab_a[m], tab_a[p]))
        tab_b = tab_b.at[p].set(jnp.where(active, spec.mix_tab_b[m], tab_b[p]))
        # func-17 entries blend inside the range with the raw conversion value;
        # func-9 entries (tab_a == tab_b) are pure table switches.
        x = x.at[p].set(jnp.where(active & is_blend, xv, jnp.where(active, 1.0, x[p])))
    return tab_a, tab_b, x


def pair_forces(spec: SimSpec, n_types: int, pos, box, type_id, q, lam, nbr_idx,
                excl_mask, tab_a, tab_b, mix_x, cfg=None, pps_step=None,
                pps_birth=None):
    """Compute nonbonded forces and energies over neighbor rows.

    Returns (force (N,3), energies dict). Energies are per-kind sums
    ('lj', 'lj-tab', 'coulomb') halved for double counting.  When ``cfg``
    is given, its static flags elide absent physics (tabulated pairs,
    coulomb, caps, lambda scaling) from the compiled hot loop.
    """
    has_tab = cfg is None or cfg.has_tabulated
    has_lj = cfg is None or cfg.has_lj
    has_qq = cfg is None or cfg.has_coulomb
    has_cap = cfg is None or cfg.has_caps
    has_lam = cfg is None or cfg.has_lambda_pairs
    has_mix = cfg is None or cfg.has_mixed_tables
    n = pos.shape[0]
    j = nbr_idx
    # ONE wide gather of (N, K, 4) packed [x, y, z, type], then per-axis
    # (N, K) planes for the math: measured on v5e, three narrow per-axis
    # gathers cost ~2.5x the single row gather (gathers dominate the step),
    # and the gather wall is flat in row width up to 16 bytes — packing the
    # type into the spare channel makes the separate type_id[j] gather
    # (another N*K elements) free.  The *math* stays on (N, K) planes to
    # avoid any (.., 3)-lane-dim elementwise tensors (T(8,128) pads 3 -> 128).
    packed = jnp.concatenate(
        [pos, type_id.astype(pos.dtype)[:, None]], axis=-1)   # (N, 4)
    pj = packed[j]                          # (N, K, 4)
    drs = []
    r2 = jnp.zeros(j.shape, pos.dtype)
    for ax in range(3):
        d = pos[:, ax][:, None] - pj[..., ax]   # r_i - r_j
        d -= box[ax] * jnp.round(d / box[ax])
        drs.append(d)
        r2 += d * d
    mask = (j != jnp.arange(n, dtype=jnp.int32)[:, None]) & ~excl_mask
    r2 = jnp.where(mask, r2, 1.0)           # keep math finite on dead slots
    r = jnp.sqrt(r2)

    ti = type_id[:, None]
    tj = pj[..., 3].astype(jnp.int32)       # exact: type ids << 2^24
    p = ti * n_types + tj

    # Per-type-pair parameters ride PACKED 16-byte rows assembled host-side
    # cheap on (T^2,) columns: every additional per-pair (N, K) gather costs
    # ~10 ms at 100k on v5e (the gather wall), so kind/cutoff2/table/r0/dr
    # come back in ONE row gather instead of five.  The combo channel packs
    # [kind | lam_flag | tab_id] as exact small ints in f32.
    lam_flag = spec.pair_lam_scale.astype(jnp.float32) if has_lam else \
        jnp.zeros_like(spec.pair_cutoff2)
    combo = (spec.pair_kind.astype(jnp.float32) + 4.0 * lam_flag
             + 8.0 * tab_a.astype(jnp.float32))
    row_a = jnp.stack([spec.pair_cutoff2, combo,
                       spec.nb_r0[tab_a], spec.nb_dr[tab_a]], axis=-1)
    ra = row_a[p]                           # (N, K, 4)
    c_int = ra[..., 1].astype(jnp.int32)
    kind = c_int & 3
    in_cut = r2 < ra[..., 0]
    zero = jnp.zeros_like(r2)
    if has_cap:
        row_c = jnp.stack([spec.pair_caprad, spec.pair_max_force,
                           jnp.zeros_like(spec.pair_caprad),
                           jnp.zeros_like(spec.pair_caprad)], axis=-1)
        rc_ = row_c[p]
        caprad = rc_[..., 0]
        r_eff = jnp.where(caprad > 0.0, jnp.maximum(r, caprad), r)
        above_cap = r >= caprad
    else:
        caprad = None
        r_eff = r
        above_cap = True

    # ---- Lennard-Jones ----
    if has_lj:
        row_l = jnp.stack([spec.pair_sig, spec.pair_eps, spec.pair_shift,
                           jnp.zeros_like(spec.pair_sig)], axis=-1)
        rl = row_l[p]
        sig = rl[..., 0]
        eps = rl[..., 1]
        s2 = (sig * sig) / (r_eff * r_eff)
        s6 = s2 * s2 * s2
        lj_mask = mask & (kind == PAIR_LJ) & in_cut
        e_lj = jnp.where(lj_mask, 4.0 * eps * (s6 * s6 - s6) - rl[..., 2], 0.0)
        # F(r)/r with F = -dU/dr; zero below caprad (flat capped energy)
        f_lj = jnp.where(lj_mask & above_cap,
                         48.0 * eps * (s6 * s6 - 0.5 * s6) / (r_eff * r_eff), 0.0)
    else:
        e_lj, f_lj = zero, zero

    # ---- tabulated (with mixing) ----
    if has_tab:
        tab_mask = mask & (kind == PAIR_TAB) & in_cut
        # one interleaved-row gather fetches both interpolation endpoints
        # (the gather count is the dominant per-step cost of this path);
        # the flat-index form with row-sourced r0/dr is op-for-op identical
        # to tables.interpolate4 (same f32 values, same division/clip/blend)
        n_bins = spec.nb_ef4.shape[1]
        ef4_flat = spec.nb_ef4.reshape(-1, 4)
        ta = c_int >> 3
        u = (r_eff - ra[..., 2]) / ra[..., 3]
        u = jnp.clip(u, 0.0, n_bins - 1.000001)
        i0 = u.astype(jnp.int32)
        frac = (u - i0)[..., None]
        v = ef4_flat[ta * n_bins + i0]
        ef_ab = v[..., :2] * (1.0 - frac) + v[..., 2:] * frac
        ea, fa = ef_ab[..., 0], ef_ab[..., 1]
        if has_mix:
            eb, fb = tables.interpolate4(spec.nb_ef4, spec.nb_r0, spec.nb_dr,
                                         tab_b[p], r_eff)
            xm = mix_x[p]
            e_tab = xm * ea + (1.0 - xm) * eb
            f_tab = xm * fa + (1.0 - xm) * fb
        else:
            e_tab, f_tab = ea, fa
        e_tab = jnp.where(tab_mask, e_tab, 0.0)
        f_tab = jnp.where(tab_mask & above_cap, f_tab / r, 0.0)
    else:
        e_tab, f_tab = zero, zero

    # ---- dynamic-resolution lambda scaling ----
    if has_lam:
        w = jnp.where((c_int & 4) > 0, lam[:, None] * lam[j], 1.0)
        e_lj, f_lj = e_lj * w, f_lj * w
        e_tab, f_tab = e_tab * w, f_tab * w

    # ---- ParticlePairScaling fade-in (func 14): new neighbor pairs ramp
    #      from 0 to 1 by pps_incr per step since the pair first appeared ----
    if cfg is not None and cfg.has_pps and pps_step is not None:
        incr = spec.pair_pps_incr[p]
        age = (pps_step - pps_birth).astype(jnp.float32)
        ramp = jnp.clip(age * incr, 0.0, 1.0)
        w14 = jnp.where(incr > 0.0, ramp, 1.0)
        e_tab, f_tab = e_tab * w14, f_tab * w14
        e_lj, f_lj = e_lj * w14, f_lj * w14

    # ---- per-pair force cap ----
    f_nb = f_lj + f_tab
    if has_cap:
        fmax = rc_[..., 1]
        fmag = jnp.abs(f_nb) * r
        scale = jnp.where((fmax > 0.0) & (fmag > fmax),
                          fmax / jnp.maximum(fmag, 1e-30), 1.0)
        f_nb = f_nb * scale

    # ---- truncated Coulomb ----
    if has_qq:
        qq_mask = mask & (r2 < spec.qq_cutoff2) & (spec.qq_prefactor > 0.0)
        qq = spec.qq_prefactor * q[:, None] * q[j]
        e_qq = jnp.where(qq_mask, qq / r, 0.0)
        f_qq = jnp.where(qq_mask, qq / (r2 * r), 0.0)
    else:
        e_qq, f_qq = zero, zero

    f_over_r = f_nb + f_qq
    force = jnp.stack([jnp.sum(f_over_r * d, axis=1) for d in drs], axis=-1)

    energies = {
        "lj": 0.5 * jnp.sum(e_lj),
        "lj-tab": 0.5 * jnp.sum(e_tab),
        "coulomb": 0.5 * jnp.sum(e_qq),
    }
    return force, energies
