"""The on-device reactive layer.

TPU-native equivalent of espressopp's ``integrator.ChemicalReaction`` driver
plus its Reaction/DissociationReaction channels and post-processes
(ref: SURVEY.md §3.3; chemlab config in reaction_setup.py:408-541).  Runs
every ``interval`` MD steps as one fused, shape-static program:

  1. candidate matching over the Verlet neighbor rows: type + state windows,
     distance test (hard cutoff or Gaussian ReactionCutoffRandom), molecule /
     residue constraints, bonded-neighbour-state constraints (exchange)
  2. Monte-Carlo acceptance with W = rate * dt * interval (espressopp's
     acceptance rule) from a counter-based pair-symmetric hash, so both
     endpoints of a pair draw the same number under any sharding
  3. deterministic conflict resolution: each particle joins at most one
     reaction per interval via mutual-argmin matching on a symmetric key
     (distance in ``nearest`` mode, the hash otherwise), then a global
     ``max_per_interval`` cap by priority
  4. event application: bond creation into the group table, state deltas,
     type changes (with per-type mass/charge updates), topology-manager
     updates (adjacency, auto-generated angles/dihedrals by type signature,
     dynamic exclusions, molecule merge) and ChangeNeighboursProperty BFS
  5. dissociation channels over the bond table: distance-triggered breaks
     (W = rate * dt * interval when r > cutoff) plus spontaneous breaks
     (W = diss_rate * dt * interval), with dependent angle/dihedral/exclusion
     removal and molecule relabeling

Deviation from the reference noted in reaction_compile.py: lambda fade-in /
fade-out (BasicDynamicResolution) is applied as an instant switch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import neighbor, topo
from .spec import EngineConfig, SimSpec
from .state import MDState

I32 = jnp.int32
F32 = jnp.float32


# ---------------------------------------------------------------------------
# counter-based uniform hash (pair-symmetric, reproducible under sharding)
# ---------------------------------------------------------------------------

def _mix(x):
    """splitmix64-style 32-bit finalizer (statistical-quality MC draws)."""
    x = jnp.asarray(x, jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def pair_uniform(seed, step, lo, hi, salt):
    """U[0,1) keyed by (seed, step, unordered pair, salt)."""
    h = _mix(jnp.asarray(lo, jnp.uint32) + jnp.uint32(0x9E3779B9))
    h = _mix(h ^ jnp.asarray(hi, jnp.uint32))
    h = _mix(h ^ jnp.asarray(step, jnp.uint32))
    h = _mix(h ^ jnp.asarray(salt, jnp.uint32))
    h = _mix(h ^ jnp.asarray(seed, jnp.uint32))
    return h.astype(F32) * jnp.float32(2.3283064e-10)  # / 2^32


def _gauss_from_uniform(u1, u2):
    """Box-Muller (single branch) for the Gaussian reaction cutoff."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    return r * jnp.cos(2.0 * jnp.pi * u2)


# ---------------------------------------------------------------------------
# candidate matching
# ---------------------------------------------------------------------------

def _channel_accept(spec: SimSpec, cfg: EngineConfig, state: MDState, seed,
                    i_idx, j, r2, slot_valid, r: int, t1_is_lo):
    """Directed acceptance of channel ``r`` for neighbor slots.

    ``t1_is_lo`` selects the direction: True tests (min-side as type_1) —
    encoded canonically so row i and row j agree bit-for-bit.
    """
    lo = jnp.minimum(i_idx, j)
    hi = jnp.maximum(i_idx, j)
    a = jnp.where(t1_is_lo, lo, hi)   # type_1 side
    b = jnp.where(t1_is_lo, hi, lo)   # type_2 side
    ta = state.type_id[a]
    tb = state.type_id[b]
    sa = state.chem_state[a]
    sb = state.chem_state[b]

    m = slot_valid
    m &= (ta == spec.r_t1[r]) & (tb == spec.r_t2[r])
    m &= (sa >= spec.r_min1[r]) & (sa < spec.r_max1[r])
    m &= (sb >= spec.r_min2[r]) & (sb < spec.r_max2[r])
    m &= state.reaction_active[r] & ~spec.r_is_diss[r]

    # distance test: hard cutoff, or per-(pair, interval) Gaussian sample
    # (ReactionCutoffRandom; ref: reaction_setup.py:107-111).  A negative
    # drawn cutoff rejects everything (squaring would lose the sign).
    # Symmetric channels (t1 == t2) must draw ONE number per unordered pair,
    # else the two directions double the acceptance rate.
    symmetric = spec.r_t1[r] == spec.r_t2[r]
    dir_salt = jnp.where(symmetric, 0, jnp.where(t1_is_lo, 0, 1))
    u1 = pair_uniform(seed, state.step, lo, hi, 4 * r + 2)
    u2 = pair_uniform(seed, state.step, lo, hi, 4 * r + 3)
    gcut = spec.r_eq[r] + spec.r_sigma[r] * _gauss_from_uniform(u1, u2)
    cut2 = jnp.where(spec.r_sigma[r] > 0.0,
                     jnp.where(gcut > 0.0, gcut * gcut, -1.0),
                     spec.r_cutoff2[r])
    m &= (r2 <= cut2) & (r2 >= spec.r_min_cutoff2[r])

    # molecule / residue constraints
    m &= spec.r_intramolecular[r] | (state.mol_id[a] != state.mol_id[b])
    m &= spec.r_intraresidual[r] | (state.res_id[a] != state.res_id[b])

    # no existing bond between the pair
    m &= ~jnp.any(state.adj[a] == b[..., None], axis=-1)

    # RestrictReaction connectivity whitelist (ref: reaction_setup.py:115-128);
    # binary search on lo, then a bounded scan over the equal-lo run (the
    # bound is the build-time maximum run length, so no pair can be missed)
    if spec.restrict_lo.shape[0]:
        mm = spec.restrict_lo.shape[0]
        pos_ = jnp.searchsorted(spec.restrict_lo, lo)
        listed = jnp.zeros_like(m)
        for k in range(cfg.restrict_scan):
            pk = jnp.minimum(pos_ + k, mm - 1)
            listed |= (spec.restrict_lo[pk] == lo) & (spec.restrict_hi[pk] == hi)
        m &= listed | ~spec.r_restricted[r]

    # bonded-neighbour state constraint on the type_1 side (exchange)
    cnb = spec.r_cnb_type[r]
    nbr_t = state.type_id[jnp.maximum(state.adj[a], 0)]
    nbr_s = state.chem_state[jnp.maximum(state.adj[a], 0)]
    has_cnb = jnp.any((state.adj[a] >= 0) & (nbr_t == cnb)
                      & (nbr_s >= spec.r_cnb_min[r]) & (nbr_s < spec.r_cnb_max[r]),
                      axis=-1)
    m &= (cnb < 0) | has_cnb

    # Monte-Carlo acceptance, W = rate * dt * interval
    w = state.reaction_rates[r] * spec.dt * cfg.reaction_interval
    u = pair_uniform(seed, state.step, lo, hi, 4 * r + dir_salt)
    m &= u < w
    return m, u


def match_reactions(spec: SimSpec, cfg: EngineConfig, state: MDState, seed,
                    nbr_idx=None, excl_mask=None):
    """Find fired reaction events this interval.

    Returns (ev_valid, ev_a, ev_b, ev_r) each (max_events,): ``a`` is the
    type_1 side.  Each particle appears in at most one event.

    ``nbr_idx``/``excl_mask`` override the candidate rows (the lazy-row path
    passes freshly built reaction-geometry rows; default: state.nbr).
    """
    n = state.pos.shape[0]
    i_idx = jnp.arange(n, dtype=I32)[:, None]
    j = state.nbr.idx if nbr_idx is None else nbr_idx
    if excl_mask is None:
        excl_mask = state.nbr.excl_mask
    dr = state.pos[:, None, :] - state.pos[j]
    dr -= state.box * jnp.round(dr / state.box)
    r2 = jnp.sum(dr * dr, axis=-1)
    # excluded (1-2/1-3/1-4) pairs are not reaction candidates: the
    # reference's VerletList is built with the exclusion list, so its
    # ChemicalReaction never sees them
    slot_valid = (j != i_idx) & state.active[:, None] & state.active[j] \
        & ~excl_mask

    big = jnp.float32(1e30)
    rs = jnp.arange(cfg.n_reactions, dtype=I32)
    # vectorize the per-channel evaluation over (channel, direction) — one
    # traced body instead of a 2R-times unrolled graph
    m_all, u_all = jax.vmap(
        lambda r, d: _channel_accept(spec, cfg, state, seed, i_idx, j, r2,
                                     slot_valid, r, d),
        in_axes=(0, None))(rs, jnp.asarray(True))
    m_all2, u_all2 = jax.vmap(
        lambda r, d: _channel_accept(spec, cfg, state, seed, i_idx, j, r2,
                                     slot_valid, r, d),
        in_axes=(0, None))(rs, jnp.asarray(False))
    m_cat = jnp.concatenate([m_all, m_all2])          # (2R, N, K)
    u_cat = jnp.where(m_cat, jnp.concatenate([u_all, u_all2]), big)
    pick = jnp.argmin(u_cat, axis=0)                   # (N, K)
    best_u = jnp.take_along_axis(u_cat, pick[None], axis=0)[0]
    best_r = jnp.where(best_u < big, (pick % cfg.n_reactions).astype(I32), -1)
    best_dir = pick < cfg.n_reactions

    accepted = best_r >= 0
    key = jnp.where(accepted, jnp.where(cfg.nearest_mode, r2, best_u), big)

    # mutual-argmin matching
    slot = jnp.argmin(key, axis=1)                      # (N,)
    row = jnp.arange(n, dtype=I32)
    partner = jnp.where(accepted[row, slot], j[row, slot], -1)
    pp = jnp.where(partner >= 0, partner[jnp.maximum(partner, 0)], -2)
    fire = (partner >= 0) & (pp == row) & (row < partner)

    my_key = key[row, slot]
    my_r = best_r[row, slot]
    my_dir = best_dir[row, slot]

    # global event cap by priority
    order = jnp.argsort(jnp.where(fire, my_key, big))
    take = order[: cfg.max_events]
    ev_valid = fire[take]
    if cfg.max_per_interval > 0:
        ev_valid &= jnp.arange(cfg.max_events) < cfg.max_per_interval
    lo = jnp.minimum(take, partner[take])
    hi = jnp.maximum(take, partner[take])
    t1_side = jnp.where(my_dir[take], lo, hi)
    t2_side = jnp.where(my_dir[take], hi, lo)
    ev_a = jnp.where(ev_valid, t1_side, -1)
    ev_b = jnp.where(ev_valid, t2_side, -1)
    ev_r = jnp.where(ev_valid, my_r[take], -1)
    dp = state.pos[jnp.maximum(ev_a, 0)] - state.pos[jnp.maximum(ev_b, 0)]
    dp -= state.box * jnp.round(dp / state.box)
    ev_dist = jnp.where(ev_valid, jnp.sqrt(jnp.sum(dp * dp, -1)), -1.0)
    return ev_valid, ev_a, ev_b, ev_r, ev_dist


def side1_mask(spec: SimSpec, cfg: EngineConfig, state: MDState):
    """Particles that can be the type_1 side of ANY active normal channel."""
    m = jnp.zeros(state.pos.shape[0], bool)
    for r in range(cfg.n_reactions):
        ok = state.reaction_active[r] & ~spec.r_is_diss[r]
        m |= ok & (state.type_id == spec.r_t1[r]) \
            & (state.chem_state >= spec.r_min1[r]) \
            & (state.chem_state < spec.r_max1[r])
    return m & state.active


def _compact_channel_accept(spec: SimSpec, cfg: EngineConfig, state: MDState,
                            seed, a, j, r2, slot_valid, r: int):
    """Directed acceptance of channel r with ``a`` fixed as the type_1 side
    (the compacted rows are built around S1 particles).  Draws stay keyed by
    the unordered pair so a mutual S1-S1 evaluation of a symmetric channel
    produces the same number from both rows."""
    lo = jnp.minimum(a, j)
    hi = jnp.maximum(a, j)
    ta = state.type_id[a]
    tb = state.type_id[j]
    sa = state.chem_state[a]
    sb = state.chem_state[j]

    m = slot_valid
    m &= (ta == spec.r_t1[r]) & (tb == spec.r_t2[r])
    m &= (sa >= spec.r_min1[r]) & (sa < spec.r_max1[r])
    m &= (sb >= spec.r_min2[r]) & (sb < spec.r_max2[r])
    m &= state.reaction_active[r] & ~spec.r_is_diss[r]

    symmetric = spec.r_t1[r] == spec.r_t2[r]
    # direction salt matches _channel_accept: the t1 side being the smaller
    # index corresponds to t1_is_lo
    t1_is_lo = a == lo
    dir_salt = jnp.where(symmetric, 0, jnp.where(t1_is_lo, 0, 1))
    u1 = pair_uniform(seed, state.step, lo, hi, 4 * r + 2)
    u2 = pair_uniform(seed, state.step, lo, hi, 4 * r + 3)
    gcut = spec.r_eq[r] + spec.r_sigma[r] * _gauss_from_uniform(u1, u2)
    cut2 = jnp.where(spec.r_sigma[r] > 0.0,
                     jnp.where(gcut > 0.0, gcut * gcut, -1.0),
                     spec.r_cutoff2[r])
    m &= (r2 <= cut2) & (r2 >= spec.r_min_cutoff2[r])

    m &= spec.r_intramolecular[r] | (state.mol_id[a] != state.mol_id[j])
    m &= spec.r_intraresidual[r] | (state.res_id[a] != state.res_id[j])
    m &= ~jnp.any(state.adj[a] == j[..., None], axis=-1)

    if spec.restrict_lo.shape[0]:
        mm = spec.restrict_lo.shape[0]
        pos_ = jnp.searchsorted(spec.restrict_lo, lo)
        listed = jnp.zeros_like(m)
        for k in range(cfg.restrict_scan):
            pk = jnp.minimum(pos_ + k, mm - 1)
            listed |= (spec.restrict_lo[pk] == lo) & (spec.restrict_hi[pk] == hi)
        m &= listed | ~spec.r_restricted[r]

    cnb = spec.r_cnb_type[r]
    nbr_t = state.type_id[jnp.maximum(state.adj[a], 0)]
    nbr_s = state.chem_state[jnp.maximum(state.adj[a], 0)]
    has_cnb = jnp.any((state.adj[a] >= 0) & (nbr_t == cnb)
                      & (nbr_s >= spec.r_cnb_min[r]) & (nbr_s < spec.r_cnb_max[r]),
                      axis=-1)
    m &= (cnb < 0) | has_cnb

    w = state.reaction_rates[r] * spec.dt * cfg.reaction_interval
    u = pair_uniform(seed, state.step, lo, hi, 4 * r + dir_salt)
    m &= u < w
    return m, u


def match_reactions_compact(spec: SimSpec, cfg: EngineConfig, state: MDState,
                            seed, rowsel, row_ok, cand, excl_hit):
    """Fired events from compacted candidate rows.

    ``rowsel`` (R,) are the S1 particle rows, ``row_ok`` their validity,
    ``cand`` (R, C) candidate particle ids (-1 padded), ``excl_hit`` (R, C)
    True where (rowsel, cand) is an excluded pair.  Conflict resolution:
    each S1 row proposes its best accepted candidate; proposals resolve by
    deterministic scatter-min over both endpoints, with an index tie-break
    for the mutual symmetric-channel case (both copies share the pair key).
    Returns (ev_valid, ev_a, ev_b, ev_r, ev_dist) with ``a`` the type_1 side.
    """
    n = state.pos.shape[0]
    a = rowsel[:, None]                                  # (R, 1)
    j = jnp.maximum(cand, 0)
    # per-axis planes (R, C): R*C is small, a (R, C, 3) gather is fine
    dr = state.pos[a[:, 0]][:, None, :] - state.pos[j]
    dr -= state.box * jnp.round(dr / state.box)
    r2 = jnp.sum(dr * dr, axis=-1)
    slot_valid = (cand >= 0) & (j != a) & row_ok[:, None] \
        & state.active[j] & ~excl_hit

    big = jnp.float32(1e30)
    rs = jnp.arange(cfg.n_reactions, dtype=I32)
    m_all, u_all = jax.vmap(
        lambda r: _compact_channel_accept(spec, cfg, state, seed, a, j, r2,
                                          slot_valid, r))(rs)   # (Rchan, R, C)
    u_cat = jnp.where(m_all, u_all, big)
    pick = jnp.argmin(u_cat, axis=0)                      # (R, C)
    best_u = jnp.take_along_axis(u_cat, pick[None], axis=0)[0]
    accepted = best_u < big
    best_r = jnp.where(accepted, pick.astype(I32), -1)
    key = jnp.where(accepted, jnp.where(cfg.nearest_mode, r2, best_u), big)

    # each row proposes its best slot
    slot = jnp.argmin(key, axis=1)                        # (R,)
    rr = jnp.arange(rowsel.shape[0])
    prop_key = key[rr, slot]
    prop_b = jnp.where(prop_key < big, j[rr, slot], -1)
    prop_r = best_r[rr, slot]
    has_prop = prop_b >= 0

    # scatter-min of incoming proposal keys over both endpoints
    win = jnp.full(n + 1, big).at[jnp.where(has_prop, prop_b, n)].min(
        prop_key, mode="drop")
    wins_b = has_prop & (prop_key == win[jnp.maximum(prop_b, 0)])
    # the row's own particle must not be claimed by a stronger proposal;
    # an equal key can only be the mirror copy of a mutual symmetric-channel
    # pair — break by keeping the smaller-index owner
    claimed = win[rowsel]
    fire = wins_b & ((claimed > prop_key)
                     | ((claimed == prop_key) & (rowsel < prop_b)))

    order = jnp.argsort(jnp.where(fire, prop_key, big))
    take = order[: cfg.max_events]
    ev_valid = fire[take]
    if cfg.max_per_interval > 0:
        ev_valid &= jnp.arange(cfg.max_events) < cfg.max_per_interval
    ev_a = jnp.where(ev_valid, rowsel[take], -1)
    ev_b = jnp.where(ev_valid, prop_b[take], -1)
    ev_r = jnp.where(ev_valid, prop_r[take], -1)
    dp = state.pos[jnp.maximum(ev_a, 0)] - state.pos[jnp.maximum(ev_b, 0)]
    dp -= state.box * jnp.round(dp / state.box)
    ev_dist = jnp.where(ev_valid, jnp.sqrt(jnp.sum(dp * dp, -1)), -1.0)
    return ev_valid, ev_a, ev_b, ev_r, ev_dist


def compact_candidates_from_rows(state: MDState, rowsel):
    """Candidate tile for the compacted match from the persistent Verlet rows
    (the non-lazy path): gather the S1 rows + their exclusion mask."""
    cand = state.nbr.idx[rowsel]
    self_row = cand == rowsel[:, None]
    return jnp.where(self_row, -1, cand), state.nbr.excl_mask[rowsel]


def compact_candidates_from_cells(spec: SimSpec, cfg: EngineConfig,
                                  state: MDState, rowsel):
    """Candidate tile for the compacted match built directly on the reaction
    cell grid (lazy-row mode): buckets over all actives, stencil gather for
    just the R rows.  Replaces the (N, rx_k) transient row build.

    Returns (cand (R, S*cap), excl_hit, overflow)."""
    import numpy as np

    dims = cfg.rx_dims
    buckets, ci, b_ovf, _ = neighbor.build_cell_buckets(
        state.pos, state.box, state.active, dims, cfg.rx_cell_cap)
    offsets = jnp.asarray(neighbor.neighbor_cell_offsets(dims))
    dims_a = jnp.asarray(dims, dtype=I32)
    R = rowsel.shape[0]

    nc = (ci[rowsel][:, None, :] + offsets[None, :, :]) % dims_a
    ncid = (nc[..., 0] * dims[1] + nc[..., 1]) * dims[2] + nc[..., 2]
    cand = buckets[ncid].reshape(R, -1)                   # (R, S*cap)
    # distance culling happens inside the channel accept (r2 <= cutoff);
    # no top_k pack is needed — the match consumes the raw stencil tile
    excl_rows, e_ovf = neighbor.build_exclusion_rows(
        state.excl, state.pos.shape[0], cfg.excl_cap)
    er = excl_rows[rowsel]                                # (R, EXCL)
    excl_hit = jnp.any(cand[:, None, :] == er[:, :, None], axis=1)
    return cand, excl_hit, b_ovf | e_ovf


# ---------------------------------------------------------------------------
# dissociation
# ---------------------------------------------------------------------------

def match_dissociations(spec: SimSpec, cfg: EngineConfig, state: MDState, seed):
    """Find bond rows to break (ev_valid, ev_row, ev_r), each (max_events,)."""
    bonds = state.bonds
    i = jnp.maximum(bonds.idx[:, 0], 0)
    j = jnp.maximum(bonds.idx[:, 1], 0)
    valid = bonds.valid
    dr = state.pos[i] - state.pos[j]
    dr -= state.box * jnp.round(dr / state.box)
    r2 = jnp.sum(dr * dr, axis=-1)
    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)

    big = jnp.float32(1e30)
    ti, tj = state.type_id[i], state.type_id[j]
    si, sj = state.chem_state[i], state.chem_state[j]
    dt_i = spec.dt * cfg.reaction_interval

    def chan(r):
        fwd = (ti == spec.r_t1[r]) & (tj == spec.r_t2[r]) \
            & (si >= spec.r_min1[r]) & (si < spec.r_max1[r]) \
            & (sj >= spec.r_min2[r]) & (sj < spec.r_max2[r])
        bwd = (tj == spec.r_t1[r]) & (ti == spec.r_t2[r]) \
            & (sj >= spec.r_min1[r]) & (sj < spec.r_max1[r]) \
            & (si >= spec.r_min2[r]) & (si < spec.r_max2[r])
        m = valid & spec.r_is_diss[r] & state.reaction_active[r] & (fwd | bwd)
        u1 = pair_uniform(seed, state.step, lo, hi, 1024 + 4 * r)
        u2 = pair_uniform(seed, state.step, lo, hi, 1024 + 4 * r + 1)
        far_break = (r2 > spec.r_cutoff2[r]) & (u1 < state.reaction_rates[r] * dt_i)
        spont = u2 < spec.r_diss_rate[r] * dt_i
        return m & (far_break | spont), u1

    m_all, u_all = jax.vmap(chan)(jnp.arange(cfg.n_reactions, dtype=I32))
    u_all = jnp.where(m_all, u_all, big)                # (R, cap)
    pick = jnp.argmin(u_all, axis=0)
    best_u = jnp.take_along_axis(u_all, pick[None], axis=0)[0]
    best_r = jnp.where(best_u < big, pick.astype(I32), -1)

    broke = best_r >= 0
    order = jnp.argsort(jnp.where(broke, best_u, big))
    take = order[: cfg.max_events]
    ev_valid = broke[take]
    ev_row = jnp.where(ev_valid, take, -1)
    ev_r = jnp.where(ev_valid, best_r[take], -1)
    return ev_valid, ev_row, ev_r


# ---------------------------------------------------------------------------
# event application
# ---------------------------------------------------------------------------

def _generate_terms_for_bond(spec: SimSpec, state: MDState, a, b, enable,
                             add_excl: bool):
    """TopologyManager reaction to one new bond: angles/dihedrals by type
    signature + exclusions (ref: SURVEY.md §3.3 bottom)."""
    ac = jnp.maximum(a, 0)
    bc = jnp.maximum(b, 0)

    ang_idx, ang_v = topo.enumerate_new_angles(state.adj, ac, bc)
    ang_v &= enable
    t = state.type_id[jnp.maximum(ang_idx, 0)]
    funcs = spec.angle_func_tt[t[:, 0], t[:, 1], t[:, 2]]
    pars = spec.angle_par_tt[t[:, 0], t[:, 1], t[:, 2]]
    ang_v &= funcs > 0
    # new angles fade in when t_hybrid_angle is set (lam ramps in run_block)
    ang_lam = jnp.full(ang_idx.shape[0],
                       jnp.where(spec.hybrid_angle_rate > 0, 0.0, 1.0),
                       state.angles.lam.dtype)
    angles, ov1 = topo.table_append(
        state.angles, ang_idx, funcs, pars, ang_v, lam=ang_lam)

    dih_idx, dih_v = topo.enumerate_new_dihedrals(state.adj, ac, bc)
    dih_v &= enable
    if state.dihedrals.capacity > 1:
        td = state.type_id[jnp.maximum(dih_idx, 0)]
        dfuncs = spec.dih_func_tt[td[:, 0], td[:, 1], td[:, 2], td[:, 3]]
        dpars = spec.dih_par_tt[td[:, 0], td[:, 1], td[:, 2], td[:, 3]]
        dih_v &= dfuncs > 0
        dih_lam = jnp.full(dih_idx.shape[0],
                           jnp.where(spec.hybrid_dihedral_rate > 0, 0.0, 1.0),
                           state.dihedrals.lam.dtype)
        dihedrals, ov2 = topo.table_append(
            state.dihedrals, dih_idx, dfuncs, dpars, dih_v, lam=dih_lam)
    else:
        dihedrals, ov2 = state.dihedrals, jnp.asarray(False)
        dih_v = jnp.zeros_like(dih_v)

    excl, n_excl = state.excl, state.n_excl
    ov3 = jnp.asarray(False)
    if add_excl:
        pairs = jnp.concatenate([
            jnp.stack([ac, bc])[None, :],
            ang_idx[:, (0, 2)],
            dih_idx[:, (0, 3)],
        ])
        pv = jnp.concatenate([enable[None], ang_v, dih_v])
        excl, n_excl, ov3 = topo.excl_append(excl, n_excl, pairs, pv)

    return dataclasses.replace(state, angles=angles, dihedrals=dihedrals,
                               excl=excl, n_excl=n_excl), ov1 | ov2 | ov3


def _apply_events_batched(spec: SimSpec, cfg: EngineConfig, state: MDState,
                          ev_valid, ev_a, ev_b, ev_r):
    """Vectorized event application (no per-event scan).

    Valid when no sequential-semantics extension is active (ppnb BFS,
    RemoveNeighboursBonds, FixDistances release/join): mutual-argmin
    matching makes the new edges vertex-disjoint, so bond inserts, adjacency
    writes and term generation are conflict-free and can run as single
    batched table appends.  One case needs care: a dihedral spanning TWO new
    edges joined by one old edge would be enumerated by both owning events
    when generation runs against the final adjacency — each copy lands in
    family 2 or family 3 depending on that event's (a,b) orientation, so
    duplicates are detected orientation-independently via a per-particle
    partner array and broken by keeping the copy owned by the event whose
    bond has the smaller min endpoint index.

    The 128-event lax.scan measured 3.05 s per reaction step at 100k on
    v5e (each iteration full-table copies); this path is two orders cheaper.
    """
    rr = jnp.maximum(ev_r, 0)
    ac = jnp.maximum(ev_a, 0)
    bc = jnp.maximum(ev_b, 0)
    n = state.pos.shape[0]
    grp = jnp.maximum(spec.r_group[rr], 0)
    make_bond = ev_valid & ~spec.r_virtual[rr]
    new_lam = jnp.where(spec.hybrid_bond_rate > 0.0, 0.0, 1.0)

    def _ppnb_batched(st):
        """ChangeNeighboursProperty over all events at once: exact per-event
        BFS level sets built as frontier expansions ((E, deg^l) candidate
        tiles — the neighborhoods are tiny, so this is trivially cheap).
        Cross-event neighborhood overlaps resolve by scatter order instead
        of event order (the reference's own MPI event order is arbitrary)."""
        E = ev_valid.shape[0]
        tid, chem = st.type_id, st.chem_state
        mass, q = st.mass, st.q
        for s_code, ends in ((0, ac), (1, bc)):
            # exact-distance level sets from each event's endpoint
            seen = ends[:, None]                            # (E, 1)
            seen_v = ev_valid[:, None]
            frontier = seen
            frontier_v = seen_v
            level_sets = []
            for _ in range(cfg.max_nb_level):
                cand = st.adj[jnp.maximum(frontier, 0)].reshape(E, -1)
                cv = jnp.repeat(frontier_v, st.adj.shape[1], axis=1)
                cv &= cand >= 0
                # exact distance: drop anything already at a smaller level.
                # Gate on seen_v: invalid frontier padding is clamped to
                # particle 0 before the adj gather, so adj[0]'s real ids sit
                # in `seen` with a False validity bit and must not suppress
                # genuine level>=2 candidates bonded to particle 0.
                cv &= ~jnp.any((cand[:, :, None] == seen[:, None, :])
                               & seen_v[:, None, :], axis=2)
                level_sets.append((cand, cv))
                seen = jnp.concatenate([seen, cand], axis=1)
                seen_v = jnp.concatenate([seen_v, cv], axis=1)
                frontier, frontier_v = cand, cv
            for p in range(cfg.max_ppnb):
                owner = ev_valid & (spec.ppnb_reaction[p] == rr) \
                    & ((spec.ppnb_side[p] == s_code) | (spec.ppnb_side[p] == 2))
                for lev, (cand, cv) in enumerate(level_sets, start=1):
                    m = cv & owner[:, None] \
                        & (spec.ppnb_level[p] == lev) \
                        & (tid[cand] == spec.ppnb_old_type[p]) \
                        & (chem[cand] >= spec.ppnb_min_state[p]) \
                        & (chem[cand] < spec.ppnb_max_state[p]) \
                        & st.active[cand]
                    sel = jnp.where(m, cand, n)
                    nt = spec.ppnb_new_type[p]
                    tid = tid.at[sel].set(nt, mode="drop")
                    mass = mass.at[sel].set(spec.type_mass[nt], mode="drop")
                    q = q.at[sel].set(spec.type_q[nt], mode="drop")
                    ns = spec.ppnb_new_state[p]
                    newc = jnp.where(ns >= 0, ns,
                                     chem[cand] + spec.ppnb_incr_state[p])
                    chem = chem.at[sel].set(newc, mode="drop")
        return dataclasses.replace(st, type_id=tid, chem_state=chem,
                                   mass=mass, q=q)

    # -- bonds: one batched append --
    bonds, ov1 = topo.table_append(
        state.bonds,
        jnp.stack([ac, bc], axis=1),
        spec.g_func[grp],
        spec.g_params[grp],
        make_bond,
        typelookup=jnp.zeros(ev_valid.shape[0], bool),
        lam=jnp.full(ev_valid.shape[0], new_lam, state.bonds.lam.dtype),
        group=grp)

    # -- adjacency: rows are distinct across events, one scatter per side --
    adj = state.adj
    ov2 = jnp.asarray(False)
    for x, y in ((ac, bc), (bc, ac)):
        rows = adj[x]                                  # (E, deg)
        free = rows < 0
        slot = jnp.argmax(free, axis=1)
        ok = jnp.take_along_axis(free, slot[:, None], 1)[:, 0] & make_bond
        ov2 |= jnp.any(make_bond & ~ok)
        adj = adj.at[jnp.where(ok, x, n), slot].set(
            jnp.where(ok, y, -1), mode="drop")

    # -- molecule union: cheap (N,)-sized sequential relabel --
    def mm(k, mol):
        return topo.merge_molecules(mol, ev_a[k], ev_b[k], make_bond[k])

    mol = jax.lax.fori_loop(0, ev_valid.shape[0], mm, state.mol_id)
    state = dataclasses.replace(state, bonds=bonds, adj=adj, mol_id=mol)

    # -- neighbour property transfers BEFORE term generation (the scan's
    #    per-event order: generated terms see post-transfer types) --
    if cfg.max_ppnb > 0:
        state = _ppnb_batched(state)

    # -- term generation against the FINAL adjacency, batched --
    partner = jnp.full(n + 1, -2, I32)
    partner = partner.at[jnp.where(make_bond, ac, n)].set(bc, mode="drop")
    partner = partner.at[jnp.where(make_bond, bc, n)].set(ac, mode="drop")

    ang_idx, ang_v = jax.vmap(
        lambda a, b: topo.enumerate_new_angles(state.adj, a, b))(ac, bc)
    ang_v &= make_bond[:, None]
    ang_idx = ang_idx.reshape(-1, 3)
    ang_v = ang_v.reshape(-1)
    t = state.type_id[jnp.maximum(ang_idx, 0)]
    funcs = spec.angle_func_tt[t[:, 0], t[:, 1], t[:, 2]]
    pars = spec.angle_par_tt[t[:, 0], t[:, 1], t[:, 2]]
    ang_ok = ang_v & (funcs > 0)
    ang_lam = jnp.full(ang_idx.shape[0],
                       jnp.where(spec.hybrid_angle_rate > 0, 0.0, 1.0),
                       state.angles.lam.dtype)
    angles, ov3 = topo.table_append(state.angles, ang_idx, funcs, pars,
                                    ang_ok, lam=ang_lam)

    dih_idx, dih_v = jax.vmap(
        lambda a, b: topo.enumerate_new_dihedrals(state.adj, a, b))(ac, bc)
    dih_v &= make_bond[:, None]
    deg2 = state.adj.shape[1] ** 2
    # A dihedral spanning TWO new bonds (joined by one old middle edge) is
    # enumerated once by each owning event — as family 2 when that event's
    # bond sits at the (a,b) end of the path, family 3 when it sits at the
    # other end, depending only on the (a,b) orientation of each event.
    # Keep exactly the copy owned by the event whose new bond has the
    # smaller min endpoint (bonds are vertex-disjoint under mutual-argmin
    # matching, so the mins differ and exactly one copy survives).
    ev_min = jnp.minimum(ac, bc)[:, None]           # (E, 1)
    # family-2 rows ([deg^2:2*deg^2)): far terminal edge is (o, n)
    o2 = dih_idx[:, deg2:2 * deg2, 0]
    n2 = dih_idx[:, deg2:2 * deg2, 1]
    dup2 = (partner[jnp.clip(n2, 0, n)] == o2) \
        & (ev_min > jnp.minimum(o2, n2))
    dih_v = dih_v.at[:, deg2:2 * deg2].set(dih_v[:, deg2:2 * deg2] & ~dup2)
    # family-3 rows ([2*deg^2:3*deg^2)): far terminal edge is (m, q)
    m3 = dih_idx[:, 2 * deg2:, 2]
    q3 = dih_idx[:, 2 * deg2:, 3]
    dup3 = (partner[jnp.clip(m3, 0, n)] == q3) \
        & (ev_min > jnp.minimum(m3, q3))
    dih_v = dih_v.at[:, 2 * deg2:].set(dih_v[:, 2 * deg2:] & ~dup3)
    dih_idx = dih_idx.reshape(-1, 4)
    dih_v = dih_v.reshape(-1)
    if state.dihedrals.capacity > 1:
        td = state.type_id[jnp.maximum(dih_idx, 0)]
        dfuncs = spec.dih_func_tt[td[:, 0], td[:, 1], td[:, 2], td[:, 3]]
        dpars = spec.dih_par_tt[td[:, 0], td[:, 1], td[:, 2], td[:, 3]]
        dih_ok = dih_v & (dfuncs > 0)
        dih_lam = jnp.full(dih_idx.shape[0],
                           jnp.where(spec.hybrid_dihedral_rate > 0, 0.0, 1.0),
                           state.dihedrals.lam.dtype)
        dihedrals, ov4 = topo.table_append(state.dihedrals, dih_idx, dfuncs,
                                           dpars, dih_ok, lam=dih_lam)
    else:
        dihedrals, ov4 = state.dihedrals, jnp.asarray(False)
        dih_ok = jnp.zeros_like(dih_v)

    excl, n_excl = state.excl, state.n_excl
    ov5 = jnp.asarray(False)
    if cfg.exclude_new_bonds:
        pairs = jnp.concatenate([
            jnp.stack([ac, bc], axis=1),
            ang_idx[:, (0, 2)],
            dih_idx[:, (0, 3)],
        ])
        pv = jnp.concatenate([make_bond, ang_ok, dih_ok])
        excl, n_excl, ov5 = topo.excl_append(excl, n_excl, pairs, pv)

    state = dataclasses.replace(state, angles=angles, dihedrals=dihedrals,
                                excl=excl, n_excl=n_excl)
    return state, ov1 | ov2 | ov3 | ov4 | ov5


def apply_reaction_events(spec: SimSpec, cfg: EngineConfig, state: MDState,
                          ev_valid, ev_a, ev_b, ev_r):
    """Apply fired normal-reaction events.

    Systems without sequential-semantics extensions take the batched path
    (_apply_events_batched); otherwise a scan applies one event at a time so
    the topology each event sees includes all earlier events."""

    # -- per-particle updates (vectorized; particles appear in <=1 event) --
    rr = jnp.maximum(ev_r, 0)
    ac = jnp.maximum(ev_a, 0)
    bc = jnp.maximum(ev_b, 0)
    chem = state.chem_state
    chem = chem.at[jnp.where(ev_valid, ac, chem.shape[0])].add(
        spec.r_delta1[rr], mode="drop")
    chem = chem.at[jnp.where(ev_valid, bc, chem.shape[0])].add(
        spec.r_delta2[rr], mode="drop")
    state = dataclasses.replace(state, chem_state=chem)
    counts = state.reaction_counts.at[
        jnp.where(ev_valid, rr, cfg.n_reactions)].add(1, mode="drop")
    intra = jnp.sum(ev_valid & (state.mol_id[ac] == state.mol_id[bc]))
    inter = jnp.sum(ev_valid) - intra
    state = dataclasses.replace(
        state, reaction_counts=counts,
        intra_counts=state.intra_counts + jnp.stack([intra, inter]).astype(I32))

    for e_side, new_t in ((ac, spec.r_new_type1[rr]), (bc, spec.r_new_type2[rr])):
        do = ev_valid
        te = jnp.where(do & (new_t >= 0), new_t, -1)
        tid = state.type_id.at[jnp.where(te >= 0, e_side, state.type_id.shape[0])
                               ].set(jnp.maximum(te, 0), mode="drop")
        mass = state.mass.at[jnp.where(te >= 0, e_side, state.mass.shape[0])
                             ].set(spec.type_mass[jnp.maximum(te, 0)], mode="drop")
        qq = state.q.at[jnp.where(te >= 0, e_side, state.q.shape[0])
                        ].set(spec.type_q[jnp.maximum(te, 0)], mode="drop")
        state = dataclasses.replace(state, type_id=tid, mass=mass, q=qq)

    # -- sequential per-event updates (reference order per event: bond ->
    #    post-processes -> TopologyManager generation, so the generated
    #    angles/dihedrals see post-transfer types; ref SURVEY.md §3.3) --
    new_lam = jnp.where(spec.hybrid_bond_rate > 0.0, 0.0, 1.0)

    def _apply_ppnb(st, valid, a, b, r):
        """ChangeNeighboursProperty: BFS type transfers around the event
        (ref: reaction_post_process.py:76-115)."""
        dist_a = topo.bfs_distances(st.adj, jnp.where(valid, a, -1),
                                    cfg.max_nb_level)
        dist_b = topo.bfs_distances(st.adj, jnp.where(valid, b, -1),
                                    cfg.max_nb_level)
        tid, chem = st.type_id, st.chem_state
        mass, q = st.mass, st.q
        for p in range(cfg.max_ppnb):
            owner = spec.ppnb_reaction[p] == r
            side = spec.ppnb_side[p]
            for s_code, dist in ((0, dist_a), (1, dist_b)):
                use = valid & owner & ((side == s_code) | (side == 2))
                m = use & (dist == spec.ppnb_level[p]) \
                    & (tid == spec.ppnb_old_type[p]) \
                    & (chem >= spec.ppnb_min_state[p]) \
                    & (chem < spec.ppnb_max_state[p]) & st.active
                nt = spec.ppnb_new_type[p]
                tid = jnp.where(m, nt, tid)
                mass = jnp.where(m, spec.type_mass[nt], mass)
                q = jnp.where(m, spec.type_q[nt], q)
                ns = spec.ppnb_new_state[p]
                chem = jnp.where(
                    m, jnp.where(ns >= 0, ns, chem + spec.ppnb_incr_state[p]),
                    chem)
        return dataclasses.replace(st, type_id=tid, chem_state=chem,
                                   mass=mass, q=q)

    def _release_constraints(st, p, count, enable):
        """PostProcessReleaseParticles: free up to `count` dummies of host p
        (ref: reaction_post_process.py:274-289)."""
        mask = enable & (st.fixd_host == p) & (st.fixd_host >= 0)
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        rel = mask & (rank < count)
        n = st.pos.shape[0]
        dsel = jnp.where(rel, jnp.maximum(st.fixd_dummy, 0), n)
        # resolve each released constraint's owning definition by its dummy's
        # type (the same discipline _fix_distances uses), so stacked
        # ReleaseMolecule blocks each free their own dummies correctly
        t_dummy = st.type_id[jnp.maximum(st.fixd_dummy, 0)]
        def_idx = jnp.zeros_like(st.fixd_dummy)
        for k in range(cfg.n_fd):
            def_idx = jnp.where(t_dummy == spec.fd_dummy_type[k], k, def_idx)
        type_id = st.type_id.at[dsel].set(
            jnp.maximum(spec.fd_target_type[def_idx], 0), mode="drop")
        lam = st.lam.at[dsel].set(spec.fd_release_lam[def_idx], mode="drop")
        return dataclasses.replace(
            st, type_id=type_id, lam=lam,
            fixd_host=jnp.where(rel, -1, st.fixd_host),
            fixd_dummy=jnp.where(rel, -1, st.fixd_dummy))

    def _remove_neighbour_bonds(st, valid, anchor, r, s_code):
        """PostProcessRemoveNeighbourBond: break (t1,t2) bonds whose closer
        endpoint is nb_level hops from the anchor
        (ref: reaction_post_process.py:117-137)."""
        dist = topo.bfs_distances(st.adj, jnp.where(valid, anchor, -1),
                                  cfg.max_nb_level + 1)
        bi = jnp.maximum(st.bonds.idx[:, 0], 0)
        bj = jnp.maximum(st.bonds.idx[:, 1], 0)
        ti = st.type_id[bi]
        tj = st.type_id[bj]
        hit = jnp.zeros(st.bonds.capacity, bool)
        anchor_t = st.type_id[jnp.maximum(anchor, 0)]
        for p in range(cfg.n_rb):
            owner = valid & (spec.rb_reaction[p] == r) \
                & (anchor_t == spec.rb_anchor_type[p]) \
                & ((spec.rb_side[p] == s_code) | (spec.rb_side[p] == 2))
            tmatch = ((ti == spec.rb_t1[p]) & (tj == spec.rb_t2[p])) | \
                     ((ti == spec.rb_t2[p]) & (tj == spec.rb_t1[p]))
            dmin = jnp.minimum(dist[bi], dist[bj])
            hit |= owner & st.bonds.valid & tmatch & (dmin == spec.rb_level[p])
        # compact hit rows to a small fixed set: a single reaction event can
        # only remove a handful of bonds, and sweeping the full bond table
        # against the angle/dihedral tables inside the event scan would be
        # O(bond_cap * angle_cap) per event. Hits beyond max_rm would leave
        # stale angles/dihedrals/exclusions behind, so they raise the sticky
        # overflow flag instead of being dropped silently.
        max_rm = 8
        rm_overflow = jnp.sum(hit) > max_rm
        order = jnp.argsort(~hit)[:max_rm]
        rm_valid = hit[order]
        edges = jnp.where(rm_valid[:, None], st.bonds.idx[order], -1)
        new_bonds = dataclasses.replace(
            st.bonds, idx=jnp.where(hit[:, None], -1, st.bonds.idx))
        angles, hit_a = topo.invalidate_terms_with_edges(st.angles, edges,
                                                         rm_valid)
        dihedrals, hit_d = topo.invalidate_terms_with_edges(st.dihedrals,
                                                            edges, rm_valid)
        excl = topo.excl_remove(st.excl, edges, rm_valid)
        ha_order = jnp.argsort(~hit_a)[: 4 * max_rm]
        excl = topo.excl_remove(excl, st.angles.idx[ha_order][:, (0, 2)],
                                hit_a[ha_order])
        if st.dihedrals.capacity > 1:
            hd_order = jnp.argsort(~hit_d)[: 8 * max_rm]
            excl = topo.excl_remove(excl, st.dihedrals.idx[hd_order][:, (0, 3)],
                                    hit_d[hd_order])
        adj = st.adj

        def rm(k, adj):
            return topo.adj_remove_edge(adj, edges[k, 0], edges[k, 1], rm_valid[k])
        adj = jax.lax.fori_loop(0, max_rm, rm, adj)
        return dataclasses.replace(st, bonds=new_bonds, angles=angles,
                                   dihedrals=dihedrals, excl=excl,
                                   adj=adj), rm_overflow

    def body(carry, ev):
        st, overflow = carry
        valid, a, b, r = ev
        grp = jnp.maximum(spec.r_group[jnp.maximum(r, 0)], 0)
        make_bond = valid & ~spec.r_virtual[jnp.maximum(r, 0)]

        bonds, ov1 = topo.table_append(
            st.bonds,
            jnp.stack([a, b])[None, :],
            spec.g_func[grp][None],
            spec.g_params[grp][None, :],
            make_bond[None],
            typelookup=jnp.zeros(1, bool),
            lam=jnp.full(1, new_lam, st.bonds.lam.dtype),
            group=grp[None])
        adj, ov2 = topo.adj_add_edge(st.adj, a, b, make_bond)
        mol = topo.merge_molecules(st.mol_id, a, b, make_bond)
        st = dataclasses.replace(st, bonds=bonds, adj=adj, mol_id=mol)
        if cfg.max_ppnb > 0:
            st = _apply_ppnb(st, valid, a, b, r)
        if cfg.has_fixd:
            rn = spec.r_release_n[jnp.maximum(r, 0)]
            side = spec.r_release_side[jnp.maximum(r, 0)]
            st = _release_constraints(st, a, rn,
                                      valid & (rn > 0) & (side != 1))
            st = _release_constraints(st, b, rn,
                                      valid & (rn > 0) & (side != 0))
        if cfg.n_rb > 0:
            rr0 = jnp.maximum(r, 0)
            for s_code, anchor in ((0, a), (1, b)):
                st, rm_ov = _remove_neighbour_bonds(st, valid, anchor, rr0,
                                                    s_code)
                overflow = overflow | rm_ov
        if cfg.has_fixd:
            # JoinMolecule: capture the type_2 particle as an invisible dummy
            # constrained to the type_1 host (ref: reaction_post_process.py:322-362).
            # Every write is gated on a free constraint slot: without one the
            # particle must NOT become an unconstrained invisible ghost.
            jdef = spec.r_join_def[jnp.maximum(r, 0)]
            jsel = jnp.maximum(jdef, 0)
            do_join = valid & (jdef >= 0)
            nn = st.pos.shape[0]
            free = jnp.argmax(st.fixd_host < 0)
            slot_ok = do_join & (st.fixd_host[free] < 0)
            overflow = overflow | (do_join & ~slot_ok)
            bsel = jnp.where(slot_ok, jnp.maximum(b, 0), nn)
            tid = st.type_id.at[bsel].set(
                jnp.maximum(spec.fd_dummy_type[jsel], 0), mode="drop")
            lam2 = st.lam.at[bsel].set(spec.fd_capture_lam[jsel], mode="drop")
            chem2 = st.chem_state.at[bsel].set(spec.fd_capture_state[jsel],
                                               mode="drop")
            fh = st.fixd_host.at[jnp.where(slot_ok, free, st.fixd_host.shape[0])
                                 ].set(jnp.maximum(a, 0), mode="drop")
            fd = st.fixd_dummy.at[jnp.where(slot_ok, free, st.fixd_dummy.shape[0])
                                  ].set(jnp.maximum(b, 0), mode="drop")
            st = dataclasses.replace(st, type_id=tid, lam=lam2, chem_state=chem2,
                                     fixd_host=fh, fixd_dummy=fd)
        st, ov3 = _generate_terms_for_bond(spec, st, a, b, make_bond,
                                           cfg.exclude_new_bonds)
        return (st, overflow | ov1 | ov2 | ov3), None

    if cfg.n_rb == 0 and not cfg.has_fixd:
        return _apply_events_batched(spec, cfg, state, ev_valid, ev_a, ev_b,
                                     ev_r)

    (state, overflow), _ = jax.lax.scan(
        body, (state, jnp.asarray(False)),
        (ev_valid, ev_a, ev_b, ev_r))

    return state, overflow


def apply_dissociation_events(spec: SimSpec, cfg: EngineConfig, state: MDState,
                              ev_valid, ev_row, ev_r):
    """Break bonds: invalidate rows + dependent angles/dihedrals/exclusions,
    apply per-side deltas/type changes, relabel molecules."""
    any_break = jnp.any(ev_valid)
    rows = jnp.maximum(ev_row, 0)
    edges = state.bonds.idx[rows]           # (E, 2)
    a = jnp.maximum(edges[:, 0], 0)
    b = jnp.maximum(edges[:, 1], 0)
    rr = jnp.maximum(ev_r, 0)

    # orientation: reference dissociation equations give per-side deltas for
    # (type_1, type_2); map side by matching the type_1 type
    a_is_t1 = state.type_id[a] == spec.r_t1[rr]
    d_a = jnp.where(a_is_t1, spec.r_delta1[rr], spec.r_delta2[rr])
    d_b = jnp.where(a_is_t1, spec.r_delta2[rr], spec.r_delta1[rr])
    nt_a = jnp.where(a_is_t1, spec.r_new_type1[rr], spec.r_new_type2[rr])
    nt_b = jnp.where(a_is_t1, spec.r_new_type2[rr], spec.r_new_type1[rr])

    n = state.chem_state.shape[0]
    chem = state.chem_state
    chem = chem.at[jnp.where(ev_valid, a, n)].add(d_a, mode="drop")
    chem = chem.at[jnp.where(ev_valid, b, n)].add(d_b, mode="drop")
    # lambda fade-out (alpha set): the particle keeps its old type with
    # lambda dropped to 0; BasicDynamicResolution ramps it back and fires
    # the product type at lambda >= 1 (ref: reaction_setup.py:320-354).
    # Without alpha the product type applies instantly.
    fade = spec.r_diss_fade[rr]
    tid, mass, q, lam = state.type_id, state.mass, state.q, state.lam
    for p, nt in ((a, nt_a), (b, nt_b)):
        sel = jnp.where(ev_valid & (nt >= 0) & ~fade, p, n)
        tid = tid.at[sel].set(jnp.maximum(nt, 0), mode="drop")
        mass = mass.at[sel].set(spec.type_mass[jnp.maximum(nt, 0)], mode="drop")
        q = q.at[sel].set(spec.type_q[jnp.maximum(nt, 0)], mode="drop")
        lam = lam.at[jnp.where(ev_valid & fade, p, n)].set(0.0, mode="drop")
    counts = state.reaction_counts.at[
        jnp.where(ev_valid, rr, cfg.n_reactions)].add(1, mode="drop")
    state = dataclasses.replace(state, chem_state=chem, type_id=tid, mass=mass,
                                q=q, lam=lam, reaction_counts=counts)

    # invalidate the bond rows themselves
    bond_idx = state.bonds.idx.at[jnp.where(ev_valid, rows, state.bonds.capacity)
                                  ].set(-1, mode="drop")
    bonds = dataclasses.replace(state.bonds, idx=bond_idx)

    # dependent angles/dihedrals + their exclusions
    angles, hit_a = topo.invalidate_terms_with_edges(state.angles, edges, ev_valid)
    dihedrals, hit_d = topo.invalidate_terms_with_edges(state.dihedrals, edges,
                                                        ev_valid)
    excl = topo.excl_remove(state.excl, edges, ev_valid)
    # compact dependent-term hits before the exclusion sweep (each removed
    # bond owns only a few angles/dihedrals; full-capacity cross products
    # would be O(excl_cap * term_cap))
    cap_a = 4 * edges.shape[0]
    ha = jnp.argsort(~hit_a)[:cap_a]
    excl = topo.excl_remove(excl, state.angles.idx[ha][:, (0, 2)], hit_a[ha])
    if state.dihedrals.capacity > 1:
        hd = jnp.argsort(~hit_d)[: 2 * cap_a]
        excl = topo.excl_remove(excl, state.dihedrals.idx[hd][:, (0, 3)],
                                hit_d[hd])

    adj = state.adj
    def rm(k, adj):
        return topo.adj_remove_edge(adj, edges[k, 0], edges[k, 1], ev_valid[k])
    adj = jax.lax.fori_loop(0, edges.shape[0], rm, adj)

    state = dataclasses.replace(state, bonds=bonds, angles=angles,
                                dihedrals=dihedrals, excl=excl, adj=adj)

    # molecules may have split: full relabel (gated — it is the expensive part)
    mol = jax.lax.cond(
        any_break,
        lambda: topo.relabel_components(state.adj, state.active),
        lambda: state.mol_id)
    return dataclasses.replace(state, mol_id=mol)


# ---------------------------------------------------------------------------
# ATRP activator (ref: reaction_post_process.py:380-426)
# ---------------------------------------------------------------------------

def atrp_step(spec: SimSpec, cfg: EngineConfig, state: MDState):
    """Activator/deactivator equilibrium MC over randomly sampled particles.

    Samples up to ``atrp_num`` candidate slots; each matching a reactive
    center flips with W = k * ratio(pool); the catalyst pool shifts by
    delta_catalyst per accepted flip.  With ``select_from_all`` unset the
    slots are drawn only from particles matching a reactive center's
    type+state instead of all particles (ref: reaction_post_process.py:
    384-397 "atrp_activator.select_from_all").
    """
    key, k1, k2 = jax.random.split(state.key, 3)
    n = state.pos.shape[0]
    num = cfg.atrp_num
    if cfg.atrp_select_from_all:
        picks = jax.random.randint(k1, (num,), 0, cfg.n_particles)
        picks_ok = jnp.ones(num, bool)
    else:
        elig = state.active
        center = jnp.zeros(n, bool)
        for e in range(cfg.n_atrp):
            center |= (state.type_id == spec.atrp_type[e]) \
                & (state.chem_state == spec.atrp_state[e])
        elig &= center
        # uniform-with-replacement over the eligible rows: compact them to
        # the front with a stable sort, then draw row ranks
        order = jnp.argsort(~elig, stable=True)
        cnt = jnp.sum(elig)
        r = jax.random.randint(k1, (num,), 0, jnp.maximum(cnt, 1))
        picks = order[r]
        picks_ok = cnt > jnp.zeros(num, I32)
    u = jax.random.uniform(k2, (num,))

    tid = state.type_id
    chem = state.chem_state
    ratios = state.atrp_ratios          # [activator, deactivator]
    stats = state.atrp_stats

    # a particle may be sampled twice; dedup by keeping first occurrence
    order_first = jnp.arange(num)
    seen = jnp.zeros(n, I32).at[picks].max(order_first[::-1], mode="drop")
    is_first = (seen[picks] == order_first[::-1]) & picks_ok

    def body(carry, x):
        tid, chem, mass, q, ratios, stats = carry
        p, uu, fresh = x
        t = tid[p]
        s = chem[p]
        done = jnp.asarray(False)
        for e in range(cfg.n_atrp):
            is_act = spec.atrp_is_activator[e]
            # entry matches when type+state match; activator entries consume
            # the deactivator pool and vice versa
            pool = jnp.where(is_act, ratios[0], ratios[1])
            k = jnp.where(is_act, spec.atrp_k_activate, spec.atrp_k_deactivate)
            m = (~done & fresh & state.active[p]
                 & (t == spec.atrp_type[e]) & (s == spec.atrp_state[e])
                 & (uu < k * pool))
            nt = spec.atrp_new_type[e]
            tid = tid.at[p].set(jnp.where(m, nt, tid[p]))
            mass = mass.at[p].set(jnp.where(m, spec.type_mass[nt], mass[p]))
            q = q.at[p].set(jnp.where(m, spec.type_q[nt], q[p]))
            chem = chem.at[p].set(jnp.where(m, chem[p] + spec.atrp_delta[e],
                                            chem[p]))
            dc = jnp.where(is_act, -spec.atrp_delta_catalyst,
                           spec.atrp_delta_catalyst)
            ratios = jnp.where(m, ratios + jnp.stack([dc, -dc]), ratios)
            stats = jnp.where(m, stats + jnp.where(is_act,
                                                   jnp.asarray([1, 0], I32),
                                                   jnp.asarray([0, 1], I32)),
                              stats)
            done = done | m
        return (tid, chem, mass, q, ratios, stats), None

    (tid, chem, mass, q, ratios, stats), _ = jax.lax.scan(
        body, (tid, chem, state.mass, state.q, ratios, stats),
        (picks, u, is_first))
    return dataclasses.replace(state, key=key, type_id=tid, chem_state=chem,
                               mass=mass, q=q, atrp_ratios=ratios,
                               atrp_stats=stats)


# ---------------------------------------------------------------------------
# ChangeParticleType extension (ref: reaction_post_process.py:364-378)
# ---------------------------------------------------------------------------

def change_particle_type_step(spec: SimSpec, cfg: EngineConfig,
                              state: MDState) -> MDState:
    """Random type flips: up to cpt_num particles of cpt_old -> cpt_new."""
    key, sub = jax.random.split(state.key)
    n = state.pos.shape[0]
    match = state.active & (state.type_id == spec.cpt_old)
    score = jnp.where(match, jax.random.uniform(sub, (n,)), 2.0)
    order = jnp.argsort(score)[: cfg.cpt_num]
    sel = jnp.where(match[order], order, n)
    nt = jnp.maximum(spec.cpt_new, 0)
    type_id = state.type_id.at[sel].set(nt, mode="drop")
    mass = state.mass.at[sel].set(spec.type_mass[nt], mode="drop")
    q = state.q.at[sel].set(spec.type_q[nt], mode="drop")
    return dataclasses.replace(state, key=key, type_id=type_id, mass=mass, q=q)


# ---------------------------------------------------------------------------
# FreezeRegion / ChangeInRegion (ref: reaction_post_process.py:139-201)
# ---------------------------------------------------------------------------

def freeze_region_step(spec: SimSpec, cfg: EngineConfig,
                       state: MDState) -> MDState:
    """Particles of fr_target_type entering the box-edge regions freeze
    (type -> fr_final_type, velocity/force reset) or are removed."""
    key, sub = jax.random.split(state.key)
    pos = state.pos
    w = spec.fr_width
    box = state.box
    in_region = jnp.zeros(pos.shape[0], bool)
    for k, (axis, low_side) in enumerate(((0, True), (0, False), (1, True),
                                          (1, False), (2, True), (2, False))):
        side = (pos[:, axis] < w[axis]) if low_side else \
               (pos[:, axis] > box[axis] - w[axis])
        in_region |= spec.fr_dirs[k] & side
    u = jax.random.uniform(sub, (pos.shape[0],))
    cand = state.active & in_region & (state.type_id == spec.fr_target_type)
    if cfg.freeze_mode == "prob":
        hit = cand & (u < spec.fr_prob)
    else:
        # p_num / p_num_percentage: freeze a bounded random subset per step
        # (ref ChangeInRegion modes; reaction_post_process.py:160-199)
        n_cand = jnp.sum(cand)
        k = (spec.fr_p_num if cfg.freeze_mode == "num"
             else jnp.floor(spec.fr_p_pct * n_cand).astype(jnp.int32))
        order = jnp.argsort(jnp.where(cand, u, jnp.inf))
        rank = jnp.zeros(pos.shape[0], I32).at[order].set(
            jnp.arange(pos.shape[0], dtype=I32))
        hit = cand & (rank < k)
    type_id = jnp.where(hit & ~spec.fr_remove,
                        jnp.maximum(spec.fr_final_type, 0), state.type_id)
    # frozen particles stay pinned: zero velocity/force every step
    pinned = hit | (state.active & (type_id == spec.fr_final_type))
    vel = jnp.where(pinned[:, None], 0.0, state.vel)
    force = jnp.where(pinned[:, None], 0.0, state.force)
    active = state.active & ~(hit & spec.fr_remove)
    state = dataclasses.replace(
        state, key=key, type_id=type_id, vel=vel, force=force, active=active,
        freeze_count=state.freeze_count + jnp.sum(hit).astype(I32))

    # removal cleanup: dead particles must not keep exerting bonded forces
    # or occupy topology structures
    def cleanup(st):
        dead = ~st.active

        def scrub(table):
            t_idx = table.idx
            bad = jnp.any(jnp.where(t_idx >= 0,
                                    dead[jnp.maximum(t_idx, 0)], False), -1)
            return dataclasses.replace(
                table, idx=jnp.where(bad[:, None], -1, t_idx))

        adj = st.adj
        adj = jnp.where((adj >= 0) & dead[jnp.maximum(adj, 0)], -1, adj)
        adj = jnp.where(dead[:, None], -1, adj)
        e = st.excl
        bad_e = jnp.any(jnp.where(e >= 0, dead[jnp.maximum(e, 0)], False), -1)
        upd = dict(bonds=scrub(st.bonds), angles=scrub(st.angles),
                   dihedrals=scrub(st.dihedrals), adj=adj,
                   excl=jnp.where(bad_e[:, None], -1, e))
        if cfg.bonded_dense and st.bonds_dense is not None:
            # the dense/irregular bonded operands are DERIVED copies of
            # bonds/angles (bonded_dense.py); they are only re-derived at
            # reaction intervals, so a removal here must scrub them too or
            # removed particles keep exerting bonded forces through the
            # stale copies (forever when has_freeze without has_reactions)
            upd.update(bonds_dense=scrub(st.bonds_dense),
                       bonds_irr=scrub(st.bonds_irr),
                       angles_dense=scrub(st.angles_dense),
                       angles_irr=scrub(st.angles_irr))
        st2 = dataclasses.replace(st, **upd)
        if cfg.excl_offsets and st.excl_masks is not None:
            # dense-exclusion operands: re-derive from the scrubbed flat
            # list (per-step tv masking already zeroes dead endpoints, so
            # this is invariant hygiene rather than a force correctness
            # fix — unlike the bonded scrub above)
            from . import excl_dense

            st2 = excl_dense.rederive(cfg, st2)
        return st2

    return jax.lax.cond(jnp.any(hit & spec.fr_remove), cleanup,
                        lambda s: s, state)


# ---------------------------------------------------------------------------
# the full reaction step
# ---------------------------------------------------------------------------

def reaction_step(spec: SimSpec, cfg: EngineConfig, state: MDState,
                  rng_seed: int = 0) -> MDState:
    """One ChemicalReaction invocation (every ``interval`` MD steps)."""
    seed = jnp.asarray(rng_seed, jnp.uint32)

    rx_overflow = jnp.asarray(False)
    any_event = jnp.asarray(False)
    if cfg.rx_compact:
        # compacted matching: candidate rows only for the S1 particles
        s1 = side1_mask(spec, cfg, state)
        order = jnp.argsort(~s1)
        rowsel = order[: cfg.rx_rows_cap].astype(I32)
        row_ok = s1[rowsel]
        rx_overflow = jnp.sum(s1) > cfg.rx_rows_cap
        if cfg.lazy_rows:
            cand, excl_hit, c_ovf = compact_candidates_from_cells(
                spec, cfg, state, rowsel)
            rx_overflow |= c_ovf
        else:
            cand, excl_hit = compact_candidates_from_rows(state, rowsel)
        ev_valid, ev_a, ev_b, ev_r, ev_dist = match_reactions_compact(
            spec, cfg, state, seed, rowsel, row_ok, cand, excl_hit)
    elif cfg.lazy_rows:
        # lazy-row mode: rows exist only here — build them fresh on the
        # reaction-sized cell grid (rc_rx << rc_skin makes this ~(rc ratio)^3
        # cheaper than the force-geometry rebuild)
        rx_nbr = neighbor.build_neighbor_state(
            state.pos, state.box, state.active, state.excl, cfg.rx_rc,
            dims=cfg.rx_dims, cell_cap=cfg.rx_cell_cap,
            max_neighbors=cfg.rx_k, excl_cap=cfg.excl_cap, mesh=cfg.mesh)
        rx_overflow = rx_nbr.overflow
        ev_valid, ev_a, ev_b, ev_r, ev_dist = match_reactions(
            spec, cfg, state, seed, nbr_idx=rx_nbr.idx,
            excl_mask=rx_nbr.excl_mask)
    else:
        ev_valid, ev_a, ev_b, ev_r, ev_dist = match_reactions(spec, cfg,
                                                              state, seed)
    # accepted-pair log for the pair_distances_filename dump
    # (ref: reaction_parser.py:198); refreshed every firing, read by the
    # host at block boundaries
    state = dataclasses.replace(
        state, ev_log_step=state.step, ev_log_a=ev_a, ev_log_b=ev_b,
        ev_log_r=ev_r, ev_log_dist=ev_dist.astype(state.ev_log_dist.dtype))
    state, topo_overflow = apply_reaction_events(spec, cfg, state,
                                                 ev_valid, ev_a, ev_b, ev_r)
    any_event = any_event | jnp.any(ev_valid)

    if cfg.has_dissociation:
        dv, drow, dr = match_dissociations(spec, cfg, state, seed)
        state = jax.lax.cond(
            jnp.any(dv),
            lambda st: apply_dissociation_events(spec, cfg, st, dv, drow, dr),
            lambda st: st,
            state)
        any_event = any_event | jnp.any(dv)

    if cfg.lazy_rows:
        # the pallas force path reads buckets + the live exclusion list;
        # there are no persistent rows to refresh
        nbr = dataclasses.replace(
            state.nbr,
            overflow=state.nbr.overflow | topo_overflow | rx_overflow)
        return dataclasses.replace(state, nbr=nbr)

    # Positions are untouched inside a reaction step, so the geometric rows
    # stay valid — only the EXCLUSION structure changed (new 1-2/1-3/1-4
    # pairs from created bonds, removals from breaks).  Refresh just the
    # per-row exclusion mask over the existing rows, and only when events
    # actually fired (the full geometric rebuild measured 0.128 s/call at
    # 10k on v5e and fired every interval regardless).
    def refresh_mask(st):
        excl_rows, e_ovf = neighbor.build_exclusion_rows(
            st.excl, st.pos.shape[0], cfg.excl_cap)
        excl_mask = jnp.any(st.nbr.idx[:, None, :] == excl_rows[:, :, None],
                            axis=1)
        return dataclasses.replace(st, nbr=dataclasses.replace(
            st.nbr, excl_mask=excl_mask,
            overflow=st.nbr.overflow | e_ovf))

    state = jax.lax.cond(any_event, refresh_mask, lambda st: st, state)
    nbr = dataclasses.replace(
        state.nbr,
        overflow=state.nbr.overflow | topo_overflow | rx_overflow)
    return dataclasses.replace(state, nbr=nbr)
