"""Dense-static exclusion correction: chain exclusions on rolled planes.

The pallas pair path computes all-pairs-minus-excluded: the kernel sums
every in-range pair, then ``excluded_pair_correction`` subtracts the
exclusion list's contribution (ref: the reference's exclusion handling
lives inside its Verlet-list build, ``src/gromacs_topology.py:1019-1022``
+ espressopp ``VerletList.exclude``; here exclusion is algebraic because
the cell kernel knows no per-pair lists).  That correction pays, per
step, one 16-byte-row gather per endpoint and TWO (E,3)->(N,3)
scatter-adds over the full exclusion capacity — the same serialized-
scatter wall the bonded pass hit (TPU_NUMBERS_r04 "Bonded-pass
anatomy": ~19 ns/row, no layout variant beats it).

But exclusions in a chain topology are as offset-regular as the bonded
terms that generate them (nrexcl BFS over consecutively numbered
molecule blocks): almost every static pair is (b, b+d) for d in a tiny
static offset set (trimers: d in {1, 2}).  So, exactly like
``bonded_dense``, this module derives from the canonical flat list:

  - per-offset MASK PLANES (n_offsets, N) bool — pair (b, b+d) sets
    plane[d][b]; evaluation then runs on ``jnp.roll`` copies of the
    packed particle plane with zero gather, and force assembly is
    elementwise adds plus one inverse roll per offset — zero scatter;
  - a compacted IRREGULAR remainder (irr_cap, 2) for everything else
    (reaction-created cross-molecule exclusions and their
    exclude_extensions), which keeps riding the flat-path correction
    at a much smaller capacity.

The per-pair math is ``pallas_pair._pair_eval`` — the SAME function the
flat correction calls — so both legs are token-identical per element and
the kernel-cancellation contract (soft-core clamp + exact op sequence)
is preserved by construction.

Derivation runs at build, at the end of every reaction interval, and on
term-cap re-pads — the only places the exclusion list changes — plus a
scrub-triggered rederive in freeze_region_step's removal cleanup
(mirroring the bonded-dense staleness fix, 980d1b6).

Enable with ``CHEMLAB_EXCL=dense`` (build-time; pallas path only).
Uniqueness invariant: the flat list never holds duplicate pairs (the
reactive appenders filter already-excluded pairs); a duplicate would be
double-subtracted by the flat path but single-subtracted by a mask
plane.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .state import I32

__all__ = ["detect_offsets", "derive", "rederive", "correction"]


def detect_offsets(excl_np: np.ndarray, max_offsets: int = 4,
                   min_cover: float = 0.05) -> tuple:
    """Host-side: pick the offset set that covers the build-time exclusion
    list, most-frequent first.  An offset must cover at least
    ``min_cover`` of the valid pairs to earn a mask plane (a plane costs
    one rolled evaluation pass per step regardless of occupancy)."""
    e = np.asarray(excl_np)
    valid = (e[:, 0] >= 0) & (e[:, 1] >= 0)
    if not valid.any():
        return ()
    d = np.abs(e[valid, 1] - e[valid, 0])
    offs, counts = np.unique(d, return_counts=True)
    order = np.argsort(-counts)
    picked = []
    for k in order[:max_offsets]:
        if counts[k] >= min_cover * valid.sum() and offs[k] > 0:
            picked.append(int(offs[k]))
    return tuple(sorted(picked))


def derive(excl, n: int, offsets: tuple, irr_cap: int):
    """Split the flat (E, 2) exclusion list into mask planes + remainder.

    Returns (masks (n_offsets, N) bool, irr (irr_cap, 2) i32 -1-padded,
    overflow ()).  jit-friendly; mirrors bonded_dense.derive_aligned."""
    i, j = excl[:, 0], excl[:, 1]
    valid = (i >= 0) & (j >= 0)
    lo = jnp.minimum(i, j)
    d = jnp.abs(j - i)
    planes = []
    covered = jnp.zeros_like(valid)
    for off in offsets:
        sel = valid & (d == off)
        planes.append(jnp.zeros(n, bool).at[
            jnp.where(sel, lo, n)].set(True, mode="drop"))
        covered |= sel
    masks = (jnp.stack(planes) if offsets
             else jnp.zeros((0, n), bool))

    sel = valid & ~covered
    dest = jnp.cumsum(sel.astype(I32)) - 1
    overflow = jnp.any(sel & (dest >= irr_cap))
    dest = jnp.where(sel & (dest < irr_cap), dest, irr_cap)
    irr = jnp.full((irr_cap, 2), -1, I32).at[dest].set(excl, mode="drop")
    return masks, irr, overflow


def rederive(cfg, state, create: bool = False):
    """Refresh the derived exclusion operands from the flat list (call
    wherever exclusions may have changed: reaction-interval epilogue,
    freeze removal cleanup, build, term-cap re-pad).

    No-op when the state does not already carry the operands unless
    ``create`` (build-time) — a state transplanted from a build without
    the feature must stay on the flat path, or the two branches of the
    reaction-interval ``lax.cond`` would return different pytrees."""
    if not cfg.excl_offsets or (state.excl_masks is None and not create):
        return state
    n = state.pos.shape[0]
    masks, irr, ovf = derive(state.excl, n, cfg.excl_offsets,
                             cfg.excl_irr_cap)
    nbr = dataclasses.replace(state.nbr, overflow=state.nbr.overflow | ovf)
    return dataclasses.replace(state, excl_masks=masks, excl_irr=irr,
                               nbr=nbr)


def correction(spec, cfg, pos, box, type_id, excl_masks, excl_irr,
               active=None, has_tab: bool = True, cheb: tuple | None = None,
               cheb_mix: bool = False, obs_x=None):
    """Excluded-pair correction via mask planes + rolled packed rows,
    plus the flat-path correction over the small irregular remainder.

    Same contract as ``pallas_pair.excluded_pair_correction``:
    returns (force (N,3), e_lj, e_tab, w)."""
    from . import pallas_pair

    n_types = cfg.n_types
    if active is not None:
        tv = jnp.where(active, type_id + 1, 0).astype(pos.dtype)
    else:
        tv = (type_id + 1).astype(pos.dtype)
    packed = jnp.concatenate([pos, tv[:, None]], axis=-1)       # (N, 4)

    force = jnp.zeros_like(pos)
    e_lj = jnp.asarray(0.0, pos.dtype)
    e_tab = jnp.asarray(0.0, pos.dtype)
    w = jnp.asarray(0.0, pos.dtype)
    for k, off in enumerate(cfg.excl_offsets):
        pj = jnp.roll(packed, -off, axis=0)
        d, f_s, el, et, r2s, valid = pallas_pair._pair_eval(
            spec, n_types, packed, pj, box, excl_masks[k],
            has_tab=has_tab, cheb=cheb, cheb_mix=cheb_mix, obs_x=obs_x)
        fv = jnp.where(valid[:, None], f_s[:, None] * d, 0.0)
        # base endpoint gains +f, partner (base+off) gains -f: the
        # partner add is the INVERSE roll of the same plane — zero
        # scatter (forces via roll, the bonded_dense trick)
        force = force + fv - jnp.roll(fv, off, axis=0)
        e_lj = e_lj + jnp.sum(jnp.where(valid, el, 0.0))
        e_tab = e_tab + jnp.sum(jnp.where(valid, et, 0.0))
        w = w + jnp.sum(jnp.where(valid, f_s * r2s, 0.0))

    f_i, el_i, et_i, w_i = pallas_pair.excluded_pair_correction(
        spec, n_types, pos, box, type_id, excl_irr, active=active,
        has_tab=has_tab, cheb=cheb, cheb_mix=cheb_mix, obs_x=obs_x)
    return force + f_i, e_lj + el_i, e_tab + et_i, w + w_i
