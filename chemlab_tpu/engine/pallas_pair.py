"""Pallas TPU cell-tile pair-force kernel (experimental fast path).

The XLA pair path gathers neighbor positions row-by-row from the Verlet list
— irregular access that is HBM-latency-bound on TPU.  This kernel instead
processes the cell decomposition directly with fully regular tiles:

  - particles are binned into cells (the existing bucket build); positions,
    types and validity are laid out cell-dense as (n_cells, cap, ...)
  - the kernel grid is one program per cell; for its 27-stencil neighborhood
    the (cap, 27*cap) candidate distance tile is computed in VMEM and every
    in-range LJ/tabulated contribution is accumulated branchlessly
  - stencil cell ids are scalar-prefetched so block index maps can stream
    the neighbor-cell tiles (PrefetchScalarGridSpec)

Exclusions and intra-cell self pairs are handled OUTSIDE the kernel: the
kernel computes the unexcluded all-pairs sum, and the (short) exclusion list
is evaluated in XLA and subtracted — the standard "compute-all, subtract
excluded" formulation that keeps the hot tile free of per-pair masks.

Scope: PAIR_LJ and plain PAIR_TAB dispatch (no mixing/λ/caps/coulomb — the
build gates the fast path to systems that need none of those; everything
else uses the XLA path).  Periodic minimum image assumes cell edge >=
cutoff so only adjacent cells contribute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import PAIR_LJ, PAIR_TAB

I32 = jnp.int32


def supports(cfg, spec_np) -> bool:
    """Static gate: kernel handles this system's nonbonded physics."""
    kinds = spec_np["pair_kind"]
    if ((spec_np["pair_caprad"] > 0).any()
            or spec_np["pair_lam_scale"].any()
            or (spec_np["pair_mix_mode"] != 0).any()
            or (spec_np["pair_pps_incr"] > 0).any()
            or (spec_np["pair_mix_x"][kinds == PAIR_TAB] != 1.0).any()):
        return False
    return True


def stencil_table(dims) -> np.ndarray:
    """(n_cells, S) neighbor cell ids, S <= 27 (deduplicated for tiny grids)."""
    from .neighbor import neighbor_cell_offsets

    offs = neighbor_cell_offsets(dims)        # (S, 3)
    nx, ny, nz = dims
    ids = np.arange(nx * ny * nz)
    cx, cy, cz = ids // (ny * nz), (ids // nz) % ny, ids % nz
    out = np.empty((len(ids), len(offs)), np.int32)
    for s, (dx, dy, dz) in enumerate(offs):
        out[:, s] = (((cx + dx) % nx) * ny + (cy + dy) % ny) * nz + (cz + dz) % nz
    return out


def _kernel(stencil_ref,                      # scalar prefetch (n_cells, 27)
            cpos_ref,                         # (1, cap, 4) this cell
            ctype_ref,                        # (1, 1, cap)
            npos_ref,                         # (1, cap, 4) stencil-j cell
            ntype_ref,                        # (1, 1, cap)
            box_ref,                          # (1, 4) SMEM-ish small
            pk_ref, psig_ref, peps_ref, pcut_ref, pshift_ref,  # (1, T*T)
            pta_ref,                          # (1, T*T) table ids
            tab_ef_ref,                       # (nT, bins, 2)
            tab_r0_ref, tab_dr_ref,           # (1, nT)
            force_ref,                        # out (1, cap, 4)
            energy_ref,                       # out (1, cap, 2) [lj, tab]
            *, cap: int, n_types: int, n_bins: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        force_ref[...] = jnp.zeros_like(force_ref)
        energy_ref[...] = jnp.zeros_like(energy_ref)

    xi = cpos_ref[0]                          # (cap, 4): xyz + valid flag
    xj = npos_ref[0]
    box = box_ref[0]
    ti = ctype_ref[0, 0]                      # (cap,)
    tj = ntype_ref[0, 0]

    # minimum-image displacement tiles, (cap, cap) per axis
    dr = []
    r2 = jnp.zeros((cap, cap), jnp.float32)
    for ax in range(3):
        d = xi[:, ax][:, None] - xj[:, ax][None, :]
        d = d - box[ax] * jnp.round(d / box[ax])
        dr.append(d)
        r2 = r2 + d * d

    valid = (xi[:, 3][:, None] > 0.5) & (xj[:, 3][None, :] > 0.5)
    # self-pair suppression: kernel adds pairs with r2 == 0 nowhere
    valid &= r2 > 1e-12
    r2s = jnp.where(valid, r2, 1.0)
    r = jnp.sqrt(r2s)

    pid = ti[:, None] * n_types + tj[None, :]
    kind = pk_ref[0, pid]
    cut2 = pcut_ref[0, pid]
    in_cut = valid & (r2s < cut2)

    # ---- LJ ----
    sig = psig_ref[0, pid]
    eps = peps_ref[0, pid]
    s2 = (sig * sig) / r2s
    s6 = s2 * s2 * s2
    lj_m = in_cut & (kind == PAIR_LJ)
    e_lj = jnp.where(lj_m, 4.0 * eps * (s6 * s6 - s6) - pshift_ref[0, pid], 0.0)
    f_lj = jnp.where(lj_m, 48.0 * eps * (s6 * s6 - 0.5 * s6) / r2s, 0.0)

    # ---- tabulated (linear interpolation on the stacked uniform grids) ----
    tab_m = in_cut & (kind == PAIR_TAB)
    tid = pta_ref[0, pid]
    u = (r - tab_r0_ref[0, tid]) / tab_dr_ref[0, tid]
    u = jnp.clip(u, 0.0, n_bins - 1.000001)
    i0 = u.astype(jnp.int32)
    frac = u - i0
    e_lo = tab_ef_ref[tid, i0, 0]
    e_hi = tab_ef_ref[tid, jnp.minimum(i0 + 1, n_bins - 1), 0]
    f_lo = tab_ef_ref[tid, i0, 1]
    f_hi = tab_ef_ref[tid, jnp.minimum(i0 + 1, n_bins - 1), 1]
    e_tab = jnp.where(tab_m, e_lo * (1 - frac) + e_hi * frac, 0.0)
    f_tab = jnp.where(tab_m, (f_lo * (1 - frac) + f_hi * frac) / r, 0.0)

    f_over_r = f_lj + f_tab
    out = force_ref[0]
    fxyz = [jnp.sum(f_over_r * d, axis=1) for d in dr]
    force_ref[0] = out.at[:, 0].add(fxyz[0]).at[:, 1].add(fxyz[1]) \
                      .at[:, 2].add(fxyz[2])
    eout = energy_ref[0]
    energy_ref[0] = eout.at[:, 0].add(0.5 * jnp.sum(e_lj, axis=1)) \
                        .at[:, 1].add(0.5 * jnp.sum(e_tab, axis=1))


def cell_pair_forces(pos, type_id, active, box, buckets, stencil, spec,
                     n_types: int, cap: int, interpret: bool = False):
    """All-pairs (minus nothing) cell-tile forces.

    Returns (force (N,3), e_lj scalar, e_tab scalar) over the UNexcluded
    all-pairs sum; callers subtract the exclusion-list contributions.
    ``buckets`` is (n_cells+1, cap) particle rows (-1 padded); ``stencil``
    is (n_cells, 27) neighbor cell ids.
    """
    from jax.experimental import pallas as pl_mod

    global pl
    pl = pl_mod

    n_cells = stencil.shape[0]
    n = pos.shape[0]
    rows = jnp.maximum(buckets[:n_cells], 0)                # (C, cap)
    slot_valid = (buckets[:n_cells] >= 0) & active[rows]
    cpos = jnp.concatenate(
        [pos[rows], slot_valid[..., None].astype(pos.dtype)], axis=-1)
    # (C, 1, cap): TPU block specs need the last two dims tileable — a
    # (1, cap) block of a (C, cap) array is not (second-to-last dim 1 is
    # neither 8-divisible nor equal to C); (1, 1, cap) of (C, 1, cap) is.
    ctype = jnp.where(slot_valid, type_id[rows], 0).astype(I32)[:, None, :]
    box4 = jnp.concatenate([box, jnp.ones(1, box.dtype)])[None, :]

    n_bins = spec.nb_ef.shape[1]
    grid_spec = pl.pallas_call(
        functools.partial(_kernel, cap=cap, n_types=n_types, n_bins=n_bins),
        grid_spec=pltpu_grid(n_cells, cap, spec, stencil),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells, cap, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_cells, cap, 2), jnp.float32),
        ),
        interpret=interpret,
    )
    force_c, energy_c = grid_spec(
        stencil, cpos, ctype, cpos, ctype, box4,
        spec.pair_kind[None, :], spec.pair_sig[None, :],
        spec.pair_eps[None, :], spec.pair_cutoff2[None, :],
        spec.pair_shift[None, :], spec.pair_tab_a[None, :],
        spec.nb_ef, spec.nb_r0[None, :], spec.nb_dr[None, :])

    # scatter back to particle rows
    force = jnp.zeros((n, 3), pos.dtype)
    flat_rows = jnp.where(slot_valid, rows, n).reshape(-1)
    force = force.at[flat_rows].add(force_c[..., :3].reshape(-1, 3),
                                    mode="drop")
    e = energy_c.reshape(-1, 2)
    e = jnp.where(slot_valid.reshape(-1)[:, None], e, 0.0)
    return force, jnp.sum(e[:, 0]), jnp.sum(e[:, 1])


def pltpu_grid(n_cells, cap, spec, stencil):
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    n_stencil = stencil.shape[1]

    # scalar-prefetch refs arrive LAST in index_map signatures
    def cell_map(i, j, s_ref):
        return (i, 0, 0)

    def cell_map2(i, j, s_ref):
        return (i, 0)

    def nbr_map(i, j, s_ref):
        return (s_ref[i, j], 0, 0)

    def nbr_map2(i, j, s_ref):
        return (s_ref[i, j], 0)

    def rep(i, j, s_ref):
        return (0,)

    def rep2(i, j, s_ref):
        return (0, 0)

    def rep3(i, j, s_ref):
        return (0, 0, 0)

    bs = pl_mod.BlockSpec
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_cells, n_stencil),
        in_specs=[
            bs((1, cap, 4), cell_map),
            bs((1, 1, cap), cell_map),
            bs((1, cap, 4), nbr_map),
            bs((1, 1, cap), nbr_map),
            bs((1, 4), rep2),
            bs((1,) + spec.pair_kind.shape, rep2),
            bs((1,) + spec.pair_sig.shape, rep2),
            bs((1,) + spec.pair_eps.shape, rep2),
            bs((1,) + spec.pair_cutoff2.shape, rep2),
            bs((1,) + spec.pair_shift.shape, rep2),
            bs((1,) + spec.pair_tab_a.shape, rep2),
            bs(spec.nb_ef.shape, rep3),
            bs((1,) + spec.nb_r0.shape, rep2),
            bs((1,) + spec.nb_dr.shape, rep2),
        ],
        out_specs=(
            bs((1, cap, 4), cell_map),
            bs((1, cap, 2), cell_map),
        ),
    )


def excluded_pair_correction(spec, n_types, pos, box, type_id, excl,
                             active=None):
    """Energy/force of the exclusion-list pairs, to subtract from the
    all-pairs kernel result (computed in plain XLA; the list is short)."""
    i = excl[:, 0]
    j = excl[:, 1]
    valid = (i >= 0) & (j >= 0)
    if active is not None:
        # the kernel never added pairs with inactive endpoints; subtracting
        # them here would inject spurious force
        valid &= active[jnp.maximum(i, 0)] & active[jnp.maximum(j, 0)]
    ic = jnp.maximum(i, 0)
    jc = jnp.maximum(j, 0)
    d = pos[ic] - pos[jc]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, -1)
    r2s = jnp.where(valid, jnp.maximum(r2, 1e-12), 1.0)
    r = jnp.sqrt(r2s)
    pid = type_id[ic] * n_types + type_id[jc]
    kind = spec.pair_kind[pid]
    in_cut = valid & (r2s < spec.pair_cutoff2[pid])

    sig = spec.pair_sig[pid]
    eps = spec.pair_eps[pid]
    s6 = ((sig * sig) / r2s) ** 3
    lj_m = in_cut & (kind == PAIR_LJ)
    e_lj = jnp.where(lj_m, 4 * eps * (s6 * s6 - s6) - spec.pair_shift[pid], 0.0)
    f_lj = jnp.where(lj_m, 48 * eps * (s6 * s6 - 0.5 * s6) / r2s, 0.0)

    from . import tables as tables_mod

    tab_m = in_cut & (kind == PAIR_TAB)
    e_t, f_t = tables_mod.interpolate(spec.nb_ef, spec.nb_r0, spec.nb_dr,
                                      spec.pair_tab_a[pid], r)
    e_tab = jnp.where(tab_m, e_t, 0.0)
    f_tab = jnp.where(tab_m, f_t / r, 0.0)

    f_over_r = (f_lj + f_tab)[:, None] * d
    n = pos.shape[0]
    force = jnp.zeros_like(pos)
    force = force.at[jnp.where(valid, ic, n)].add(f_over_r, mode="drop")
    force = force.at[jnp.where(valid, jc, n)].add(-f_over_r, mode="drop")
    return force, jnp.sum(e_lj), jnp.sum(e_tab)
