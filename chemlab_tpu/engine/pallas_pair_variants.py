"""Experimental pallas pair-kernel variants (the measured A/B ladder).

These kernels were the round-2/3 optimization ladder toward colt2 (see
TPU_NUMBERS_r02/r03 kernel matrices); only the cell kernel and colt2 are
reachable from the production auto-chooser, so the rest live here —
selectable via CHEMLAB_KERNEL=packet|column|resident|colt1 and driven by
scripts/kernel_matrix.py — to keep the hot-path module lean (VERDICT r3
item 8).  Same contracts as pallas_pair.cell_pair_forces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from .pallas_pair import I32, PAIR_LJ, _pad_tt, pltpu_grid, stencil_table

def _packet_kernel(*refs, cap: int, n_types_pad: int, n_stencil: int,
                   n_packets: int, uniform_lj: bool = False):
    """Packet-grid kernel: grid (n_cells, cap//8); program (c, p) computes
    rows [8p, 8p+8) of cell c against the full (8, S*cap) candidate tile.

    The per-cell kernel pays cap x (S*cap) slots regardless of occupancy
    (measured ~5x padding at 100k: cap 40 vs mean occupancy ~7); here the
    row dimension shrinks to occupied 8-packets — programs whose packet
    starts beyond the cell's fill skip the tile entirely (pl.when), so row
    work tracks ceil(occ/8)*8 instead of cap.  Candidate lanes and the
    type one-hot are materialized ONCE per cell into scratch (p == 0) and
    reused by that cell's packets; row forces accumulate into a sublane-
    oriented (cap, 8) scratch (sublane dynamic writes are cheap where lane
    ones are not) and transpose into the output block at the last packet.

    refs: counts (SMEM 1x1), cpos8 (1, cap, 8) [x,y,z,valid,type,...],
          S x npos8, box, sig, eps, cut2, shift, islj,
          force_out (1, 4, cap), energy_out (1, 1, cap);
    scratch: acc (cap, 8), xj (8, S*cap), tjoh (Tp, S*cap).
    """
    counts_ref = refs[0]
    cpos_ref = refs[1]
    npos_refs = refs[2:2 + n_stencil]
    box_ref = refs[2 + n_stencil]
    sig_ref, eps_ref, cut2_ref, shift_ref, islj_ref = \
        refs[3 + n_stencil:8 + n_stencil]
    force_ref = refs[8 + n_stencil]
    energy_ref = refs[9 + n_stencil]
    acc_ref = refs[10 + n_stencil]
    xj_ref = refs[11 + n_stencil]
    tjoh_ref = refs[12 + n_stencil] if not uniform_lj else None

    p = pl.program_id(1)
    L = n_stencil * cap

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        xj = jnp.concatenate([r[0] for r in npos_refs], axis=0)  # (L, 8)
        xj_ref[...] = xj.T                                       # (8, L)
        if not uniform_lj:
            iota_t = jax.lax.broadcasted_iota(jnp.float32,
                                              (n_types_pad, L), 0)
            tjoh_ref[...] = (xj_ref[4][None, :] == iota_t).astype(jnp.float32)

    @pl.when(p * 8 < counts_ref[0, 0, 0])
    def _compute():
        xi = cpos_ref[0, pl.ds(p * 8, 8), :]  # (8, 8) sublane slice
        box = box_ref[0]
        ibox = 1.0 / box

        dr = []
        r2 = jnp.zeros((8, L), jnp.float32)
        for ax in range(3):
            d = xi[:, ax][:, None] - xj_ref[ax][None, :]
            d = d - box[ax] * jnp.round(d * ibox[ax])
            dr.append(d)
            r2 = r2 + d * d

        valid = (xi[:, 3][:, None] > 0.5) & (xj_ref[3][None, :] > 0.5)
        valid &= r2 > 1e-12                   # self-pair suppression
        r2s = jnp.where(valid, r2, 1.0)

        if uniform_lj:
            sig = sig_ref[0, 0]
            eps = eps_ref[0, 0]
            cut2 = cut2_ref[0, 0]
            shift = shift_ref[0, 0]
            in_cut = valid & (r2s < cut2)
        else:
            iota_i = jax.lax.broadcasted_iota(jnp.float32, (8, n_types_pad), 1)
            ti_oh = (xi[:, 4][:, None] == iota_i).astype(jnp.float32)

            def lut(m_ref):
                return jnp.dot(ti_oh,
                               jnp.dot(m_ref[...], tjoh_ref[...],
                                       preferred_element_type=jnp.float32),
                               preferred_element_type=jnp.float32)

            sig = lut(sig_ref)
            eps = lut(eps_ref)
            cut2 = lut(cut2_ref)
            shift = lut(shift_ref)
            in_cut = valid & (r2s < cut2) & (lut(islj_ref) > 0.5)

        # identical op sequence to _kernel/excluded_pair_correction
        # (0.75-sigma soft core; see the f32-cancellation note there)
        r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
        inv_r2c = 1.0 / r2c
        s2 = (sig * sig) * inv_r2c
        s6 = s2 * s2 * s2
        e_lj = jnp.where(in_cut, 4.0 * eps * (s6 * s6 - s6) - shift, 0.0)
        f_lj = jnp.where(in_cut, 48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c, 0.0)

        cols = [jnp.sum(f_lj * d, axis=1) for d in dr]
        cols.append(0.5 * jnp.sum(e_lj, axis=1))
        cols.append(0.5 * jnp.sum(f_lj * r2s, axis=1))   # pair virial
        out8 = jnp.stack(cols + [jnp.zeros_like(cols[0])] * 3, axis=1)  # (8, 8)
        acc_ref[pl.ds(p * 8, 8), :] = out8

    @pl.when(p == n_packets - 1)
    def _flush():
        acc = acc_ref[...]
        force_ref[0] = acc[:, :4].T           # (4, cap): fx, fy, fz, e-junk
        energy_ref[0, 0] = acc[:, 3].T
        energy_ref[0, 1] = acc[:, 4].T


def _resident_kernel(*refs, cap: int, n_types_pad: int, n_packets: int,
                     dims, offsets, uniform_lj: bool = False):
    """VMEM-resident packet kernel: the whole cell-dense position/type array
    lives in VMEM for the kernel's lifetime, so programs read their stencil
    blocks directly instead of streaming 27 operand DMAs per program — the
    streamed kernels measured DMA-latency-bound (~3-11 us per program at 10k
    with compute nearly free).  Grid (n_cells, cap//8); candidate tile and
    one-hots build once per cell into scratch, packets early-exit on the
    cell fill.  Gated by VMEM budget (cell-dense array ~4.3 MB at 100k).

    refs: counts (SMEM (C,1,1)), cpos8 (VMEM (C, cap, 8)), box (1, 8),
          sig, eps, cut2, shift, islj, force_out (C, 4, cap),
          energy_out (C, 2, cap);
    scratch: acc (cap, 8), xj (S*cap, 8), xjT (8, S*cap), tjoh (Tp, S*cap).
    """
    counts_ref, cpos_ref, box_ref = refs[0], refs[1], refs[2]
    sig_ref, eps_ref, cut2_ref, shift_ref, islj_ref = refs[3:8]
    force_ref, energy_ref = refs[8], refs[9]
    acc_ref, xj_ref, xjT_ref = refs[10], refs[11], refs[12]
    tjoh_ref = refs[13] if not uniform_lj else None

    c = pl.program_id(0)
    p = pl.program_id(1)
    nx, ny, nz = dims
    n_stencil = len(offsets)
    L = n_stencil * cap

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cx = c // (ny * nz)
        cy = (c // nz) % ny
        cz = c % nz
        for k, (dx, dy, dz) in enumerate(offsets):
            cid = (((cx + dx) % nx) * ny + (cy + dy) % ny) * nz \
                + (cz + dz) % nz
            xj_ref[pl.ds(k * cap, cap), :] = cpos_ref[cid]
        xjT_ref[...] = xj_ref[...].T
        if not uniform_lj:
            iota_t = jax.lax.broadcasted_iota(jnp.float32,
                                              (n_types_pad, L), 0)
            tjoh_ref[...] = (xjT_ref[4][None, :] == iota_t).astype(jnp.float32)

    @pl.when(p * 8 < counts_ref[c, 0, 0])
    def _compute():
        xi = cpos_ref[c, pl.ds(p * 8, 8), :]  # (8, 8)
        box = box_ref[0]
        ibox = 1.0 / box

        dr = []
        r2 = jnp.zeros((8, L), jnp.float32)
        for ax in range(3):
            d = xi[:, ax][:, None] - xjT_ref[ax][None, :]
            d = d - box[ax] * jnp.round(d * ibox[ax])
            dr.append(d)
            r2 = r2 + d * d

        valid = (xi[:, 3][:, None] > 0.5) & (xjT_ref[3][None, :] > 0.5)
        valid &= r2 > 1e-12
        r2s = jnp.where(valid, r2, 1.0)

        if uniform_lj:
            sig = sig_ref[0, 0]
            eps = eps_ref[0, 0]
            cut2 = cut2_ref[0, 0]
            shift = shift_ref[0, 0]
            in_cut = valid & (r2s < cut2)
        else:
            iota_i = jax.lax.broadcasted_iota(jnp.float32, (8, n_types_pad), 1)
            ti_oh = (xi[:, 4][:, None] == iota_i).astype(jnp.float32)

            def lut(m_ref):
                return jnp.dot(ti_oh,
                               jnp.dot(m_ref[...], tjoh_ref[...],
                                       preferred_element_type=jnp.float32),
                               preferred_element_type=jnp.float32)

            sig = lut(sig_ref)
            eps = lut(eps_ref)
            cut2 = lut(cut2_ref)
            shift = lut(shift_ref)
            in_cut = valid & (r2s < cut2) & (lut(islj_ref) > 0.5)

        # identical op sequence to _kernel/excluded_pair_correction
        r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
        inv_r2c = 1.0 / r2c
        s2 = (sig * sig) * inv_r2c
        s6 = s2 * s2 * s2
        e_lj = jnp.where(in_cut, 4.0 * eps * (s6 * s6 - s6) - shift, 0.0)
        f_lj = jnp.where(in_cut, 48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c, 0.0)

        cols = [jnp.sum(f_lj * d, axis=1) for d in dr]
        cols.append(0.5 * jnp.sum(e_lj, axis=1))
        cols.append(0.5 * jnp.sum(f_lj * r2s, axis=1))
        out8 = jnp.stack(cols + [jnp.zeros_like(cols[0])] * 3, axis=1)
        acc_ref[pl.ds(p * 8, 8), :] = out8

    @pl.when(p == n_packets - 1)
    def _flush():
        acc = acc_ref[...]
        force_ref[c] = acc[:, :4].T
        energy_ref[c] = acc[:, 3:5].T


def cell_pair_forces_resident(pos, type_id, active, box, buckets, dims, spec,
                              n_types: int, cap: int, interpret: bool = False,
                              uniform_lj: bool = False):
    """VMEM-resident packet kernel (see _resident_kernel).  Same contract as
    cell_pair_forces."""
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    global pl
    pl = pl_mod

    n_cells = int(np.prod(dims))
    n = pos.shape[0]
    rows = jnp.maximum(buckets[:n_cells], 0)
    slot_valid = (buckets[:n_cells] >= 0) & active[rows]
    cpos8 = jnp.concatenate(
        [pos[rows],
         slot_valid[..., None].astype(pos.dtype),
         jnp.where(slot_valid, type_id[rows], 0).astype(pos.dtype)[..., None],
         jnp.zeros(rows.shape + (3,), pos.dtype)], axis=-1)
    counts = jnp.sum(slot_valid, axis=1, dtype=I32)[:, None, None]
    box8 = jnp.concatenate([box, jnp.ones(5, box.dtype)])[None, :]

    tpad = max(8, -(-n_types // 8) * 8)
    is_lj = (spec.pair_kind == PAIR_LJ).astype(jnp.float32)
    params = [
        _pad_tt(spec.pair_sig, n_types, tpad),
        _pad_tt(spec.pair_eps, n_types, tpad),
        _pad_tt(spec.pair_cutoff2, n_types, tpad),
        _pad_tt(spec.pair_shift, n_types, tpad),
        _pad_tt(is_lj, n_types, tpad),
    ]

    from .neighbor import neighbor_cell_offsets

    offsets = tuple(tuple(int(x) for x in o)
                    for o in neighbor_cell_offsets(dims))
    n_stencil = len(offsets)
    n_packets = cap // 8
    L = n_stencil * cap

    full = pl_mod.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([pl_mod.BlockSpec(memory_space=pltpu.SMEM), full, full]
                + [full] * 5)
    scratch = [
        pltpu.VMEM((cap, 8), jnp.float32),
        pltpu.VMEM((L, 8), jnp.float32),
        pltpu.VMEM((8, L), jnp.float32),
    ]
    if not uniform_lj:
        scratch.append(pltpu.VMEM((tpad, L), jnp.float32))

    call = pl_mod.pallas_call(
        functools.partial(_resident_kernel, cap=cap, n_types_pad=tpad,
                          n_packets=n_packets, dims=tuple(int(d) for d in dims),
                          offsets=offsets, uniform_lj=uniform_lj),
        grid=(n_cells, n_packets),
        in_specs=in_specs,
        out_specs=(full, full),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells, 4, cap), jnp.float32),
            jax.ShapeDtypeStruct((n_cells, 2, cap), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )
    force_c, energy_c = call(counts, cpos8, box8, *params)

    force = jnp.zeros((n, 3), pos.dtype)
    flat_rows = jnp.where(slot_valid, rows, n).reshape(-1)
    force = force.at[flat_rows].add(
        force_c[:, :3, :].transpose(0, 2, 1).reshape(-1, 3), mode="drop")
    sv = slot_valid.reshape(-1)
    e = jnp.where(sv, energy_c[:, 0].reshape(-1), 0.0)
    w = jnp.where(sv, energy_c[:, 1].reshape(-1), 0.0)
    zero = jnp.asarray(0.0, pos.dtype)
    return force, jnp.sum(e), zero, jnp.sum(w)


def cell_pair_forces_packets(pos, type_id, active, box, buckets, dims, spec,
                             n_types: int, cap: int, interpret: bool = False,
                             uniform_lj: bool = False):
    """Packet-grid LJ forces (see _packet_kernel). Same contract as
    cell_pair_forces: the UNexcluded all-pairs sum."""
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    global pl
    pl = pl_mod

    n_cells = int(np.prod(dims))
    n = pos.shape[0]
    rows = jnp.maximum(buckets[:n_cells], 0)                # (C, cap)
    slot_valid = (buckets[:n_cells] >= 0) & active[rows]
    cpos8 = jnp.concatenate(
        [pos[rows],
         slot_valid[..., None].astype(pos.dtype),
         jnp.where(slot_valid, type_id[rows], 0).astype(pos.dtype)[..., None],
         jnp.zeros(rows.shape + (3,), pos.dtype)], axis=-1)  # (C, cap, 8)
    counts = jnp.sum(slot_valid, axis=1, dtype=I32)[:, None, None]  # (C,1,1)
    box4 = jnp.concatenate([box, jnp.ones(1, box.dtype)])[None, :]

    tpad = max(8, -(-n_types // 8) * 8)
    is_lj = (spec.pair_kind == PAIR_LJ).astype(jnp.float32)
    params = [
        _pad_tt(spec.pair_sig, n_types, tpad),
        _pad_tt(spec.pair_eps, n_types, tpad),
        _pad_tt(spec.pair_cutoff2, n_types, tpad),
        _pad_tt(spec.pair_shift, n_types, tpad),
        _pad_tt(is_lj, n_types, tpad),
    ]

    from .neighbor import neighbor_cell_offsets

    offsets = neighbor_cell_offsets(dims)
    n_stencil = offsets.shape[0]
    n_packets = cap // 8
    L = n_stencil * cap
    nx, ny, nz = (int(d) for d in dims)

    def cell_map(c, p):
        return (c, 0, 0)

    def nbr_map_k(off):
        dx, dy, dz = (int(o) for o in off)

        def m(c, p):
            cx = c // (ny * nz)
            cy = (c // nz) % ny
            cz = c % nz
            cid = (((cx + dx) % nx) * ny + (cy + dy) % ny) * nz \
                + (cz + dz) % nz
            return (cid, 0, 0)

        return m

    def rep2(c, p):
        return (0, 0)

    bs = pl_mod.BlockSpec
    in_specs = (
        [bs((1, 1, 1), lambda c, p: (c, 0, 0), memory_space=pltpu.SMEM),
         bs((1, cap, 8), cell_map)]
        + [bs((1, cap, 8), nbr_map_k(off)) for off in offsets]
        + [bs((1, 4), rep2)]
        + [bs((tpad, tpad), rep2)] * 5
    )
    scratch = [
        pltpu.VMEM((cap, 8), jnp.float32),
        pltpu.VMEM((8, L), jnp.float32),
    ]
    if not uniform_lj:
        scratch.append(pltpu.VMEM((tpad, L), jnp.float32))

    call = pl_mod.pallas_call(
        functools.partial(_packet_kernel, cap=cap, n_types_pad=tpad,
                          n_stencil=n_stencil, n_packets=n_packets,
                          uniform_lj=uniform_lj),
        grid=(n_cells, n_packets),
        in_specs=in_specs,
        out_specs=(
            bs((1, 4, cap), cell_map),
            bs((1, 2, cap), cell_map),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells, 4, cap), jnp.float32),
            jax.ShapeDtypeStruct((n_cells, 2, cap), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )
    force_c, energy_c = call(counts, cpos8, *([cpos8] * n_stencil),
                             box4, *params)

    force = jnp.zeros((n, 3), pos.dtype)
    flat_rows = jnp.where(slot_valid, rows, n).reshape(-1)
    force = force.at[flat_rows].add(
        force_c[:, :3, :].transpose(0, 2, 1).reshape(-1, 3), mode="drop")
    sv = slot_valid.reshape(-1)
    e = jnp.where(sv, energy_c[:, 0].reshape(-1), 0.0)
    w = jnp.where(sv, energy_c[:, 1].reshape(-1), 0.0)
    zero = jnp.asarray(0.0, pos.dtype)
    return force, jnp.sum(e), zero, jnp.sum(w)


def _column_kernel(*refs, cap: int, n_types_pad: int, nz: int,
                   dzs, col_idx, self_col: int, n_cols_u: int,
                   uniform_lj: bool = False):
    """Column-grid kernel: grid (nx*ny, nz); operands are whole z-COLUMNS
    of the cell-dense array, (1, nz*cap, 8) blocks whose index map depends
    only on the major grid dim — Pallas re-uses a resident block when its
    index is unchanged between consecutive grid steps, so the 9 xy-neighbor
    columns are DMA'd once per column instead of 27 cell operands per cell
    program (the per-cell kernel measured DMA-latency-bound, ~11 us/program
    with compute nearly free; this cuts the transfer count ~nz x 3).

    The per-pair math and candidate order are IDENTICAL to _kernel (f32
    op-sequence contract with excluded_pair_correction): program (c, z)
    slices its (cap, 8) rows and the S stencil slices out of the resident
    columns with dynamic sublane offsets and computes the same
    (cap, S*cap) tile.

    refs: n_cols_u x column (1, nz*cap, 8) [x,y,z,valid,type,0,0,0],
          box (1, 8), sig, eps, cut2, shift, islj,
          force_out (1, 4, cap), energy_out (1, 2, cap).
    """
    col_refs = refs[:n_cols_u]
    box_ref = refs[n_cols_u]
    sig_ref, eps_ref, cut2_ref, shift_ref, islj_ref = \
        refs[n_cols_u + 1:n_cols_u + 6]
    force_ref = refs[n_cols_u + 6]
    energy_ref = refs[n_cols_u + 7]

    z = pl.program_id(1)
    xi = col_refs[self_col][0, pl.ds(z * cap, cap), :]        # (cap, 8)
    slices = []
    for k in range(len(dzs)):
        zz = jax.lax.rem(z + (dzs[k] + nz), nz)
        slices.append(col_refs[col_idx[k]][0, pl.ds(zz * cap, cap), :])
    xj = jnp.concatenate(slices, axis=0)                      # (S*cap, 8)
    box = box_ref[0]
    ibox = 1.0 / box

    dr = []
    r2 = jnp.zeros((cap, xj.shape[0]), jnp.float32)
    for ax in range(3):
        d = xi[:, ax][:, None] - xj[:, ax][None, :]
        d = d - box[ax] * jnp.round(d * ibox[ax])
        dr.append(d)
        r2 = r2 + d * d

    valid = (xi[:, 3][:, None] > 0.5) & (xj[:, 3][None, :] > 0.5)
    valid &= r2 > 1e-12                   # self-pair suppression
    r2s = jnp.where(valid, r2, 1.0)

    if uniform_lj:
        sig = sig_ref[0, 0]
        eps = eps_ref[0, 0]
        cut2 = cut2_ref[0, 0]
        shift = shift_ref[0, 0]
        in_cut = valid & (r2s < cut2)
    else:
        iota_i = jax.lax.broadcasted_iota(jnp.float32, (cap, n_types_pad), 1)
        ti_oh = (xi[:, 4][:, None] == iota_i).astype(jnp.float32)
        iota_j = jax.lax.broadcasted_iota(jnp.float32,
                                          (xj.shape[0], n_types_pad), 1)
        tj_oh = (xj[:, 4][:, None] == iota_j).astype(jnp.float32)

        def lut(m_ref):
            return jnp.dot(ti_oh, jnp.dot(m_ref[...], tj_oh.T,
                                          preferred_element_type=jnp.float32),
                           preferred_element_type=jnp.float32)

        sig = lut(sig_ref)
        eps = lut(eps_ref)
        cut2 = lut(cut2_ref)
        shift = lut(shift_ref)
        in_cut = valid & (r2s < cut2) & (lut(islj_ref) > 0.5)

    # identical op sequence to _kernel/excluded_pair_correction
    # (0.75-sigma soft core; see the f32-cancellation note there)
    r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
    inv_r2c = 1.0 / r2c
    s2 = (sig * sig) * inv_r2c
    s6 = s2 * s2 * s2
    e_lj = jnp.where(in_cut, 4.0 * eps * (s6 * s6 - s6) - shift, 0.0)
    f_lj = jnp.where(in_cut, 48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c, 0.0)

    fxyz = [jnp.sum(f_lj * d, axis=1) for d in dr]
    force_ref[0] = jnp.stack(
        [fxyz[0], fxyz[1], fxyz[2], jnp.zeros_like(fxyz[0])], axis=0)
    energy_ref[0, 0] = 0.5 * jnp.sum(e_lj, axis=1)
    energy_ref[0, 1] = 0.5 * jnp.sum(f_lj * r2s, axis=1)


def _colz_kernel(*refs, cap: int, n_types_pad: int, nz: int,
                 dzs, col_idx, self_col: int, n_cols_u: int,
                 n_packets: int, uniform_lj: bool = False):
    """Z-unrolled, row-packeted column kernel: grid (nx*ny,) — ONE program
    per xy-column computes all nz cells against resident column operands
    with STATIC slices, and row work is gated per 8-row packet on the cell
    fill (``pl.when``), so compute tracks ceil(occ/8)*8 rows instead of cap.

    Why: the per-(cell) grid pays a ~3-4 us scalar-core dispatch per grid
    step (measured: cell and column kernels tie at 10k with 1331 grid steps
    each despite ~30x fewer DMAs in the latter, and the packet kernel's
    5x-fewer-rows LOSES because its grid has 5x more steps).  Folding z and
    the packet loop into the program divides the step count by nz*packets
    while keeping the occupancy gating.  Same f32 op order as _kernel —
    bit-exact.

    refs: counts (SMEM (1, 1, nz)), n_cols_u x column (1, nz*cap, 8), box,
          sig, eps, cut2, shift, islj, out (nz, cap, 8) with channels
          [fx, fy, fz, e_lj/2, w/2, 0, 0, 0] per particle slot.
    """
    counts_ref = refs[0]
    col_refs = refs[1:1 + n_cols_u]
    box_ref = refs[1 + n_cols_u]
    sig_ref, eps_ref, cut2_ref, shift_ref, islj_ref = \
        refs[2 + n_cols_u:7 + n_cols_u]
    out_ref = refs[7 + n_cols_u]              # (1, nz*cap, 8) — the same
                                              # leading-1 block pattern as the
                                              # column operands (Mosaic rejects
                                              # other sub-128-lane blockings)

    out_ref[...] = jnp.zeros_like(out_ref)
    box = box_ref[0]
    ibox = 1.0 / box

    for z in range(nz):
        slices = []
        for k in range(len(dzs)):
            zz = (z + dzs[k]) % nz
            slices.append(col_refs[col_idx[k]][0, zz * cap:(zz + 1) * cap, :])
        xj = jnp.concatenate(slices, axis=0)                   # (L, 8)
        L = xj.shape[0]
        if not uniform_lj:
            iota_t = jax.lax.broadcasted_iota(
                I32, (n_types_pad, L), 0).astype(jnp.float32)
            tj_oh_t = (xj[:, 4][None, :] == iota_t).astype(jnp.float32)

        for p in range(n_packets):
            @pl.when(p * 8 < counts_ref[0, 0, z])
            def _compute(z=z, p=p, xj=xj,
                         tj_oh_t=None if uniform_lj else tj_oh_t):
                xi = col_refs[self_col][
                    0, z * cap + p * 8:z * cap + p * 8 + 8, :]   # (8, 8)

                dr = []
                r2 = jnp.zeros((8, L), jnp.float32)
                for ax in range(3):
                    d = xi[:, ax][:, None] - xj[:, ax][None, :]
                    d = d - box[ax] * jnp.round(d * ibox[ax])
                    dr.append(d)
                    r2 = r2 + d * d

                valid = (xi[:, 3][:, None] > 0.5) & (xj[:, 3][None, :] > 0.5)
                valid &= r2 > 1e-12
                r2s = jnp.where(valid, r2, 1.0)

                if uniform_lj:
                    sig = sig_ref[0, 0]
                    eps = eps_ref[0, 0]
                    cut2 = cut2_ref[0, 0]
                    shift = shift_ref[0, 0]
                    in_cut = valid & (r2s < cut2)
                else:
                    iota_i = jax.lax.broadcasted_iota(
                        I32, (8, n_types_pad), 1).astype(jnp.float32)
                    ti_oh = (xi[:, 4][:, None] == iota_i).astype(jnp.float32)

                    def lut(m_ref):
                        return jnp.dot(
                            ti_oh,
                            jnp.dot(m_ref[...], tj_oh_t,
                                    preferred_element_type=jnp.float32),
                            preferred_element_type=jnp.float32)

                    sig = lut(sig_ref)
                    eps = lut(eps_ref)
                    cut2 = lut(cut2_ref)
                    shift = lut(shift_ref)
                    in_cut = valid & (r2s < cut2) & (lut(islj_ref) > 0.5)

                # identical op sequence to _kernel/excluded_pair_correction
                r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
                inv_r2c = 1.0 / r2c
                s2 = (sig * sig) * inv_r2c
                s6 = s2 * s2 * s2
                e_lj = jnp.where(in_cut,
                                 4.0 * eps * (s6 * s6 - s6) - shift, 0.0)
                f_lj = jnp.where(in_cut,
                                 48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c, 0.0)

                cols = [jnp.sum(f_lj * d, axis=1) for d in dr]
                cols.append(0.5 * jnp.sum(e_lj, axis=1))
                cols.append(0.5 * jnp.sum(f_lj * r2s, axis=1))   # pair virial
                out8 = jnp.stack(cols + [jnp.zeros_like(cols[0])] * 3,
                                 axis=1)                         # (8, 8)
                out_ref[0, z * cap + p * 8:z * cap + (p + 1) * 8, :] = out8


def _colt_kernel(*refs, cap: int, n_types_pad: int, nz: int,
                 self_col: int, n_cols_u: int, n_packets: int,
                 uniform_lj: bool = False, want_virial: bool = False):
    """Transpose-once column kernel ("colt"): the measured bound of every
    streamed variant is the per-z sublane->lane channel transpose of the
    candidate tile (xj[:, ax][None, :] on a (S*cap, 8) slice, repeated for
    x/y/z/valid/type at every cell — cell, dynamic-column and z-unrolled
    kernels all land at 54-60 ms at 100k despite 24x different grid and
    DMA counts).  Here each program transposes its 9 HALOED z-columns ONCE
    into channel-major (8, (nz+2)*cap) scratch, and every cell reads its
    stencil windows as unaligned static LANE slices (measured ~free); the
    pair tile is per-column (8, 3*cap) with rows packet-gated on the cell
    fill.

    Candidate GROUPING differs from the cell kernel (per-column partial
    sums instead of one (cap, S*cap) lane reduction), so results agree to
    f32 rounding, not bitwise; the per-pair op sequence is unchanged, which
    is what the excluded-pair correction contract requires.

    refs: counts (SMEM (1, 1, nz)), n_cols_u x haloed column
          (1, (nz+2)*cap, 8) [x,y,z,valid,type,0,0,0], box (1, 8),
          sig, eps, cut2, shift, islj, out (1, nz*cap, 4)
          [fx, fy, fz, e/2|w/2] (16-byte rows halve the slot_of epilogue
          gather; channel 3 is energy by default, virial under
          want_virial); scratch: n_cols_u x (8, (nz+2)*cap) f32.
    """
    counts_ref = refs[0]
    self_ref = refs[1]                                # (1, (nz+2)*cap, 8)
    colt_refs = refs[2:2 + n_cols_u]                  # (1, 8, (nz+2)*cap)
    box_ref = refs[2 + n_cols_u]
    sig_ref, eps_ref, cut2_ref, shift_ref, islj_ref = \
        refs[3 + n_cols_u:8 + n_cols_u]
    out_ref = refs[8 + n_cols_u]

    out_ref[...] = jnp.zeros_like(out_ref)
    box = box_ref[0]
    ibox = 1.0 / box
    W = 3 * cap

    for z in range(nz):
        lo = z * cap                                   # haloed window start
        if not uniform_lj:
            iota_t = jax.lax.broadcasted_iota(
                I32, (n_types_pad, W), 0).astype(jnp.float32)
        wins = [colt_refs[k][0, :, lo:lo + W] for k in range(n_cols_u)]

        for p in range(n_packets):
            @pl.when(p * 8 < counts_ref[0, 0, z])
            def _compute(z=z, p=p, wins=wins,
                         iota_t=None if uniform_lj else iota_t):
                r0 = (z + 1) * cap + p * 8             # haloed self rows
                xi = self_ref[0, r0:r0 + 8, :]                  # (8, 8)

                fx = jnp.zeros((8,), jnp.float32)
                fy = jnp.zeros((8,), jnp.float32)
                fz = jnp.zeros((8,), jnp.float32)
                es = jnp.zeros((8,), jnp.float32)
                ws = jnp.zeros((8,), jnp.float32)
                if not uniform_lj:
                    iota_i = jax.lax.broadcasted_iota(
                        I32, (8, n_types_pad), 1).astype(jnp.float32)
                    ti_oh = (xi[:, 4][:, None] == iota_i).astype(jnp.float32)

                for k in range(n_cols_u):
                    w = wins[k]                        # (8ch, W)
                    dr = []
                    r2 = jnp.zeros((8, W), jnp.float32)
                    for ax in range(3):
                        d = xi[:, ax][:, None] - w[ax][None, :]
                        d = d - box[ax] * jnp.round(d * ibox[ax])
                        dr.append(d)
                        r2 = r2 + d * d

                    valid = (xi[:, 3][:, None] > 0.5) & (w[3][None, :] > 0.5)
                    valid &= r2 > 1e-12
                    r2s = jnp.where(valid, r2, 1.0)

                    if uniform_lj:
                        sig = sig_ref[0, 0]
                        eps = eps_ref[0, 0]
                        cut2 = cut2_ref[0, 0]
                        shift = shift_ref[0, 0]
                        in_cut = valid & (r2s < cut2)
                    else:
                        tj_oh_t = (w[4][None, :] == iota_t).astype(jnp.float32)

                        def lut(m_ref):
                            return jnp.dot(
                                ti_oh,
                                jnp.dot(m_ref[...], tj_oh_t,
                                        preferred_element_type=jnp.float32),
                                preferred_element_type=jnp.float32)

                        sig = lut(sig_ref)
                        eps = lut(eps_ref)
                        cut2 = lut(cut2_ref)
                        shift = lut(shift_ref)
                        in_cut = valid & (r2s < cut2) & (lut(islj_ref) > 0.5)

                    # identical per-pair op sequence to _kernel /
                    # excluded_pair_correction (0.75-sigma soft core)
                    r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
                    inv_r2c = 1.0 / r2c
                    s2 = (sig * sig) * inv_r2c
                    s6 = s2 * s2 * s2
                    e_lj = jnp.where(in_cut,
                                     4.0 * eps * (s6 * s6 - s6) - shift, 0.0)
                    f_lj = jnp.where(in_cut,
                                     48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c,
                                     0.0)

                    fx = fx + jnp.sum(f_lj * dr[0], axis=1)
                    fy = fy + jnp.sum(f_lj * dr[1], axis=1)
                    fz = fz + jnp.sum(f_lj * dr[2], axis=1)
                    es = es + 0.5 * jnp.sum(e_lj, axis=1)
                    ws = ws + 0.5 * jnp.sum(f_lj * r2s, axis=1)

                out4 = jnp.stack([fx, fy, fz, ws if want_virial else es],
                                 axis=1)                             # (8, 4)
                out_ref[0, z * cap + p * 8:z * cap + (p + 1) * 8, :] = out4



def cell_pair_forces_columns(pos, type_id, active, box, buckets, dims, spec,
                             n_types: int, cap: int, interpret: bool = False,
                             uniform_lj: bool = False, z_unroll: bool = True):
    """Column-grid LJ forces (see _column_kernel / _colz_kernel).  Same
    contract as cell_pair_forces: the UNexcluded all-pairs sum."""
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    global pl
    pl = pl_mod

    nx, ny, nz = (int(d) for d in dims)
    n_cells = nx * ny * nz
    n = pos.shape[0]
    rows = jnp.maximum(buckets[:n_cells], 0)                # (C, cap)
    slot_valid = (buckets[:n_cells] >= 0) & active[rows]
    cpos8 = jnp.concatenate(
        [pos[rows],
         slot_valid[..., None].astype(pos.dtype),
         jnp.where(slot_valid, type_id[rows], 0).astype(pos.dtype)[..., None],
         jnp.zeros(rows.shape + (3,), pos.dtype)], axis=-1)  # (C, cap, 8)
    # z is the minor cell index, so a column is contiguous
    cols8 = cpos8.reshape(nx * ny, nz * cap, 8)
    box8 = jnp.concatenate([box, jnp.ones(5, box.dtype)])[None, :]

    tpad = max(8, -(-n_types // 8) * 8)
    is_lj = (spec.pair_kind == PAIR_LJ).astype(jnp.float32)
    params = [
        _pad_tt(spec.pair_sig, n_types, tpad),
        _pad_tt(spec.pair_eps, n_types, tpad),
        _pad_tt(spec.pair_cutoff2, n_types, tpad),
        _pad_tt(spec.pair_shift, n_types, tpad),
        _pad_tt(is_lj, n_types, tpad),
    ]

    from .neighbor import neighbor_cell_offsets

    offsets = [tuple(int(x) for x in o) for o in neighbor_cell_offsets(dims)]
    # group the S stencil offsets by xy column (candidate ORDER preserved —
    # the lane-sum order must match _kernel for bit-identical results)
    xy_list = []
    for dx, dy, _dz in offsets:
        if (dx, dy) not in xy_list:
            xy_list.append((dx, dy))
    col_idx = tuple(xy_list.index((dx, dy)) for dx, dy, _dz in offsets)
    dzs = tuple(dz for _dx, _dy, dz in offsets)
    self_col = xy_list.index((0, 0))
    n_cols_u = len(xy_list)

    bs = pl_mod.BlockSpec

    def colmap_k(dx, dy):
        def m(c, z):
            cx = c // ny
            cy = c % ny
            return ((cx + dx) % nx * ny + (cy + dy) % ny, 0, 0)

        return m

    def cellmap(c, z):
        return (c * nz + z, 0, 0)

    def rep2(c, z):
        return (0, 0)

    if z_unroll and cap % 8 == 0:
        from jax.experimental.pallas import tpu as pltpu

        counts = jnp.sum(slot_valid, axis=1, dtype=I32).reshape(nx * ny, 1, nz)

        def colmap1_k(dx, dy):
            def m(c):
                cx = c // ny
                cy = c % ny
                return ((cx + dx) % nx * ny + (cy + dy) % ny, 0, 0)

            return m

        in_specs = (
            [bs((1, 1, nz), lambda c: (c, 0, 0), memory_space=pltpu.SMEM)]
            + [bs((1, nz * cap, 8), colmap1_k(dx, dy)) for dx, dy in xy_list]
            + [bs((1, 8), lambda c: (0, 0))]
            + [bs((tpad, tpad), lambda c: (0, 0))] * 5
        )
        call = pl_mod.pallas_call(
            functools.partial(_colz_kernel, cap=cap, n_types_pad=tpad,
                              nz=nz, dzs=dzs, col_idx=col_idx,
                              self_col=self_col, n_cols_u=n_cols_u,
                              n_packets=cap // 8, uniform_lj=uniform_lj),
            grid=(nx * ny,),
            in_specs=in_specs,
            out_specs=bs((1, nz * cap, 8), lambda c: (c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nx * ny, nz * cap, 8),
                                           jnp.float32),
            interpret=interpret,
        )
        out_c = call(counts, *([cols8] * n_cols_u), box8, *params)
        force = jnp.zeros((n, 3), pos.dtype)
        flat_rows = jnp.where(slot_valid, rows, n).reshape(-1)
        force = force.at[flat_rows].add(out_c[..., :3].reshape(-1, 3),
                                        mode="drop")
        sv = slot_valid.reshape(-1)
        e = jnp.where(sv, out_c[..., 3].reshape(-1), 0.0)
        w = jnp.where(sv, out_c[..., 4].reshape(-1), 0.0)
        zero = jnp.asarray(0.0, pos.dtype)
        return force, jnp.sum(e), zero, jnp.sum(w)
    else:
        in_specs = (
            [bs((1, nz * cap, 8), colmap_k(dx, dy)) for dx, dy in xy_list]
            + [bs((1, 8), rep2)]
            + [bs((tpad, tpad), rep2)] * 5
        )

        call = pl_mod.pallas_call(
            functools.partial(_column_kernel, cap=cap, n_types_pad=tpad,
                              nz=nz, dzs=dzs, col_idx=col_idx,
                              self_col=self_col, n_cols_u=n_cols_u,
                              uniform_lj=uniform_lj),
            grid=(nx * ny, nz),
            in_specs=in_specs,
            out_specs=(
                bs((1, 4, cap), cellmap),
                bs((1, 2, cap), cellmap),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_cells, 4, cap), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, 2, cap), jnp.float32),
            ),
            interpret=interpret,
        )
        force_c, energy_c = call(*([cols8] * n_cols_u), box8, *params)

    force = jnp.zeros((n, 3), pos.dtype)
    flat_rows = jnp.where(slot_valid, rows, n).reshape(-1)
    force = force.at[flat_rows].add(
        force_c[:, :3, :].transpose(0, 2, 1).reshape(-1, 3), mode="drop")
    sv = slot_valid.reshape(-1)
    e = jnp.where(sv, energy_c[:, 0].reshape(-1), 0.0)
    w = jnp.where(sv, energy_c[:, 1].reshape(-1), 0.0)
    zero = jnp.asarray(0.0, pos.dtype)
    return force, jnp.sum(e), zero, jnp.sum(w)


