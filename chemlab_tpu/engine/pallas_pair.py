"""Pallas TPU cell-tile pair-force kernel (the TPU fast path).

The XLA pair path gathers neighbor positions row-by-row from the Verlet list
— random-access reads that are the measured bottleneck on TPU (v5e: ~11
cycles/element; the (N, K) force gather plus the (N, 27*cap) rebuild gather
dominate the step).  This kernel processes the cell decomposition directly
with fully regular tiles instead:

  - particles are binned into cells (the existing bucket build); positions
    and types are laid out cell-dense as (n_cells, cap, ...)
  - the kernel grid is (cell, stencil): each program computes the
    (cap, cap) distance tile of one cell against one of its 27 stencil
    cells in VMEM and accumulates every in-range LJ contribution
  - stencil cell ids are scalar-prefetched so the block index maps stream
    the neighbor-cell tiles (PrefetchScalarGridSpec)
  - per-type-pair parameters are NOT gathered (Mosaic has no in-kernel
    vector gather): with T types, param(i, j) = onehot(ti) @ P @ onehot(tj)
    — two tiny MXU matmuls per parameter matrix, the TPU-native lookup

Exclusions and intra-cell self pairs are handled OUTSIDE the kernel: the
kernel computes the unexcluded all-pairs sum, and the (short) exclusion list
is evaluated in XLA and subtracted — the standard "compute-all, subtract
excluded" formulation that keeps the hot tile free of per-pair masks.

Scope: PAIR_LJ only (no tabulated/mixing/lambda/caps/coulomb — the build
gates the fast path; everything else uses the XLA path).  Periodic minimum
image assumes cell edge >= cutoff so only adjacent cells contribute.
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
    if ((kinds == PAIR_TAB).any()
            or (spec_np["pair_caprad"] > 0).any()
            or spec_np["pair_lam_scale"].any()
            or (spec_np["pair_mix_mode"] != 0).any()
            or (spec_np["pair_pps_incr"] > 0).any()):
        return False
    return True


def supports_cheb(spec_np) -> bool:
    """Static gate for the Chebyshev-compressed tabulated fast path
    (tab_cheb.py): tabulated-only systems — caps, per-pair force caps,
    lambda scaling, multi-range (func 9/17) mixing, pair-age ramps AND
    mixed LJ+tab type maps stay on the exact XLA row path (pure-tab keeps
    the kernel's single spare output channel an exact per-term energy).
    Two-table blending (func 10 conversion-mixed / func 12 static-mixed,
    ref gromacs_topology.py:574-583,756-790) IS admitted: the table-scalar
    kernel mode blends x*T_a + (1-x)*T_b per pair (build falls back to the
    row path if the distinct-table dedupe exceeds the scalar-mode budget).
    The per-table fit validation (the other half of the gate) runs in
    build once the table stack exists."""
    from .spec import MIX_MULTIRANGE

    kinds = spec_np["pair_kind"]
    if not (kinds == PAIR_TAB).any():
        return False
    if ((kinds == PAIR_LJ).any()
            or (kinds > PAIR_TAB).any()
            or (spec_np["pair_caprad"] > 0).any()
            or (spec_np["pair_max_force"] > 0).any()
            or spec_np["pair_lam_scale"].any()
            or (spec_np["pair_mix_mode"] == MIX_MULTIRANGE).any()
            or (spec_np["pair_pps_incr"] > 0).any()):
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


def _kernel(*refs,
            cap: int, n_types_pad: int, n_stencil: int,
            uniform_lj: bool = False, want_virial: bool = False):
    """Grid is (n_cells,): ONE program per cell computes the full
    (cap, S*cap) candidate tile — S*cap lanes keep the 128-lane VPU filled
    (a per-(cell, stencil) grid wastes >half the lanes on cap-wide tiles).

    Stencil cell ids are COMPUTED in the block index maps (modular
    arithmetic on the cell index) — a prefetched (n_cells, S) table would
    lane-pad to n_cells*128 ints in SMEM and overflow it at 100k particles.

    Operands are PACKED: channel 3 of cpos carries type_id + 1 for a valid
    slot and 0 for an invalid one (padding / inactive), so the wrapper needs
    ONE gather per call (and the kernel half as many DMAs) instead of
    separate pos/type/valid streams — the wrapper's three 16-byte-row
    gathers were the measured bound of every kernel variant at 100k.

    refs layout: cpos, S x npos, box, sig, eps, cut2, shift, islj,
                 force_out.
    """
    cpos_ref = refs[0]
    npos_refs = refs[1:1 + n_stencil]
    box_ref = refs[1 + n_stencil]
    sig_ref, eps_ref, cut2_ref, shift_ref, islj_ref = \
        refs[2 + n_stencil:7 + n_stencil]
    out_ref = refs[7 + n_stencil]             # out (1, cap, 4) slot-major
                                              # [fx, fy, fz, e/2|w/2]: one
                                              # 16-byte row per slot so the
                                              # epilogue gather through
                                              # slot_of costs ONE unit per
                                              # particle (32-byte rows
                                              # measured 2x: 4.0 vs 2.0 ms
                                              # at 100k).  Channel 3 carries
                                              # the pair energy by default
                                              # and the pair virial under
                                              # want_virial — each call site
                                              # (force pass / pressure pass)
                                              # needs only one of the two

    xi = cpos_ref[0]                          # (cap, 4): xyz + (type+1|0)
    xj = jnp.concatenate([r[0] for r in npos_refs], axis=0)   # (S*cap, 4)
    box = box_ref[0]
    ibox = 1.0 / box

    # minimum-image displacement tiles, (cap, S*cap) per axis
    dr = []
    r2 = jnp.zeros((cap, xj.shape[0]), jnp.float32)
    for ax in range(3):
        d = xi[:, ax][:, None] - xj[:, ax][None, :]
        d = d - box[ax] * jnp.round(d * ibox[ax])
        dr.append(d)
        r2 = r2 + d * d

    valid = (xi[:, 3][:, None] > 0.5) & (xj[:, 3][None, :] > 0.5)
    # self-pair suppression: kernel adds pairs with r2 == 0 nowhere
    valid &= r2 > 1e-12
    r2s = jnp.where(valid, r2, 1.0)

    if uniform_lj:
        # every pair is LJ with the same parameters: scalar broadcast skips
        # both one-hot contractions and all five MXU lookups (~half the
        # kernel flops on parameter-uniform systems)
        sig = sig_ref[0, 0]
        eps = eps_ref[0, 0]
        cut2 = cut2_ref[0, 0]
        shift = shift_ref[0, 0]
        in_cut = valid & (r2s < cut2)
    else:
        # type-pair parameter lookup via rank-1 one-hot contraction:
        # P[ti, tj] = onehot(ti) @ P @ onehot(tj)^T  — MXU, no gather.
        # One-hots come from the packed tv = type+1 channel by float
        # compare (small ints are exact in f32); tv = 0 (invalid) matches
        # no column, so invalid rows contribute zero through the LUT too.
        iota_i = jax.lax.broadcasted_iota(
            jnp.float32, (cap, n_types_pad), 1) + 1.0
        iota_j = jax.lax.broadcasted_iota(
            jnp.float32, (xj.shape[0], n_types_pad), 1) + 1.0
        ti_oh = (xi[:, 3][:, None] == iota_i).astype(jnp.float32)  # (cap, Tp)
        tj_oh = (xj[:, 3][:, None] == iota_j).astype(jnp.float32)  # (S*cap,Tp)

        def lut(m_ref):
            return jnp.dot(ti_oh, jnp.dot(m_ref[...], tj_oh.T),
                           preferred_element_type=jnp.float32)

        sig = lut(sig_ref)
        eps = lut(eps_ref)
        cut2 = lut(cut2_ref)
        shift = lut(shift_ref)
        in_cut = valid & (r2s < cut2) & (lut(islj_ref) > 0.5)

    # ---- LJ, soft-cored below 0.75 sigma ----
    # The all-pairs-minus-excluded formulation evaluates EXCLUDED pairs too;
    # an excluded pair may legitimately sit near r=0 (an angle-less 1-3 pair
    # folding back), where unclamped LJ is inf and inf - inf = NaN destroys
    # the system.  Clamping r^2 at (0.75 sigma)^2 in BOTH the kernel and the
    # correction keeps the cancelled value finite (~2.4e3 eps) so the
    # subtraction noise stays ~1e-4 of thermal forces.  Real (non-excluded)
    # pairs essentially never visit r < 0.75 sigma in an equilibrated run.
    r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
    inv_r2c = 1.0 / r2c
    s2 = (sig * sig) * inv_r2c
    s6 = s2 * s2 * s2
    e_lj = jnp.where(in_cut, 4.0 * eps * (s6 * s6 - s6) - shift, 0.0)
    f_lj = jnp.where(in_cut, 48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c, 0.0)

    fxyz = [jnp.sum(f_lj * d, axis=1) for d in dr]
    e_half = 0.5 * jnp.sum(e_lj, axis=1)
    # pair virial W = sum r.F = sum (F/r) r^2 — makes NPT runnable on the
    # fast path (the strain-derivative virial needs per-step Verlet rows)
    w_half = 0.5 * jnp.sum(f_lj * r2s, axis=1)
    ch3 = w_half if want_virial else e_half
    out_ref[0] = jnp.stack([fxyz[0], fxyz[1], fxyz[2], ch3], axis=1)


def _colt2_kernel(*refs, cap: int, n_types_pad: int, nz: int,
                  self_col: int, n_cols_u: int, n_packets: int,
                  uniform_lj: bool = False, want_virial: bool = False,
                  cheb_kw: int = 0, cheb_ko: int = 0, lj_on: bool = True,
                  want_energy: bool = True, all_lj: bool = False,
                  cheb_ntab: int = 0, cheb_mix: bool = False):
    """Rolled variant of _colt_kernel.

    The original colt kernel fully unrolls nz x n_packets x n_cols_u tile
    bodies (~1000 inlined (8, 3cap) tiles at 100k) and gates dead packets
    with pl.when — measured ~8x above the VPU op-count floor, i.e. bound by
    the instruction stream, not the data.  This variant:

      - concatenates the 9 per-z windows ONCE into a single (8, 9*3cap)
        candidate tile (one tile body per packet instead of 9, one lane
        reduction per output instead of 9 partial sums), and
      - replaces the unrolled, pl.when-gated packet loop with a
        lax.fori_loop over ceil(count/8) packets whose body uses dynamic
        SUBLANE slices/writes (cheap on TPU, unlike lane ones), so dead
        packets cost nothing and the loop body is emitted once per z.

    Same operands and contract as _colt_kernel; candidate grouping differs
    again (one (8, 9W) reduction), so agreement with the cell kernel stays
    at f32-rounding level, which the excluded-pair correction contract
    permits (per-pair op sequence is unchanged).
    """
    counts_ref = refs[0]
    self_ref = refs[1]                                # (1, (nz+2)*cap, 8)
    colt_refs = refs[2:2 + n_cols_u]                  # (1, 8, (nz+2)*cap)
    box_ref = refs[2 + n_cols_u]
    sig_ref, eps_ref, cut2_ref, shift_ref, islj_ref = \
        refs[3 + n_cols_u:8 + n_cols_u]
    tabmat_b_ref = xmat_ref = None
    if cheb_kw and cheb_ntab:
        # table-scalar mode: a (tpad, tpad) table-id matrix rides the fused
        # parameter-plane lookup; per-table fit scalars arrive in SMEM.
        # cheb_mix adds the second-table id matrix and the per-step blend
        # plane x (func 10/12: x*T_a + (1-x)*T_b)
        cheb_ref = None
        o_r = 8 + n_cols_u
        tabmat_ref = refs[o_r]
        o_r += 1
        if cheb_mix:
            tabmat_b_ref = refs[o_r]
            xmat_ref = refs[o_r + 1]
            o_r += 2
        tabsc_ref = refs[o_r]
        out_ref = refs[o_r + 1]
    elif cheb_kw:
        cheb_ref = refs[8 + n_cols_u]
        tabmat_ref = tabsc_ref = None
        out_ref = refs[9 + n_cols_u]
    else:
        cheb_ref = tabmat_ref = tabsc_ref = None
        out_ref = refs[8 + n_cols_u]
    # the per-step force pass needs neither the pair energy nor the virial:
    # the energy-coefficient lookups (kw + ko cm() matmuls on the cheb path)
    # and the e accumulation are skipped entirely, and the wrapper ships a
    # correspondingly smaller coefficient operand (has_e gates BOTH sides)
    has_e = want_energy and not want_virial

    out_ref[...] = jnp.zeros_like(out_ref)
    if cheb_kw and cheb_ntab:
        # hoist the per-table fit scalars out of the z/packet loops: one
        # SMEM read each, live in registers for every Clenshaw chain
        _P = 2 * cheb_kw + 2 * cheb_ko + 6
        tabsc = [[tabsc_ref[t, k] for k in range(_P)]
                 for t in range(cheb_ntab)]
    else:
        tabsc = None
    box = box_ref[0]
    # strength-reduced minimum image: d - box * round(d * (1/box)) — one
    # reciprocal per launch replaces three VPU divides per slot.  The
    # excluded-pair correction runs the SAME expression (the cancellation
    # contract), as does every kernel in this module and the variant ladder.
    ibox = 1.0 / box
    W = 3 * cap
    L = n_cols_u * W

    for z in range(nz):
        lo = z * cap                                   # haloed window start
        xj = jnp.concatenate(
            [colt_refs[k][0, :, lo:lo + W] for k in range(n_cols_u)],
            axis=1)                                    # (8ch, L)
        if not uniform_lj:
            iota_t = jax.lax.broadcasted_iota(
                I32, (n_types_pad, L), 0).astype(jnp.float32)
            tj_oh_t = (xj[4][None, :] == iota_t).astype(jnp.float32)
            # z-level half of the (ti, tj) parameter lookup: ONE (tpad, L)
            # plane per parameter matrix, shared by every packet in the
            # column; the per-packet half collapses to a single
            # (8, tpad) @ (tpad, n_m*L) MXU dot.  The previous form ran
            # TWO dots per matrix per packet — the dominant uncounted work
            # of the measured 10.5% MFU (ROOFLINE_r05.md).
            lj_mats = [cut2_ref]
            if lj_on:
                lj_mats += [sig_ref, eps_ref]
                if has_e:
                    lj_mats.append(shift_ref)
                if not all_lj:
                    # islj gates non-LJ type pairs; a system whose every
                    # type pair IS LJ (all_lj, static) skips the plane
                    lj_mats.append(islj_ref)
            if cheb_ntab:
                # table-scalar mode: the compact table-id plane is the ONLY
                # per-type-pair lookup the tabulated branch needs
                lj_mats.append(tabmat_ref)
                if cheb_mix:
                    lj_mats += [tabmat_b_ref, xmat_ref]
            Pz = jnp.concatenate(
                [jnp.dot(m[...], tj_oh_t,
                         preferred_element_type=jnp.float32)
                 for m in lj_mats], axis=1)            # (tpad, n_m*L)
        else:
            tj_oh_t = None
            Pz = None
        if cheb_kw and not cheb_ntab:
            # coefficient-plane mode: per-z half of the (type_i, type_j)
            # coefficient lookup — one (n_mats*tpad, tpad) @ (tpad, L) MXU
            # pass shared by every packet in the column; the per-packet
            # half is n_mats tiny (8, tpad) @ (tpad, L) dots
            Zc = jnp.dot(cheb_ref[...], tj_oh_t,
                         preferred_element_type=jnp.float32)
        else:
            Zc = None
        npk = (counts_ref[0, 0, z] + 7) // 8

        def body(p, carry, z=z, xj=xj, tj_oh_t=tj_oh_t, Zc=Zc, Pz=Pz):
            r0 = (z + 1) * cap + p * 8                 # haloed self rows
            xi = self_ref[0, pl.ds(r0, 8), :]          # (8, 8)

            dr = []
            r2 = jnp.zeros((8, L), jnp.float32)
            for ax in range(3):
                d = xi[:, ax][:, None] - xj[ax][None, :]
                d = d - box[ax] * jnp.round(d * ibox[ax])
                dr.append(d)
                r2 = r2 + d * d

            valid = (xi[:, 3][:, None] > 0.5) & (xj[3][None, :] > 0.5)
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
                # per-packet half of the parameter lookup: one fused dot
                # against the per-z planes, then static lane slices
                Q = jnp.dot(ti_oh, Pz, preferred_element_type=jnp.float32)
                cut2 = Q[:, :L]
                o = L
                if lj_on:
                    sig = Q[:, o:o + L]
                    eps = Q[:, o + L:o + 2 * L]
                    o += 2 * L
                    if has_e:
                        shift = Q[:, o:o + L]
                        o += L
                    else:
                        shift = None
                    in_cut = valid & (r2s < cut2)
                    if not all_lj:
                        in_cut &= Q[:, o:o + L] > 0.5
                        o += L
                if cheb_ntab:
                    tabp = Q[:, o:o + L]      # compact table slot + 1 | 0
                    o += L
                    if cheb_mix:
                        tabp_b = Q[:, o:o + L]
                        xpl = Q[:, o + L:o + 2 * L]

            if lj_on or uniform_lj:
                # identical per-pair op sequence to _kernel /
                # excluded_pair_correction (0.75-sigma soft core)
                r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
                inv_r2c = 1.0 / r2c
                s2 = (sig * sig) * inv_r2c
                s6 = s2 * s2 * s2
                e_lj = (jnp.where(in_cut,
                                  4.0 * eps * (s6 * s6 - s6) - shift, 0.0)
                        if has_e else jnp.zeros_like(r2s))
                f_lj = jnp.where(in_cut,
                                 48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c,
                                 0.0)
            else:
                e_lj = f_lj = jnp.zeros_like(r2s)

            if cheb_kw and cheb_ntab:
                # table-scalar mode: one Clenshaw chain per USED table from
                # SMEM scalars, selected by the table-id plane.  The scalar
                # values and eval_planes' op sequence are identical to the
                # coefficient-plane mode's, so the excluded-pair correction
                # (eval_pairs) cancels either mode at f32 rounding — while
                # the per-packet MXU coefficient dots drop from kw+ko+6
                # to the one fused parameter dot above (ROOFLINE_r05.md).
                from . import tab_cheb

                kw, ko = cheb_kw, cheb_ko
                base = 2 * kw + 2 * ko
                g_acc = jnp.zeros_like(r2s)
                e_acc = jnp.zeros_like(r2s) if has_e else None
                for t in range(cheb_ntab):
                    def sc(k, t=t):
                        return tabsc[t][k]

                    wall_g = [sc(k) for k in range(kw)]
                    wall_e = ([sc(kw + k) for k in range(kw)] if has_e
                              else [jnp.float32(0.0)] * 2)
                    if ko:
                        well_g = [sc(2 * kw + k) for k in range(ko)]
                        well_e = ([sc(2 * kw + ko + k) for k in range(ko)]
                                  if has_e else [jnp.float32(0.0)] * 2)
                    else:
                        well_g = well_e = None
                    ay_s, by_s = sc(base), sc(base + 1)
                    ax_s, bx_s = sc(base + 2), sc(base + 3)
                    rs2_s, rcap2_s = sc(base + 4), sc(base + 5)
                    g_t, e_t = tab_cheb.eval_planes(
                        r2s, wall_g, wall_e, well_g, well_e,
                        ay_s, by_s, ax_s if ko else None,
                        bx_s if ko else None, rs2_s if ko else None,
                        rcap2_s, kw, ko, want_e=has_e)
                    if cheb_mix:
                        # blend weight: x for table a, (1-x) for table b —
                        # pure pairs carry x = 1 and slot_b = 0, so the
                        # accumulate form reduces to the select form
                        # exactly (fl(1*g) + fl(0*g') = g); the correction
                        # twin computes x*g_a + (1-x)*g_b in the same op
                        # order, preserving the cancellation contract
                        sa = (tabp == jnp.float32(t + 1)).astype(jnp.float32)
                        sb = (tabp_b
                              == jnp.float32(t + 1)).astype(jnp.float32)
                        w = xpl * sa + (1.0 - xpl) * sb
                        g_acc = g_acc + w * g_t
                        if has_e:
                            e_acc = e_acc + w * e_t
                    else:
                        sel = tabp == jnp.float32(t + 1)
                        g_acc = jnp.where(sel, g_t, g_acc)
                        if has_e:
                            e_acc = jnp.where(sel, e_t, e_acc)
                in_cut_t = valid & (r2s < cut2)
                f_tab = jnp.where(in_cut_t, g_acc, 0.0)
                f_all = f_lj + f_tab
                if has_e:
                    e_all = e_lj + jnp.where(in_cut_t, e_acc, 0.0)
                else:
                    e_all = e_lj
            elif cheb_kw:
                # Chebyshev-compressed tabulated pairs (tab_cheb.py): the
                # per-packet half of the coefficient lookup, then exactly
                # eval_planes' op sequence (the excluded-pair correction
                # must cancel these contributions at f32 rounding)
                from . import tab_cheb

                def cm(m, Zc=Zc):
                    return jnp.dot(ti_oh,
                                   Zc[m * n_types_pad:(m + 1) * n_types_pad],
                                   preferred_element_type=jnp.float32)

                kw, ko = cheb_kw, cheb_ko
                # operand order must mirror cell_pair_forces_colt's mats
                # stacking: wall_g, [wall_e], well_g, [well_e], ay, by,
                # [ax, bx, rs2], rcap2.  No istab matrix: supports_cheb
                # admits PURE tabulated systems only, so r2s < cut2 already
                # implies a real tabulated pair (padding types carry
                # cut2 = 0).
                wall_g = [cm(k) for k in range(kw)]
                o = kw
                if has_e:
                    wall_e = [cm(o + k) for k in range(kw)]
                    o += kw
                else:
                    wall_e = [jnp.zeros_like(wall_g[0])] * 2
                if ko:
                    well_g = [cm(o + k) for k in range(ko)]
                    o += ko
                    if has_e:
                        well_e = [cm(o + k) for k in range(ko)]
                        o += ko
                    else:
                        well_e = [jnp.zeros_like(well_g[0])] * 2
                else:
                    well_g = well_e = None
                ay_m, by_m = cm(o), cm(o + 1)
                o += 2
                if ko:
                    ax_m, bx_m, rs2_m = cm(o), cm(o + 1), cm(o + 2)
                    o += 3
                else:
                    ax_m = bx_m = rs2_m = None
                rcap2_m = cm(o)
                g_t, e_t = tab_cheb.eval_planes(
                    r2s, wall_g, wall_e, well_g, well_e,
                    ay_m, by_m, ax_m, bx_m, rs2_m, rcap2_m, kw, ko,
                    want_e=has_e)
                in_cut_t = valid & (r2s < cut2)
                f_tab = jnp.where(in_cut_t, g_t, 0.0)
                f_all = f_lj + f_tab
                if has_e:
                    e_all = e_lj + jnp.where(in_cut_t, e_t, 0.0)
                else:
                    e_all = e_lj
            else:
                f_all, e_all = f_lj, e_lj

            fx = jnp.sum(f_all * dr[0], axis=1)
            fy = jnp.sum(f_all * dr[1], axis=1)
            fz = jnp.sum(f_all * dr[2], axis=1)
            if want_virial:
                ch3 = 0.5 * jnp.sum(f_all * r2s, axis=1)
            elif has_e:
                ch3 = 0.5 * jnp.sum(e_all, axis=1)
            else:
                ch3 = jnp.zeros((8,), jnp.float32)
            out4 = jnp.stack([fx, fy, fz, ch3], axis=1)          # (8, 4)
            out_ref[0, pl.ds(z * cap + p * 8, 8), :] = out4
            return carry

        jax.lax.fori_loop(0, npk, body, 0)


def cell_pair_forces_colt(pos, type_id, active, box, buckets, dims, spec,
                          n_types: int, cap: int, interpret: bool = False,
                          uniform_lj: bool = False, slot_of=None,
                          want_virial: bool = False, impl: str = "colt2",
                          cheb_kw: int = 0, cheb_ko: int = 0,
                          lj_on: bool = True, x_halo: bool = False,
                          want_energy: bool = True, all_lj: bool = False,
                          cheb_ntab: int = 0, cheb_mix: bool = False,
                          obs_x=None):
    """Transpose-once column kernel (see _colt_kernel).  Same contract as
    cell_pair_forces (UNexcluded all-pairs sum); requires min(dims) >= 3
    (full 27-stencil) and cap % 8 == 0 — callers gate and fall back.

    cheb_kw > 0 enables the Chebyshev tabulated branch (colt2 only): the
    per-table fit arrays on ``spec`` are lowered here to a stacked
    (n_mats*tpad, tpad) type-pair LUT operand (order: wall_g*kw, wall_e*kw,
    [well_g*ko, well_e*ko,] ay, by, [ax, bx, rs2,] rcap2, istab).

    x_halo (pallas_halo.py slab mode): ``buckets``/``dims`` describe a
    LOCAL x-slab EXTENDED by one halo x-layer on each side (dims[0] =
    w + 2); the kernel grid covers only the w inner layers, x indexing is
    offset instead of wrapped (periodicity is the halo exchange's job),
    and the return value is the raw (w*ny*nz*cap, 4) slot output — the
    caller owns the particle epilogue."""
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    global pl
    pl = pl_mod

    import os

    nx, ny, nz = (int(d) for d in dims)
    n_cells = nx * ny * nz
    n = pos.shape[0]
    tv_all = jnp.where(active, type_id + 1, 0).astype(pos.dtype)
    packed = jnp.concatenate([pos, tv_all[:, None]], axis=-1)       # (N, 4)
    if slot_of is not None and os.environ.get("CHEMLAB_DENSE") == "scatter":
        # scatter N packed 16-byte rows into zeros (holes: tv=0 -> valid=0).
        # slot_of is an exact inverse (one particle per slot), so
        # unique_indices lets the scatter lower unserialized — the old
        # 8-wide variant without it measured slower than the gather
        # (TPU_NUMBERS_r04); re-tried after ROOFLINE_r05 flagged the
        # C*cap-row gather (A/B: scripts/dense_mode_micro.py)
        g = jnp.zeros((n_cells * cap, 4), pos.dtype).at[slot_of].set(
            packed, mode="drop", unique_indices=True
        ).reshape(n_cells, cap, 4)
    else:
        # ONE packed 16-byte-row gather (same expression as the cell
        # kernel's wrapper, so XLA CSE shares it within a step); the valid
        # and type channels are derived from the packed type+1|0 channel
        # with elementwise ops instead of two further (C, cap) gathers
        rows = jnp.maximum(buckets[:n_cells], 0)            # (C, cap)
        g = jnp.where((buckets[:n_cells] >= 0)[..., None], packed[rows], 0.0)
    tv = g[..., 3]
    slot_valid = tv > 0.5                # bucket-valid AND active, by packing
    cpos8 = jnp.concatenate(
        [g[..., :3],
         (tv > 0.5).astype(pos.dtype)[..., None],
         jnp.maximum(tv - 1.0, 0.0)[..., None],
         jnp.zeros(g.shape[:2] + (3,), pos.dtype)], axis=-1)
    cols8 = cpos8.reshape(nx * ny, nz * cap, 8)
    # z-halo: [last cell | column | first cell] so every stencil window is
    # one contiguous lane slice after the in-kernel transpose
    cols8h = jnp.concatenate(
        [cols8[:, -cap:], cols8, cols8[:, :cap]], axis=1)    # (CC, (nz+2)cap, 8)
    # real bins hold only active particles, filled from rank 0 — occupancy
    # gates the packet loop exactly in both operand-build branches
    counts = jnp.sum(buckets[:n_cells] >= 0, axis=1,
                     dtype=I32).reshape(nx * ny, 1, nz)
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

    has_e = want_energy and not want_virial
    if cheb_kw and cheb_ntab:
        if impl != "colt2":
            raise ValueError("cheb tabulated branch requires the colt2 "
                             "kernel")
        # table-scalar mode: the compact table-id matrix joins the fused
        # parameter-plane lookup; the fit scalars ride in SMEM
        cheb_ops = [_pad_tt(spec.cheb_tab_slot, n_types, tpad)]
        if cheb_mix:
            # func-10/12 blending: second-table ids + the per-step blend
            # factor x (conversion observable or static), forced to 1 on
            # pure pairs so blend == select there bit-exactly
            from .spec import MIX_OBS

            x_pp = jnp.where(spec.pair_mix_mode == MIX_OBS,
                             obs_x[spec.pair_obs], spec.pair_mix_x)
            x_pp = jnp.where(spec.cheb_tab_slot_b > 0.5, x_pp,
                             jnp.ones_like(x_pp))
            cheb_ops += [_pad_tt(spec.cheb_tab_slot_b, n_types, tpad),
                         _pad_tt(x_pp, n_types, tpad)]
        cheb_ops.append(spec.cheb_sc.astype(jnp.float32))
    elif cheb_kw:
        if impl != "colt2":
            raise ValueError("cheb tabulated branch requires the colt2 "
                             "kernel")
        # lower the per-TABLE fit columns to per-type-pair LUT matrices and
        # stack them into one (n_mats*tpad, tpad) operand, matrix order
        # matching _colt2_kernel's cm() indexing: wall_g, [wall_e], well_g,
        # [well_e], ay, by, [ax, bx, rs2], rcap2 — the energy columns ship
        # only when the call wants energies (the per-step force pass
        # doesn't: smaller DMA + half the coefficient matmuls)
        tabm = jnp.maximum(spec.pair_tab_a, 0)           # (T*T,) table ids

        def ctt(col):
            return _pad_tt(col[tabm], n_types, tpad)

        kw, ko = cheb_kw, cheb_ko
        mats = [ctt(spec.cheb_wall_g[:, k]) for k in range(kw)]
        if has_e:
            mats += [ctt(spec.cheb_wall_e[:, k]) for k in range(kw)]
        if ko:
            mats += [ctt(spec.cheb_well_g[:, k]) for k in range(ko)]
            if has_e:
                mats += [ctt(spec.cheb_well_e[:, k]) for k in range(ko)]
        mats += [ctt(spec.cheb_ay), ctt(spec.cheb_by)]
        if ko:
            mats += [ctt(spec.cheb_ax), ctt(spec.cheb_bx),
                     ctt(spec.cheb_rs2)]
        mats += [ctt(spec.cheb_rcap2)]
        cheb_op = jnp.concatenate(mats, axis=0)          # (n_mats*tpad, tpad)
        cheb_ops = [cheb_op]
    else:
        cheb_ops = []

    # the 9 xy-neighbor columns (full 27-stencil required)
    xy_list = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    self_col = xy_list.index((0, 0))
    n_cols_u = len(xy_list)
    bs = pl_mod.BlockSpec

    if x_halo:
        # grid over the w = nx - 2 inner layers; x offsets index the halo
        # layers directly (non-periodic — the ppermute exchange already
        # placed the wrapped neighbors there)
        n_grid_cols = (nx - 2) * ny

        def colmap1_k(dx, dy):
            def m(c):
                cx = c // ny + 1
                cy = c % ny
                return ((cx + dx) * ny + (cy + dy) % ny, 0, 0)

            return m

        counts = counts[ny:(nx - 1) * ny]
    else:
        n_grid_cols = nx * ny

        def colmap1_k(dx, dy):
            def m(c):
                cx = c // ny
                cy = c % ny
                return ((cx + dx) % nx * ny + (cy + dy) % ny, 0, 0)

            return m

    # channel-major columns for the candidate windows: lane dim (nz+2)*cap
    # makes the HBM->VMEM DMA dense (an 8-lane-minor operand fragments into
    # strided sublane chunks) and the in-kernel window reads transpose-free
    cols8hT = cols8h.transpose(0, 2, 1)                  # (CC, 8, (nz+2)cap)

    if cheb_kw and cheb_ntab:
        cheb_specs = (
            [bs((tpad, tpad), lambda c: (0, 0))] * (len(cheb_ops) - 1)
            + [bs(tuple(cheb_ops[-1].shape), lambda c: (0, 0),
                  memory_space=pltpu.SMEM)]
        )
    else:
        cheb_specs = [bs((op.shape[0], tpad), lambda c: (0, 0))
                      for op in cheb_ops]
    in_specs = (
        [bs((1, 1, nz), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
         bs((1, (nz + 2) * cap, 8), colmap1_k(0, 0))]
        + [bs((1, 8, (nz + 2) * cap), colmap1_k(dx, dy))
           for dx, dy in xy_list]
        + [bs((1, 8), lambda c: (0, 0))]
        + [bs((tpad, tpad), lambda c: (0, 0))] * 5
        + cheb_specs
    )
    if impl == "colt2":
        kfn = _colt2_kernel
    else:
        from .pallas_pair_variants import _colt_kernel
        kfn = _colt_kernel
    extra_kw = (dict(cheb_kw=cheb_kw, cheb_ko=cheb_ko, lj_on=lj_on,
                     want_energy=want_energy, all_lj=all_lj,
                     cheb_ntab=cheb_ntab, cheb_mix=cheb_mix)
                if impl == "colt2" else {})
    call = pl_mod.pallas_call(
        functools.partial(kfn, cap=cap, n_types_pad=tpad,
                          nz=nz, self_col=self_col, n_cols_u=n_cols_u,
                          n_packets=cap // 8, uniform_lj=uniform_lj,
                          want_virial=want_virial, **extra_kw),
        grid=(n_grid_cols,),
        in_specs=in_specs,
        out_specs=bs((1, nz * cap, 4), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_grid_cols, nz * cap, 4),
                                       jnp.float32),
        interpret=interpret,
    )
    out_c = call(counts, cols8h, *([cols8hT] * n_cols_u), box8, *params,
                 *cheb_ops)
    out_flat = out_c.reshape(n_grid_cols * nz * cap, 4)
    if x_halo:
        return out_flat
    if slot_of is not None:
        # out_c's (nx*ny, nz*cap, 4) flat order is (cid // nz)*nz*cap +
        # (cid % nz)*cap + p == cid*cap + p — exactly slot_of's indexing
        in_grid = slot_of < n_cells * cap
        rows_f = out_flat[jnp.where(in_grid, slot_of, 0)]    # (N, 4)
        force = jnp.where(in_grid[:, None], rows_f[:, :3], 0.0)
    else:
        force = jnp.zeros((n, 3), pos.dtype)
        flat_rows = jnp.where(slot_valid, rows, n).reshape(-1)
        force = force.at[flat_rows].add(out_flat[:, :3], mode="drop")
    zero = jnp.asarray(0.0, pos.dtype)
    s3 = jnp.sum(out_flat[:, 3])
    if want_virial:
        return force, zero, zero, s3
    if cheb_kw:
        # pure-tab system (supports_cheb contract): the spare channel held
        # the tabulated pair energy
        return force, zero, s3, zero
    return force, s3, zero, zero


def _pad_tt(a, n_types: int, pad: int):
    """(T*T,) flat type-pair column -> (Tp, Tp) padded square matrix.

    jnp (not numpy): ``a`` is a traced spec column when called under jit.
    """
    m = jnp.zeros((pad, pad), jnp.float32)
    return m.at[:n_types, :n_types].set(
        a.reshape(n_types, n_types).astype(jnp.float32))


def cell_pair_forces(pos, type_id, active, box, buckets, dims, spec,
                     n_types: int, cap: int, interpret: bool = False,
                     uniform_lj: bool = False, packets: bool | None = None,
                     slot_of=None, want_virial: bool = False,
                     cheb_kw: int = 0, cheb_ko: int = 0,
                     want_energy: bool = True, all_lj: bool = False,
                     cheb_ntab: int = 0, cheb_mix: bool = False,
                     obs_x=None):
    """All-pairs (minus nothing) cell-tile LJ forces.

    Returns (force (N,3), e_lj, e_tab == 0, w) over the UNexcluded all-pairs
    sum; callers subtract the exclusion-list contributions.  The cell and
    colt kernels emit ONE spare output channel, so e_lj and w are exclusive
    there: the default call returns (f, e, 0, 0), a ``want_virial`` call
    (f, 0, 0, w) — the force pass needs only e, the pressure pass only w.
    ``buckets`` is (n_cells+1, cap) particle rows (-1 padded); ``dims`` the
    static cell-grid dims.  ``slot_of`` (the (N,) inverse of buckets, from
    ``build_cell_buckets``) turns the epilogue scatter-add into per-axis
    gathers; without it the legacy scatter path runs.  CHEMLAB_KERNEL
    selects an experimental variant kernel.
    """
    import os

    if cheb_kw:
        # the Chebyshev tabulated branch exists only in colt2 (build gates
        # geometry: cap % 8 == 0, full 27-stencil) — never silently route a
        # tabulated system to an LJ-only kernel
        if cap % 8 != 0 or min(int(d) for d in dims) < 3:
            raise ValueError("cheb tabulated path requires colt2-legal "
                             "geometry (cap %% 8 == 0, min(dims) >= 3)")
        return cell_pair_forces_colt(pos, type_id, active, box, buckets,
                                     dims, spec, n_types, cap,
                                     interpret=interpret,
                                     uniform_lj=False, slot_of=slot_of,
                                     want_virial=want_virial, impl="colt2",
                                     cheb_kw=cheb_kw, cheb_ko=cheb_ko,
                                     lj_on=False, want_energy=want_energy,
                                     cheb_ntab=cheb_ntab, cheb_mix=cheb_mix,
                                     obs_x=obs_x)

    choice = os.environ.get("CHEMLAB_KERNEL", "")
    if not choice:
        # legacy toggle
        if os.environ.get("CHEMLAB_PACKET", "") == "0" or packets is False:
            choice = "cell"
        elif packets:
            choice = "packet"
    if not choice:
        # Measured on v5e (TPU_NUMBERS_r04 kernel matrix): the rolled
        # transpose-once column kernel (colt2) beats the per-cell kernel at
        # every scale — 2.01 vs 3.23 ms at 10k/1331 cells, 11.75 vs 42.7 ms
        # at 100k/13824 cells (the unrolled colt1 sat at 31.5: ~1000
        # inlined tile bodies made it instruction-stream bound).  Default
        # to colt2 wherever its layout is legal (cap % 8, full 27-stencil);
        # the variants stay selectable (CHEMLAB_KERNEL=cell|colt1|colt2|
        # packet|column|resident) for tuning.
        if cap % 8 == 0 and min(int(d) for d in dims) >= 3:
            choice = "colt"
        else:
            choice = "cell"
    if choice == "resident" and cap % 8 == 0:
        from .pallas_pair_variants import cell_pair_forces_resident
        return cell_pair_forces_resident(pos, type_id, active, box, buckets,
                                         dims, spec, n_types, cap,
                                         interpret=interpret,
                                         uniform_lj=uniform_lj)
    if choice == "column":
        from .pallas_pair_variants import cell_pair_forces_columns
        return cell_pair_forces_columns(pos, type_id, active, box, buckets,
                                        dims, spec, n_types, cap,
                                        interpret=interpret,
                                        uniform_lj=uniform_lj)
    if choice in ("colt", "colt1", "colt2") and cap % 8 == 0 \
            and min(int(d) for d in dims) >= 3:
        return cell_pair_forces_colt(pos, type_id, active, box, buckets,
                                     dims, spec, n_types, cap,
                                     interpret=interpret,
                                     uniform_lj=uniform_lj, slot_of=slot_of,
                                     want_virial=want_virial,
                                     impl="colt" if choice == "colt1"
                                     else "colt2",
                                     want_energy=want_energy, all_lj=all_lj)
    if choice == "packet" and cap % 8 == 0:
        from .pallas_pair_variants import cell_pair_forces_packets
        return cell_pair_forces_packets(pos, type_id, active, box, buckets,
                                        dims, spec, n_types, cap,
                                        interpret=interpret,
                                        uniform_lj=uniform_lj)
    from jax.experimental import pallas as pl_mod

    global pl
    pl = pl_mod

    n_cells = int(np.prod(dims))
    n = pos.shape[0]
    # packed operand: ONE (C*cap,) 16-byte-row transfer instead of separate
    # pos/type/valid gathers — the three-gather wrapper was the measured
    # bound of every kernel variant at 100k (~11-14 ns/element gather wall;
    # rows up to 16 bytes cost the same as one element)
    tv = jnp.where(active, type_id + 1, 0).astype(pos.dtype)
    packed = jnp.concatenate([pos, tv[:, None]], axis=-1)   # (N, 4)
    if slot_of is not None and os.environ.get("CHEMLAB_DENSE") == "scatter":
        # scatter N rows into zeros instead of gathering C*cap rows — fewer
        # rows moved; slot_of is an exact inverse (one particle per slot),
        # so unique_indices lets the scatter lower unserialized (without
        # it this variant measured SLOWER than the gather: 45.7 vs 43.2 ms
        # at 100k, TPU_NUMBERS_r04; A/B: scripts/dense_mode_micro.py)
        cpos = jnp.zeros((n_cells * cap, 4), pos.dtype).at[slot_of].set(
            packed, mode="drop", unique_indices=True
        ).reshape(n_cells, cap, 4)
    else:
        rows = jnp.maximum(buckets[:n_cells], 0)            # (C, cap)
        cpos = jnp.where((buckets[:n_cells] >= 0)[..., None],
                         packed[rows], 0.0)
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

    offsets = neighbor_cell_offsets(dims)     # (S, 3), deduplicated
    n_stencil = offsets.shape[0]
    call = pl.pallas_call(
        functools.partial(_kernel, cap=cap, n_types_pad=tpad,
                          n_stencil=n_stencil, uniform_lj=uniform_lj,
                          want_virial=want_virial),
        grid_spec=pltpu_grid(n_cells, cap, tpad, dims, offsets),
        out_shape=jax.ShapeDtypeStruct((n_cells, cap, 4), jnp.float32),
        interpret=interpret,
    )
    out_c = call(cpos, *([cpos] * n_stencil), box4, *params)
    flat = out_c.reshape(n_cells * cap, 4)

    # epilogue: every particle lives in exactly ONE slot, so the force
    # comes back by the slot_of inverse map — ONE (N,) 16-byte-row gather
    # instead of a C*cap-row scatter-add.  Invalid slots computed zero
    # already (tv=0 gates them in-kernel); energy/virial arrive pre-reduced
    # per program in the tiny (C, 8) ew output.
    if slot_of is not None:
        in_grid = slot_of < n_cells * cap
        rows_f = flat[jnp.where(in_grid, slot_of, 0)]       # (N, 4)
        force = jnp.where(in_grid[:, None], rows_f[:, :3], 0.0)
    else:
        force = jnp.zeros((n, 3), pos.dtype)
        flat_rows = jnp.where(buckets[:n_cells] >= 0, rows, n).reshape(-1)
        force = force.at[flat_rows].add(flat[:, :3], mode="drop")
    zero = jnp.asarray(0.0, pos.dtype)
    s3 = jnp.sum(flat[:, 3])
    if want_virial:
        return force, zero, zero, s3
    return force, s3, zero, zero


def pltpu_grid(n_cells, cap, tpad, dims, offsets):
    """Grid (n_cells,) with one streamed block PER STENCIL OFFSET: the same
    cell-dense operand is passed S times, each with an index map computing
    that offset's periodic neighbor cell from the cell index (no stencil
    table — a prefetched one would overflow SMEM at large grids)."""
    from jax.experimental import pallas as pl_mod

    nx, ny, nz = (int(d) for d in dims)

    def cell_map(i):
        return (i, 0, 0)

    def nbr_map_k(off):
        dx, dy, dz = (int(o) for o in off)

        def m(i):
            cx = i // (ny * nz)
            cy = (i // nz) % ny
            cz = i % nz
            cid = (((cx + dx) % nx) * ny + (cy + dy) % ny) * nz \
                + (cz + dz) % nz
            return (cid, 0, 0)

        return m

    def rep2(i):
        return (0, 0)

    bs = pl_mod.BlockSpec
    return pl_mod.GridSpec(
        grid=(n_cells,),
        in_specs=(
            [bs((1, cap, 4), cell_map)]
            + [bs((1, cap, 4), nbr_map_k(off)) for off in offsets]
            + [bs((1, 4), rep2)]
            + [bs((tpad, tpad), rep2)] * 5
        ),
        out_specs=bs((1, cap, 4), cell_map),
    )


def _pair_eval(spec, n_types, pi, pj, box, valid, has_tab: bool = True,
               cheb: tuple | None = None, cheb_mix: bool = False,
               obs_x=None):
    """Per-pair correction terms for packed endpoint rows of ANY leading
    shape: ``pi``/``pj`` are (..., 4) [x, y, z, type+1|0] rows, ``valid``
    (...,) bool.  Returns (d, f_scalar, e_lj, e_tab) elementwise — the
    caller owns force assembly (flat scatter-add vs rolled planes).

    EXACTLY the kernel's op sequence (0.75-sigma soft-core clamp, s2 then
    s2*s2*s2, literal 4.0/48.0): the subtraction must cancel the kernel's
    contribution to the last f32 ulp — any algebraic difference leaves
    eps*|F| of spurious force on every excluded pair.  Shared by the flat
    exclusion correction and the dense-static rolled-plane leg
    (excl_dense.py) so the two legs are token-identical per element."""
    # the kernel never added pairs with inactive endpoints; subtracting
    # them here would inject spurious force
    valid = valid & (pi[..., 3] > 0.5) & (pj[..., 3] > 0.5)
    d = pi[..., :3] - pj[..., :3]
    d = d - box * jnp.round(d * (1.0 / box))
    r2 = jnp.sum(d * d, -1)
    r2s = jnp.where(valid, jnp.maximum(r2, 1e-12), 1.0)
    r = jnp.sqrt(r2s)
    ti = jnp.maximum(pi[..., 3].astype(I32) - 1, 0)
    tj = jnp.maximum(pj[..., 3].astype(I32) - 1, 0)
    pid = ti * n_types + tj
    kind = spec.pair_kind[pid]
    in_cut = valid & (r2s < spec.pair_cutoff2[pid])

    sig = spec.pair_sig[pid]
    eps = spec.pair_eps[pid]
    r2c = jnp.maximum(r2s, 0.5625 * (sig * sig))
    inv_r2c = 1.0 / r2c
    s2 = (sig * sig) * inv_r2c
    s6 = s2 * s2 * s2
    lj_m = in_cut & (kind == PAIR_LJ)
    e_lj = jnp.where(lj_m, 4.0 * eps * (s6 * s6 - s6) - spec.pair_shift[pid],
                     0.0)
    f_lj = jnp.where(lj_m, 48.0 * eps * (s6 * s6 - 0.5 * s6) * inv_r2c, 0.0)

    if cheb is not None:
        from . import tab_cheb

        kw, ko = cheb
        tab_m = in_cut & (kind == PAIR_TAB)
        fit_dev = dict(wall_g=spec.cheb_wall_g, wall_e=spec.cheb_wall_e,
                       well_g=spec.cheb_well_g, well_e=spec.cheb_well_e,
                       ay=spec.cheb_ay, by=spec.cheb_by,
                       ax=spec.cheb_ax, bx=spec.cheb_bx,
                       rs2=spec.cheb_rs2, rcap2=spec.cheb_rcap2)
        g_t, e_t = tab_cheb.eval_pairs(
            fit_dev, jnp.maximum(spec.pair_tab_a[pid], 0), r2s, kw, ko)
        if cheb_mix:
            # func-10/12 blend twin: x*T_a + (1-x)*T_b in the SAME op order
            # as the kernel's weight-accumulate (pure pairs carry x = 1)
            from .spec import MIX_OBS

            g_b, e_b = tab_cheb.eval_pairs(
                fit_dev, jnp.maximum(spec.pair_tab_b[pid], 0), r2s, kw, ko)
            x = jnp.where(spec.pair_mix_mode[pid] == MIX_OBS,
                          obs_x[spec.pair_obs[pid]], spec.pair_mix_x[pid])
            x = jnp.where(spec.cheb_tab_slot_b[pid] > 0.5, x,
                          jnp.ones_like(x))
            g_t = x * g_t + (1.0 - x) * g_b
            e_t = x * e_t + (1.0 - x) * e_b
        e_tab = jnp.where(tab_m, e_t, 0.0)
        f_tab = jnp.where(tab_m, g_t, 0.0)
    elif has_tab:
        from . import tables as tables_mod

        tab_m = in_cut & (kind == PAIR_TAB)
        e_t, f_t = tables_mod.interpolate(spec.nb_ef, spec.nb_r0, spec.nb_dr,
                                          spec.pair_tab_a[pid], r)
        e_tab = jnp.where(tab_m, e_t, 0.0)
        f_tab = jnp.where(tab_m, f_t / r, 0.0)
    else:
        e_tab = jnp.zeros_like(e_lj)
        f_tab = jnp.zeros_like(f_lj)
    return d, f_lj + f_tab, e_lj, e_tab, r2s, valid


def excluded_pair_correction(spec, n_types, pos, box, type_id, excl,
                             active=None, has_tab: bool = True,
                             cheb: tuple | None = None,
                             cheb_mix: bool = False, obs_x=None):
    """Energy/force of the exclusion-list pairs, to subtract from the
    all-pairs kernel result (computed in plain XLA; the list is short).

    ``cheb=(kw, ko)`` selects the Chebyshev-fit evaluation for tabulated
    pairs (tab_cheb.eval_pairs — the token-identical twin of the colt2
    kernel's tab branch) instead of the 4096-bin interpolation: when the
    kernel served cheb values, the subtraction must cancel THOSE."""
    i = excl[:, 0]
    j = excl[:, 1]
    valid = (i >= 0) & (j >= 0)
    ic = jnp.maximum(i, 0)
    jc = jnp.maximum(j, 0)
    # packed [x, y, z, type+1|0] rows — one 16-byte-row gather per endpoint
    # instead of pos + type + active gathers; the same packing expression as
    # the cell kernel's wrapper, so XLA CSE shares the array within a step
    if active is not None:
        tv = jnp.where(active, type_id + 1, 0).astype(pos.dtype)
    else:
        tv = (type_id + 1).astype(pos.dtype)
    packed = jnp.concatenate([pos, tv[:, None]], axis=-1)
    pi = packed[ic]
    pj = packed[jc]
    d, f_s, e_lj, e_tab, r2s, valid = _pair_eval(
        spec, n_types, pi, pj, box, valid, has_tab=has_tab, cheb=cheb,
        cheb_mix=cheb_mix, obs_x=obs_x)

    f_over_r = f_s[:, None] * d
    n = pos.shape[0]
    force = jnp.zeros_like(pos)
    force = force.at[jnp.where(valid, ic, n)].add(f_over_r, mode="drop")
    force = force.at[jnp.where(valid, jc, n)].add(-f_over_r, mode="drop")
    # pair virial of the excluded pairs — same (F/r) * r^2 form as the
    # kernel so the subtraction cancels exactly
    w = jnp.sum(f_s * r2s)
    return force, jnp.sum(e_lj), jnp.sum(e_tab), w


def __getattr__(name):
    """Delegate the experimental kernel-variant names to
    pallas_pair_variants (VERDICT r3 item 8 moved them out of the hot
    path; scripts/tests keep addressing them through this module)."""
    if name in ("cell_pair_forces_packets", "cell_pair_forces_columns",
                "cell_pair_forces_resident", "_packet_kernel",
                "_resident_kernel", "_column_kernel", "_colz_kernel",
                "_colt_kernel"):
        from . import pallas_pair_variants
        return getattr(pallas_pair_variants, name)
    raise AttributeError(name)
