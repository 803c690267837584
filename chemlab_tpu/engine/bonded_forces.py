"""Bonded forces: bonds, angles, dihedrals, 1-4 pairs.

Energies are computed explicitly; forces come from ``jax.grad`` of the total
bonded energy — the geometry chain rules (angle/dihedral derivatives) are
left to AD, which XLA fuses into the same program.  Tabulated terms use a
straight-through construction so the gradient returns the table's force
column (-F) instead of the derivative of the interpolant, matching the
reference engine's use of tabulated forces.

Functional forms (ref: doc/topology.rst and gromacs_topology.py:916-945,
1071-1083, 1184-1204; parameters arrive pre-converted by the spec builder —
GROMACS K values halved where espressopp potentials use U = K(x-x0)^2,
degrees already in radians):

  bonds      func 1 harmonic   U = K (r - r0)^2
             func 7 FENE       U = -K/2 rMax^2 ln(1 - ((r-r0)/rMax)^2)
             func 8 tabulated
             func 9 FENE+LJ    FENE + WCA-shifted LJ(sigma, epsilon)
  angles     func 1 harmonic   U = K (theta - theta0)^2
             func 8 tabulated
             func 11 cosine    U = K (1 + cos(theta - theta0))
  dihedrals  func 1 harmonic n-cos  U = K (1 + cos(n phi - phi0))
             func 3 Ryckaert-Bellemans  U = sum_n Cn cos(psi)^n, psi = phi - pi
             func 8 tabulated
             func 12 harmonic  U = K wrap(phi - phi0)^2
  pairs14    LJ with fudged epsilon (+ optional truncated Coulomb)

Per-entry lambda scales each term (FixedPairListLambda hybrid bonds;
ref: reaction_setup.py:444-451).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import tables
from .spec import SimSpec
from .state import TermTable

_sg = jax.lax.stop_gradient


def table_energy_st(ef, r0, dr, idx, r):
    """Table energy whose gradient wrt r is -F from the force column."""
    e, f = tables.interpolate(ef, r0, dr, idx, r)
    return _sg(e) + _sg(f) * (_sg(r) - r)


def _min_image(dr, box):
    return dr - box * jnp.round(dr / box)


def _safe_vec(dr, valid, axis_unit):
    """Replace invalid rows' displacement with a unit vector.

    Padding rows index particle 0 for every slot, giving zero-length
    displacements whose derivatives are inf/nan; ``jnp.where`` on the energy
    masks the value but not the cotangent (nan * 0 = nan in reverse mode), so
    the geometry itself must be made safe before any division.
    """
    unit = jnp.zeros((1, 3), dr.dtype).at[0, axis_unit].set(1.0)
    return jnp.where(valid[:, None], dr, unit)


def _types(*rows):
    """Type ids from channel 3 of packed [x, y, z, type] gather rows.

    Small ints are exact in f32; the type rides the 16-byte row gather for
    free (the gather wall is flat in row width up to 16 bytes), replacing a
    separate type_id[...] element gather per term index.  stop_gradient
    keeps the dead channel out of the AD graph.
    """
    return tuple(_sg(r[:, 3]).astype(jnp.int32) for r in rows)


def _resolve(table: TermTable, gathered_func, gathered_par):
    """Per-row potential: typelookup rows re-resolve by the CURRENT type
    signature (the TopologyManager discipline for dynamic types); a lookup
    MISS (func 0 — e.g. a type combination with no [bondtypes] entry after
    a reaction changed a particle's type) falls back to the row's static
    potential instead of silently zeroing the bond — in the reference,
    terms keep their original FixedPairList potential unless a registered
    entry replaces it, and a forceless bond lets the excluded pair collapse
    to r=0 (observed: f32 cancellation blow-up in the cell-tile path)."""
    use_lut = table.typelookup & (gathered_func > 0)
    func = jnp.where(use_lut, gathered_func, table.func)
    par = jnp.where(use_lut[:, None], gathered_par, table.params)
    return func, par


def bond_energies(spec: SimSpec, bond_funcs, rows4, box, bonds: TermTable):
    valid = bonds.idx[:, 0] >= 0
    pi, pj = rows4[:, 0], rows4[:, 1]
    ti, tj = _types(pi, pj)
    func, par = _resolve(bonds, spec.bond_func_tt[ti, tj], spec.bond_par_tt[ti, tj])
    dr = _safe_vec(_min_image(pi[:, :3] - pj[:, :3], box), valid, 0)
    r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))

    out = {}
    for f in bond_funcs:
        m = valid & (func == f)
        if f == 1:
            e = par[:, 0] * (r - par[:, 1]) ** 2
        elif f == 7:
            x = (r - par[:, 1]) / jnp.maximum(par[:, 2], 1e-30)
            arg = jnp.clip(1.0 - x * x, 1e-6, 1.0)
            e = -0.5 * par[:, 0] * par[:, 2] ** 2 * jnp.log(arg)
        elif f == 8:
            e = table_energy_st(spec.bond_ef, spec.bond_r0, spec.bond_dr,
                                par[:, 0].astype(jnp.int32), r)
        elif f == 9:
            x = (r - par[:, 1]) / jnp.maximum(par[:, 2], 1e-30)
            arg = jnp.clip(1.0 - x * x, 1e-6, 1.0)
            fene = -0.5 * par[:, 0] * par[:, 2] ** 2 * jnp.log(arg)
            sig, eps = par[:, 3], par[:, 4]
            rc_wca = 2.0 ** (1.0 / 6.0) * sig
            s6 = (sig / jnp.minimum(r, rc_wca)) ** 6
            lj = 4.0 * eps * (s6 * s6 - s6) + eps
            e = fene + jnp.where(r < rc_wca, lj, 0.0)
        else:
            raise NotImplementedError("bond func %d" % f)
        out["bond_f%d" % f] = jnp.sum(jnp.where(m, e * bonds.lam, 0.0))
    return out


def angle_energies(spec: SimSpec, angle_funcs, rows4, box, angles: TermTable):
    valid = angles.idx[:, 0] >= 0
    pi, pj, pk = rows4[:, 0], rows4[:, 1], rows4[:, 2]
    ti, tj, tk = _types(pi, pj, pk)
    func, par = _resolve(angles, spec.angle_func_tt[ti, tj, tk], spec.angle_par_tt[ti, tj, tk])
    rij = _safe_vec(_min_image(pi[:, :3] - pj[:, :3], box), valid, 0)
    rkj = _safe_vec(_min_image(pk[:, :3] - pj[:, :3], box), valid, 1)
    nij = jnp.sqrt(jnp.sum(rij * rij, -1))
    nkj = jnp.sqrt(jnp.sum(rkj * rkj, -1))
    c = jnp.clip(jnp.sum(rij * rkj, -1) / (nij * nkj), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(c)

    out = {}
    for f in angle_funcs:
        m = valid & (func == f)
        if f == 1:
            e = par[:, 0] * (theta - par[:, 1]) ** 2
        elif f == 8:
            e = table_energy_st(spec.angle_ef, spec.angle_r0, spec.angle_dr,
                                par[:, 0].astype(jnp.int32), theta)
        elif f == 11:
            e = par[:, 0] * (1.0 + jnp.cos(theta - par[:, 1]))
        else:
            raise NotImplementedError("angle func %d" % f)
        out["angle_f%d" % f] = jnp.sum(jnp.where(m, e * angles.lam, 0.0))
    return out


def dihedral_energies(spec: SimSpec, dih_funcs, rows4, box,
                      dihedrals: TermTable):
    valid = dihedrals.idx[:, 0] >= 0
    pi, pj, pk, pl = rows4[:, 0], rows4[:, 1], rows4[:, 2], rows4[:, 3]
    ti, tj, tk, tl = _types(pi, pj, pk, pl)
    func, par = _resolve(dihedrals, spec.dih_func_tt[ti, tj, tk, tl],
                         spec.dih_par_tt[ti, tj, tk, tl])
    b1 = _safe_vec(_min_image(pj[:, :3] - pi[:, :3], box), valid, 0)
    b2 = _safe_vec(_min_image(pk[:, :3] - pj[:, :3], box), valid, 1)
    b3 = _safe_vec(_min_image(pl[:, :3] - pk[:, :3], box), valid, 2)
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / jnp.sqrt(jnp.sum(b2 * b2, -1, keepdims=True) + 1e-30)
    sin_phi = jnp.sum(jnp.cross(n1, n2) * b2n, -1)
    cos_phi = jnp.sum(n1 * n2, -1)
    phi = jnp.arctan2(sin_phi, cos_phi + 1e-30)

    out = {}
    for f in dih_funcs:
        m = valid & (func == f)
        if f == 1:
            e = par[:, 0] * (1.0 + jnp.cos(par[:, 2] * phi - par[:, 1]))
        elif f == 3:
            cpsi = jnp.cos(phi - jnp.pi)
            e = jnp.zeros_like(phi)
            acc = jnp.ones_like(phi)
            for n in range(6):
                e = e + par[:, n] * acc
                acc = acc * cpsi
        elif f == 8:
            e = table_energy_st(spec.dih_ef, spec.dih_r0, spec.dih_dr,
                                par[:, 0].astype(jnp.int32), phi)
        elif f == 12:
            dphi = phi - par[:, 1]
            dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))
            e = par[:, 0] * dphi**2
        else:
            raise NotImplementedError("dihedral func %d" % f)
        out["dihedral_f%d" % f] = jnp.sum(jnp.where(m, e * dihedrals.lam, 0.0))
    return out


def pair14_energies(spec: SimSpec, rows4, box, q, pairs14: TermTable):
    """1-4 LJ (fudged) + truncated Coulomb pairs (ref: gromacs_topology.py:1314-1411).

    Entry params: [sigma, epsilon*fudgeLJ, cutoff^2, shift]; type-lookup rows
    combine from per-type LJ tables at evaluation time.
    """
    i, j = pairs14.idx[:, 0], pairs14.idx[:, 1]
    valid = i >= 0
    i, j = jnp.maximum(i, 0), jnp.maximum(j, 0)
    par = pairs14.params
    dr = _safe_vec(_min_image(rows4[:, 0][:, :3] - rows4[:, 1][:, :3], box),
                   valid, 0)
    r2 = jnp.sum(dr * dr, -1)
    m = valid & (r2 < par[:, 2])
    s2 = par[:, 0] ** 2 / r2
    s6 = s2 * s2 * s2
    e_lj = jnp.where(m, 4.0 * par[:, 1] * (s6 * s6 - s6) - par[:, 3], 0.0)
    qq_m = valid & (r2 < spec.qq_cutoff2) & (spec.qq_prefactor > 0.0)
    e_qq = jnp.where(qq_m, spec.qq_prefactor * q[i] * q[j] / jnp.sqrt(r2), 0.0)
    return {"lj14": jnp.sum(e_lj), "coulomb14": jnp.sum(e_qq)}


def _merge_add(out, terms):
    for k, v in terms.items():
        out[k] = out[k] + v if k in out else v
    return out


def bonded_energy_terms(spec: SimSpec, cfg, pos, box, type_id, q,
                        bonds, angles, dihedrals, pairs14, dense=None):
    """All bonded energy terms as a dict of scalars.

    ``dense``: (bonds_dense, bonds_irr, angles_dense, angles_irr) when
    ``cfg.bonded_dense`` — the chain terms then evaluate on ROLLED planes
    (endpoint k = pos rolled up by k; slot = base id) with no gather and
    no scatter in the AD transpose, and only the small irregular tables
    ride the gather path (bonded_dense.py; the 100k scatter wall is
    ~5 ms, TPU_NUMBERS_r04.md "Bonded-pass anatomy")."""
    out = {}
    # packed [x, y, z, type] rows (one 16-byte-row gather per term index
    # instead of a pos row gather + a type element gather), with EVERY
    # family's indices concatenated into a single gather: the reverse-mode
    # cotangent then accumulates through ONE scatter-add instead of one per
    # endpoint per family (scatters serialize on v5e)
    pos4 = jnp.concatenate(
        [pos, _sg(type_id.astype(pos.dtype))[:, None]], axis=-1)
    use_dense = cfg.bonded_dense and dense is not None
    if use_dense:
        from .bonded_dense import roll_rows

        bonds_dense, bonds_irr, angles_dense, angles_irr = dense
        if cfg.bond_funcs:
            _merge_add(out, bond_energies(spec, cfg.bond_funcs,
                                          roll_rows(pos4, 2), box,
                                          bonds_dense))
        if cfg.angle_funcs:
            _merge_add(out, angle_energies(spec, cfg.angle_funcs,
                                           roll_rows(pos4, 3), box,
                                           angles_dense))
        bonds, angles = bonds_irr, angles_irr
    segs = []
    if cfg.bond_funcs:
        segs.append(("bonds", bonds.idx))
    if cfg.angle_funcs:
        segs.append(("angles", angles.idx))
    if cfg.dihedral_funcs:
        segs.append(("dihedrals", dihedrals.idx))
    if cfg.pair14_cap:
        segs.append(("pairs14", pairs14.idx))
    if not segs:
        return out
    idx_all = jnp.concatenate(
        [jnp.maximum(idx, 0).reshape(-1) for _, idx in segs])
    rows_all = pos4[idx_all]
    parts = {}
    off = 0
    for name, idx in segs:
        t, k = idx.shape
        parts[name] = rows_all[off:off + t * k].reshape(t, k, 4)
        off += t * k
    if cfg.bond_funcs:
        _merge_add(out, bond_energies(spec, cfg.bond_funcs, parts["bonds"],
                                      box, bonds))
    if cfg.angle_funcs:
        _merge_add(out, angle_energies(spec, cfg.angle_funcs,
                                       parts["angles"], box, angles))
    if cfg.dihedral_funcs:
        out.update(dihedral_energies(spec, cfg.dihedral_funcs,
                                     parts["dihedrals"], box, dihedrals))
    if cfg.pair14_cap:
        out.update(pair14_energies(spec, parts["pairs14"], box, q, pairs14))
    return out


def bonded_forces(spec: SimSpec, cfg, pos, box, type_id, q,
                  bonds, angles, dihedrals, pairs14, dense=None):
    """Forces = -grad(total bonded energy); returns (force, energy dict)."""

    def total(p):
        terms = bonded_energy_terms(spec, cfg, p, box, type_id, q,
                                    bonds, angles, dihedrals, pairs14,
                                    dense=dense)
        tot = jnp.asarray(0.0, p.dtype)
        for v in terms.values():
            tot = tot + v
        return tot, terms

    (_, terms), grad = jax.value_and_grad(total, has_aux=True)(pos)
    return -grad, terms
