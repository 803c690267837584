"""Dense-static bonded operands: derivation + rolled-plane evaluation.

The dense path must reproduce the canonical gather-path energies and
forces exactly (same functional forms, different data movement):
chain bonds/angles evaluate on rolled planes, reaction-style arbitrary
pairs through the compacted irregular table.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import bonded_dense, bonded_forces, runner


def _setup():
    built, systop, _ = testsystems.build_melt(n_mols=40, reactive=True)
    st = runner.initial_forces(built.spec, built.cfg, built.state)
    st = testsystems.warmup(built, st, steps=50)
    return built, st


def _append_rows(table, rows, func=1, params=(25.0, 1.1, 0, 0, 0, 0),
                 lam=None, group=None):
    cur = int(table.count)
    idx = table.idx
    fn = table.func
    par = table.params
    lm = table.lam
    gr = table.group
    for k, r in enumerate(rows):
        idx = idx.at[cur + k].set(jnp.asarray(r, jnp.int32))
        fn = fn.at[cur + k].set(func)
        par = par.at[cur + k].set(jnp.asarray(params, jnp.float32))
        if lam is not None:
            lm = lm.at[cur + k].set(lam)
        if group is not None:
            gr = gr.at[cur + k].set(group)
    return dataclasses.replace(table, idx=idx, func=fn, params=par, lam=lm,
                               group=gr,
                               count=jnp.asarray(cur + len(rows), jnp.int32))


def test_bond_split_and_equivalence():
    built, st = _setup()
    spec, cfg = built.spec, built.cfg
    n = st.pos.shape[0]

    # add reaction-style bonds: two arbitrary pairs (irregular) and one
    # aligned crosslink across the inter-molecule gap (2,3) — aligned but
    # not a static chain bond, so it must claim a dense slot
    bonds = _append_rows(st.bonds, [(0, 17), (31, 5), (2, 3)],
                         lam=0.25, group=3)
    n_valid = int(jnp.sum(bonds.idx[:, 0] >= 0))

    dense, irr, ovf = jax.jit(
        bonded_dense.derive_aligned, static_argnums=(1, 2))(bonds, n, 128)
    assert not bool(ovf)
    nd = int(jnp.sum(dense.idx[:, 0] >= 0))
    ni = int(jnp.sum(irr.idx[:, 0] >= 0))
    assert nd + ni == n_valid
    # the chain bonds (i, i+1) all went dense — including the appended
    # (2, 3); the two arbitrary pairs are irregular
    assert ni == 2
    # slot = base id for every dense row
    d_idx = np.asarray(dense.idx)
    dv = d_idx[:, 0] >= 0
    assert (d_idx[dv, 0] == np.nonzero(dv)[0]).all()
    assert (d_idx[dv, 1] == np.nonzero(dv)[0] + 1).all()
    # irregular copies carry lambda/group through
    iv = np.asarray(irr.idx[:, 0] >= 0)
    assert set(np.asarray(irr.lam)[iv].round(2)) == {0.25}
    assert set(np.asarray(irr.group)[iv]) == {3}

    box = st.box
    pos4 = jnp.concatenate(
        [st.pos, st.type_id.astype(st.pos.dtype)[:, None]], axis=-1)

    def e_canonical(pos):
        p4 = jnp.concatenate(
            [pos, st.type_id.astype(pos.dtype)[:, None]], axis=-1)
        rows = p4[jnp.maximum(bonds.idx, 0).reshape(-1)].reshape(
            bonds.capacity, 2, 4)
        return sum(bonded_forces.bond_energies(
            spec, cfg.bond_funcs, rows, box, bonds).values())

    def e_dense(pos):
        p4 = jnp.concatenate(
            [pos, st.type_id.astype(pos.dtype)[:, None]], axis=-1)
        rows_d = bonded_dense.roll_rows(p4, 2)
        e = sum(bonded_forces.bond_energies(
            spec, cfg.bond_funcs, rows_d, box, dense).values())
        rows_i = p4[jnp.maximum(irr.idx, 0).reshape(-1)].reshape(
            irr.capacity, 2, 4)
        e = e + sum(bonded_forces.bond_energies(
            spec, cfg.bond_funcs, rows_i, box, irr).values())
        return e

    e0 = float(jax.jit(e_canonical)(st.pos))
    e1 = float(jax.jit(e_dense)(st.pos))
    assert abs(e1 - e0) <= 1e-5 * max(abs(e0), 1.0)

    f0 = jax.jit(jax.grad(e_canonical))(st.pos)
    f1 = jax.jit(jax.grad(e_dense))(st.pos)
    err = float(jnp.max(jnp.abs(f1 - f0)))
    scale = float(jnp.max(jnp.abs(f0)))
    assert err <= 1e-4 * max(scale, 1.0)


def test_angle_split_and_equivalence():
    built, st = _setup()
    spec, cfg = built.spec, built.cfg
    n = st.pos.shape[0]

    # one irregular angle (reaction-created at a crosslink)
    angles = _append_rows(st.angles, [(2, 40, 77)],
                          params=(10.0, 1.9, 0, 0, 0, 0))
    n_valid = int(jnp.sum(angles.idx[:, 0] >= 0))

    dense, irr, ovf = jax.jit(
        bonded_dense.derive_aligned, static_argnums=(1, 2))(angles, n, 128)
    assert not bool(ovf)
    nd = int(jnp.sum(dense.idx[:, 0] >= 0))
    ni = int(jnp.sum(irr.idx[:, 0] >= 0))
    assert nd + ni == n_valid and ni == 1

    box = st.box

    def e_canonical(pos):
        p4 = jnp.concatenate(
            [pos, st.type_id.astype(pos.dtype)[:, None]], axis=-1)
        rows = p4[jnp.maximum(angles.idx, 0).reshape(-1)].reshape(
            angles.capacity, 3, 4)
        return sum(bonded_forces.angle_energies(
            spec, cfg.angle_funcs, rows, box, angles).values())

    def e_dense(pos):
        p4 = jnp.concatenate(
            [pos, st.type_id.astype(pos.dtype)[:, None]], axis=-1)
        e = sum(bonded_forces.angle_energies(
            spec, cfg.angle_funcs, bonded_dense.roll_rows(p4, 3), box,
            dense).values())
        rows_i = p4[jnp.maximum(irr.idx, 0).reshape(-1)].reshape(
            irr.capacity, 3, 4)
        return e + sum(bonded_forces.angle_energies(
            spec, cfg.angle_funcs, rows_i, box, irr).values())

    e0 = float(jax.jit(e_canonical)(st.pos))
    e1 = float(jax.jit(e_dense)(st.pos))
    assert abs(e1 - e0) <= 1e-5 * max(abs(e0), 1.0)

    f0 = jax.jit(jax.grad(e_canonical))(st.pos)
    f1 = jax.jit(jax.grad(e_dense))(st.pos)
    err = float(jnp.max(jnp.abs(f1 - f0)))
    assert err <= 1e-4 * max(float(jnp.max(jnp.abs(f0))), 1.0)


def test_duplicate_base_and_overflow():
    built, st = _setup()
    n = st.pos.shape[0]
    # duplicate aligned bond: second copy must fall to the irregular table
    bonds = _append_rows(st.bonds, [(3, 4)])
    dense, irr, ovf = bonded_dense.derive_aligned(bonds, n, 128)
    assert not bool(ovf)
    assert int(jnp.sum(irr.idx[:, 0] >= 0)) == 1
    assert tuple(np.asarray(irr.idx[0])) == (3, 4)
    # an irregular remainder larger than irr_cap flags overflow
    rows = [(0, k) for k in range(2, 12)]
    bonds2 = _append_rows(st.bonds, rows)
    _, _, ovf2 = bonded_dense.derive_aligned(bonds2, n, 8)
    assert bool(ovf2)


def test_wired_reactive_run_stays_in_lockstep():
    """cfg.bonded_dense end-to-end: build with the flag, run through
    reaction intervals (events append irregular bonds + angles, hybrid
    lambdas ramp), then assert (a) step-0 forces match a flag-off build
    exactly, (b) after the run the dense+irregular evaluation still
    reproduces the canonical gather evaluation on the SAME state — i.e.
    the derived copies tracked every mutation."""
    import os

    from chemlab_tpu.engine import build as build_mod
    from chemlab_tpu.engine import integrate

    built_d, systop, _ = testsystems.build_melt(n_mols=120, reactive=True,
                                                bonded_dense=True)
    built_g, _, _ = testsystems.build_melt(n_mols=120, reactive=True,
                                           bonded_dense=False)
    assert built_d.cfg.bonded_dense and not built_g.cfg.bonded_dense
    assert built_d.state.bonds_dense is not None
    assert built_g.state.bonds_dense is None

    # (a) step-0 force agreement between the two paths
    f_d, e_d, _ = integrate.compute_forces(built_d.spec, built_d.cfg,
                                           built_d.state)
    f_g, e_g, _ = integrate.compute_forces(built_g.spec, built_g.cfg,
                                           built_g.state)
    scale = max(float(jnp.max(jnp.abs(f_g))), 1.0)
    assert float(jnp.max(jnp.abs(f_d - f_g))) <= 1e-4 * scale
    for k in e_g:
        assert abs(float(e_d[k]) - float(e_g[k])) <= 1e-4 * max(
            abs(float(e_g[k])), 1.0)

    # (b) run with reactions; dense bookkeeping must survive events+ramps
    spec, cfg = built_d.spec, built_d.cfg
    st = runner.initial_forces(spec, cfg, built_d.state)
    st = testsystems.warmup(built_d, st, steps=60)
    st = testsystems.activate_initiators(built_d, systop, st, n=6)
    st = runner.run_block(spec, cfg, st, 250)
    m = runner.measure(spec, cfg, st)
    assert np.isfinite(float(m["epot"]))
    assert not bool(m["overflow"])

    n_bonds = int(jnp.sum(st.bonds.valid))
    nd = int(jnp.sum(st.bonds_dense.idx[:, 0] >= 0))
    ni = int(jnp.sum(st.bonds_irr.idx[:, 0] >= 0))
    assert nd + ni == n_bonds

    # canonical-vs-dense evaluation on the SAME post-run state
    def e_total(use_dense):
        f, terms = bonded_forces.bonded_forces(
            spec, cfg, st.pos, st.box, st.type_id, st.q,
            st.bonds, st.angles, st.dihedrals, st.pairs14,
            dense=(st.bonds_dense, st.bonds_irr, st.angles_dense,
                   st.angles_irr) if use_dense else None)
        return f, sum(terms.values())

    f1, e1 = e_total(True)
    # force the gather path by evaluating with a flag-off cfg clone
    import dataclasses as dc
    cfg_off = dc.replace(cfg, bonded_dense=False)
    f0, terms0 = bonded_forces.bonded_forces(
        spec, cfg_off, st.pos, st.box, st.type_id, st.q,
        st.bonds, st.angles, st.dihedrals, st.pairs14)
    e0 = sum(terms0.values())
    assert abs(float(e1) - float(e0)) <= 1e-5 * max(abs(float(e0)), 1.0)
    scale = max(float(jnp.max(jnp.abs(f0))), 1.0)
    assert float(jnp.max(jnp.abs(f1 - f0))) <= 1e-4 * scale
