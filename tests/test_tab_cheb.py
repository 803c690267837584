"""Chebyshev-compressed tabulated pairs on the pallas fast path.

The reference serves tabulated nonbonded pairs by table interpolation
(ref: gromacs_topology.py:551-665, funcs 8-17); tab_cheb.py compresses
each table to a validated two-piece Chebyshev fit so pure-tabulated
systems ride the colt2 cell-tile kernel instead of the gather-bound XLA
row path.  Contract under test:

  - the build selects the path only when every used table passes the fit
    (smooth tables in, rough IBI-style tables back to the exact row path);
  - forces/energies/virial agree with the XLA row path to fit tolerance;
  - excluded (bonded) pairs cancel exactly: no spurious bond-range force.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import testsystems
from chemlab_tpu.engine import integrate, neighbor, runner


@pytest.fixture(scope="module")
def tab_pair():
    built_x, _, _ = testsystems.build_tabulated_melt(
        n_mols=100, reactive=False, seed=7, use_pallas=False)
    built_p, _, _ = testsystems.build_tabulated_melt(
        n_mols=100, reactive=False, seed=7, use_pallas=True)
    st = runner.initial_forces(built_x.spec, built_x.cfg, built_x.state)
    st = testsystems.warmup(built_x, st, steps=100)
    return built_x, built_p, st


def _transplant(built_p, st):
    """Move a warmed row-path state into the pallas build's geometry."""
    spec, cfg = built_p.spec, built_p.cfg
    rc_skin = float(jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin)
    nbr_p = neighbor.build_neighbor_state(
        st.pos, st.box, st.active, st.excl, rc_skin,
        dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
        max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap)
    return dataclasses.replace(st, nbr=nbr_p)


def test_build_selects_cheb_path(tab_pair):
    built_x, built_p, _ = tab_pair
    assert not built_x.cfg.use_pallas
    assert not built_x.cfg.tab_cheb
    assert built_p.cfg.use_pallas
    assert built_p.cfg.tab_cheb
    assert built_p.cfg.cheb_kw >= 2
    assert built_p.spec.cheb_wall_g is not None
    assert built_p.spec.cheb_wall_g.shape[1] == built_p.cfg.cheb_kw


def test_forces_match_row_path(tab_pair):
    built_x, built_p, st = tab_pair
    st_p = _transplant(built_p, st)
    f_x, e_x, _ = integrate.compute_forces(built_x.spec, built_x.cfg, st)
    f_p, e_p, _ = integrate.compute_forces(built_p.spec, built_p.cfg, st_p)
    fx = np.asarray(f_x)
    fp = np.asarray(f_p)
    scale = max(float(np.abs(fx).max()), 1.0)
    assert np.max(np.abs(fx - fp)) / scale < 3e-3, \
        np.max(np.abs(fx - fp)) / scale
    # pure-tab system: the whole pair energy lives in the lj-tab term
    assert float(e_p["lj"]) == 0.0
    assert float(e_p["lj-tab"]) == pytest.approx(float(e_x["lj-tab"]),
                                                 rel=5e-3)


def test_virial_matches_row_path(tab_pair):
    built_x, built_p, st = tab_pair
    st_p = _transplant(built_p, st)
    p_x = float(integrate.virial_pressure(built_x.spec, built_x.cfg, st))
    p_p = float(integrate.virial_pressure(built_p.spec, built_p.cfg, st_p))
    assert p_p == pytest.approx(p_x, rel=1e-2, abs=5e-3), (p_x, p_p)


def test_excluded_pairs_cancel(tab_pair):
    """Bonded (excluded) pairs sit in the wall region; the kernel's
    contribution and the XLA correction must run the token-identical cheb
    sequence, so the net pair force on a bonded pair's axis has no
    wall-scale residue."""
    from chemlab_tpu.engine import pallas_pair

    _, built_p, st = tab_pair
    spec, cfg = built_p.spec, built_p.cfg
    st_p = _transplant(built_p, st)
    f_all, _, _, _ = pallas_pair.cell_pair_forces(
        st_p.pos, st_p.type_id, st_p.active, st_p.box, st_p.nbr.buckets,
        cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap, interpret=True,
        slot_of=st_p.nbr.slot_of, cheb_kw=cfg.cheb_kw, cheb_ko=cfg.cheb_ko)
    f_ex, _, _, _ = pallas_pair.excluded_pair_correction(
        spec, cfg.n_types, st_p.pos, st_p.box, st_p.type_id, st_p.excl,
        active=st_p.active, cheb=(cfg.cheb_kw, cfg.cheb_ko))
    # recompute the correction with the 4096-bin interpolation instead: the
    # DIFFERENCE between the two corrections bounds what the cheb-vs-exact
    # mismatch would have injected into bonded pairs had the sequences not
    # been token-identical; the cancellation test is that kernel-minus-cheb
    # correction carries no wall-scale term
    f_ex_exact, _, _, _ = pallas_pair.excluded_pair_correction(
        spec, cfg.n_types, st_p.pos, st_p.box, st_p.type_id, st_p.excl,
        active=st_p.active, has_tab=True)
    net = np.asarray(f_all - f_ex)
    scale = max(float(np.abs(net).max()), 1.0)
    # excluded pairs at r ~ 0.97 sigma would see wall |F| ~ 1e2-1e3; the
    # net force must stay at melt scale
    assert scale < 1e3
    # and the cheb correction itself tracks the exact one to fit tolerance
    d = np.abs(np.asarray(f_ex) - np.asarray(f_ex_exact))
    assert d.max() / max(float(np.abs(np.asarray(f_ex_exact)).max()), 1.0) \
        < 3e-3


def test_rough_tables_fall_back_to_row_path():
    """IBI-style rough tables must fail fit validation and keep the exact
    XLA row path (tab_cheb module docstring contract)."""
    built, _, _ = testsystems.build_tabulated_melt(
        n_mols=100, reactive=False, seed=3, rough=0.05, use_pallas=True)
    assert not built.cfg.tab_cheb
    assert not built.cfg.use_pallas


def test_md_step_matches_row_path(tab_pair):
    built_x, built_p, st = tab_pair
    st_p = _transplant(built_p, st)
    a = integrate.md_step(built_x.spec, built_x.cfg, st)
    b = integrate.md_step(built_p.spec, built_p.cfg, st_p)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel),
                               atol=5e-3)


def test_table_scalar_mode_matches_plane_mode(tab_pair):
    """The table-scalar kernel mode (cfg.cheb_ntab > 0: SMEM fit scalars +
    one table-id plane) must reproduce the coefficient-plane mode — the
    values are the same f32 scalars, only the lookup mechanism differs."""
    _, built_p, st = tab_pair
    assert built_p.cfg.cheb_ntab > 0, "test melt should take scalar mode"
    st_p = _transplant(built_p, st)
    cfg_pl = dataclasses.replace(built_p.cfg, cheb_ntab=0)
    f_s, e_s, _ = integrate.compute_forces(built_p.spec, built_p.cfg, st_p)
    f_pl, e_pl, _ = integrate.compute_forces(built_p.spec, cfg_pl, st_p)
    fs = np.asarray(f_s)
    fp = np.asarray(f_pl)
    scale = max(float(np.abs(fp).max()), 1.0)
    assert np.max(np.abs(fs - fp)) / scale < 1e-6, \
        np.max(np.abs(fs - fp)) / scale
    assert float(e_s["lj-tab"]) == pytest.approx(float(e_pl["lj-tab"]),
                                                 rel=1e-6)


def test_mixed_tables_fast_path_matches_row_path():
    """func-10 (conversion-mixed) + func-12 (static-mixed) pairs on the
    table-scalar fast path: x*T_a + (1-x)*T_b per pair must match the XLA
    row path's mixing (ref: gromacs_topology.py:574-583,756-790)."""
    built_x, _, _ = testsystems.build_mixed_tab_melt(
        n_mols=100, seed=11, use_pallas=False)
    built_p, _, _ = testsystems.build_mixed_tab_melt(
        n_mols=100, seed=11, use_pallas=True)
    assert not built_x.cfg.use_pallas
    assert built_p.cfg.use_pallas and built_p.cfg.tab_cheb
    assert built_p.cfg.cheb_ntab > 0 and built_p.cfg.cheb_mix

    st = runner.initial_forces(built_x.spec, built_x.cfg, built_x.state)
    st = testsystems.warmup(built_x, st, steps=100)
    st_p = _transplant(built_p, st)
    f_x, e_x, _ = integrate.compute_forces(built_x.spec, built_x.cfg, st)
    f_p, e_p, _ = integrate.compute_forces(built_p.spec, built_p.cfg, st_p)
    fx = np.asarray(f_x)
    fp = np.asarray(f_p)
    scale = max(float(np.abs(fx).max()), 1.0)
    assert np.max(np.abs(fx - fp)) / scale < 3e-3, \
        np.max(np.abs(fx - fp)) / scale
    assert float(e_p["lj-tab"]) == pytest.approx(float(e_x["lj-tab"]),
                                                 rel=5e-3)
    # virial agrees too (NPT on the mixed fast path)
    p_x = float(integrate.virial_pressure(built_x.spec, built_x.cfg, st))
    p_p = float(integrate.virial_pressure(built_p.spec, built_p.cfg, st_p))
    assert p_p == pytest.approx(p_x, rel=1e-2, abs=5e-3), (p_x, p_p)
