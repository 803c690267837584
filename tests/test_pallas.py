"""Pallas cell-tile pair kernel vs the XLA reference path (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import testsystems
from chemlab_tpu.engine import (build, neighbor, pair_forces, pallas_pair,
                                runner)
from chemlab_tpu.engine.spec import PAIR_TAB


@pytest.fixture(scope="module")
def melt():
    built, systop, _ = testsystems.build_melt(n_mols=40, density=0.3,
                                              reactive=False, seed=3)
    st = runner.initial_forces(built.spec, built.cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)
    return built, st


def _xla_pair(spec, cfg, st):
    obs_x = jnp.zeros(spec.obs_total.shape[0])
    ta, tb, mx = pair_forces.resolve_pair_tables(spec, obs_x, 0)
    return pair_forces.pair_forces(
        spec, cfg.n_types, st.pos, st.box, st.type_id, st.q, st.lam,
        st.nbr.idx, st.nbr.excl_mask, ta, tb, mx)


def _pallas_pair(spec, cfg, st):
    f_all, e_lj, e_tab, _ = pallas_pair.cell_pair_forces(
        st.pos, st.type_id, st.active, st.box, st.nbr.buckets,
        cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap, interpret=True)
    f_ex, e_lj_ex, e_tab_ex, _ = pallas_pair.excluded_pair_correction(
        spec, cfg.n_types, st.pos, st.box, st.type_id, st.excl)
    return f_all - f_ex, float(e_lj - e_lj_ex), float(e_tab - e_tab_ex)


def test_lj_matches_xla(melt):
    built, st = melt
    spec, cfg = built.spec, built.cfg
    f_ref, e_ref = _xla_pair(spec, cfg, st)
    f_pal, e_lj, e_tab = _pallas_pair(spec, cfg, st)
    assert e_lj == pytest.approx(float(e_ref["lj"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               atol=2e-3, rtol=1e-4)


def test_packet_kernel_matches_cell_kernel(melt):
    """The packet-grid kernel (grid (cell, packet-of-8), occupancy-gated)
    is bit-identical to the per-cell kernel: same tile math, only the row
    scheduling differs."""
    built, st = melt
    spec, cfg = built.spec, built.cfg
    args = (st.pos, st.type_id, st.active, st.box, st.nbr.buckets,
            cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap)
    f_old, e_old, _, _ = pallas_pair.cell_pair_forces(*args,
                                                      interpret=True,
                                                      packets=False)
    # the cell kernel's single spare channel is e XOR w (want_virial)
    _, _, _, w_old = pallas_pair.cell_pair_forces(*args, interpret=True,
                                                  packets=False,
                                                  want_virial=True)
    f_new, e_new, _, w_new = pallas_pair.cell_pair_forces(*args,
                                                          interpret=True,
                                                          packets=True)
    # forces are per-slot and stay bit-identical; e/w sum GROUPING differs
    # (16-byte output rows), so tight rel tolerance instead of bitwise
    assert float(e_old) == pytest.approx(float(e_new), rel=1e-6)
    assert float(w_old) == pytest.approx(float(w_new), rel=1e-6)
    assert np.array_equal(np.asarray(f_old), np.asarray(f_new))
    # uniform-LJ shortcut too
    f_u, e_u, _, w_u = pallas_pair.cell_pair_forces(*args, interpret=True,
                                                    packets=True,
                                                    uniform_lj=True)
    assert float(e_u) == pytest.approx(float(e_old), rel=1e-6)
    assert float(w_u) == pytest.approx(float(w_old), rel=1e-6)
    assert np.array_equal(np.asarray(f_u), np.asarray(f_old))


def test_column_kernel_matches_cell_kernel(melt):
    """The column-grid kernel (grid (xy-column, z), resident z-column
    operands instead of 27 streamed cell operands per program) is
    bit-identical to the per-cell kernel: same tile math and candidate
    order, only the DMA schedule differs."""
    built, st = melt
    spec, cfg = built.spec, built.cfg
    args = (st.pos, st.type_id, st.active, st.box, st.nbr.buckets,
            cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap)
    f_old, e_old, _, _ = pallas_pair.cell_pair_forces(*args,
                                                      interpret=True,
                                                      packets=False)
    _, _, _, w_old = pallas_pair.cell_pair_forces(*args, interpret=True,
                                                  packets=False,
                                                  want_virial=True)
    f_new, e_new, _, w_new = pallas_pair.cell_pair_forces_columns(
        *args, interpret=True)
    # e/w sum grouping differs (16-byte output rows in the cell kernel)
    assert float(e_old) == pytest.approx(float(e_new), rel=1e-6)
    assert float(w_old) == pytest.approx(float(w_new), rel=1e-6)
    assert np.array_equal(np.asarray(f_old), np.asarray(f_new))
    f_u, e_u, _, w_u = pallas_pair.cell_pair_forces_columns(
        *args, interpret=True, uniform_lj=True)
    assert float(e_u) == pytest.approx(float(e_old), rel=1e-6)
    assert np.array_equal(np.asarray(f_u), np.asarray(f_old))


def test_pallas_virial_matches_strain_derivative(melt):
    """The kernel's pair-virial channel (minus exclusions) + bonded strain
    derivative reproduces the row path's full strain-derivative pressure —
    barostatted runs stay on the fast path."""
    import dataclasses

    from chemlab_tpu.engine import integrate

    built, st = melt
    spec, cfg = built.spec, built.cfg
    p_row = float(integrate.virial_pressure(spec, cfg, st))
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    p_pal = float(integrate.virial_pressure(spec, cfg_p, st))
    assert p_pal == pytest.approx(p_row, rel=2e-3, abs=2e-4), (p_row, p_pal)


def test_tabulated_systems_fall_back_to_xla(melt):
    """The kernel is LJ-only (Mosaic has no in-kernel vector gather for
    table interpolation): systems with tabulated pairs must be rejected by
    the static gate so the build keeps them on the XLA path."""
    built, st = melt
    spec, cfg = built.spec, built.cfg
    pair_kind = np.array(spec.pair_kind)
    assert pallas_pair.supports(None, {
        "pair_kind": pair_kind,
        "pair_caprad": np.array(spec.pair_caprad),
        "pair_lam_scale": np.array(spec.pair_lam_scale),
        "pair_mix_mode": np.array(spec.pair_mix_mode),
        "pair_pps_incr": np.array(spec.pair_pps_incr),
    })
    pair_kind[1] = PAIR_TAB
    assert not pallas_pair.supports(None, {
        "pair_kind": pair_kind,
        "pair_caprad": np.array(spec.pair_caprad),
        "pair_lam_scale": np.array(spec.pair_lam_scale),
        "pair_mix_mode": np.array(spec.pair_mix_mode),
        "pair_pps_incr": np.array(spec.pair_pps_incr),
    })


def test_md_step_with_pallas_path(melt):
    """A full md_step under cfg.use_pallas matches the XLA-path step."""
    built, st = melt
    spec = built.spec
    cfg_x = built.cfg
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    from chemlab_tpu.engine import integrate
    a = integrate.md_step(spec, cfg_x, st)
    b = integrate.md_step(spec, cfg_p, st)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=2e-3)


def test_colt_kernel_matches_cell_kernel():
    """The transpose-once column kernel ('colt') agrees with the per-cell
    kernel to f32 rounding (its per-column partial sums group candidates
    differently, so bitwise equality is not expected), with both the
    slot_of and the legacy scatter epilogues."""
    built, _, _ = testsystems.build_melt(n_mols=100, reactive=False, seed=5)
    st = runner.initial_forces(built.spec, built.cfg, built.state)
    st = testsystems.warmup(built, st, steps=50)
    spec, cfg = built.spec, built.cfg
    if cfg.cell_cap % 8 != 0 or min(int(d) for d in cfg.cell_dims) < 3:
        pytest.skip("colt needs cap%8==0 and a full 27-stencil grid")
    args = (st.pos, st.type_id, st.active, st.box, st.nbr.buckets,
            cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap)
    f_old, e_old, _, _ = pallas_pair.cell_pair_forces(*args,
                                                      interpret=True,
                                                      packets=False)
    _, _, _, w_old = pallas_pair.cell_pair_forces(*args, interpret=True,
                                                  packets=False,
                                                  want_virial=True)
    for so in (st.nbr.slot_of, None):
        f_new, e_new, _, _ = pallas_pair.cell_pair_forces_colt(
            *args, interpret=True, slot_of=so)
        _, _, _, w_new = pallas_pair.cell_pair_forces_colt(
            *args, interpret=True, slot_of=so, want_virial=True)
        assert float(e_new) == pytest.approx(float(e_old), rel=1e-5)
        assert float(w_new) == pytest.approx(float(w_old), rel=1e-5)
        fo = np.asarray(f_old)
        fn = np.asarray(f_new)
        scale = np.maximum(np.abs(fo).max(), 1.0)
        assert np.max(np.abs(fo - fn)) / scale < 1e-5
