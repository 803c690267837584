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
    f_all, e_lj, e_tab = pallas_pair.cell_pair_forces(
        st.pos, st.type_id, st.active, st.box, st.nbr.buckets,
        spec.cell_stencil, spec, cfg.n_types, cfg.cell_cap, interpret=True)
    f_ex, e_lj_ex, e_tab_ex = pallas_pair.excluded_pair_correction(
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


def test_tabulated_matches_xla(melt):
    """Flip the MA-ML pair to a tabulated potential; both paths read the
    same spec, so the kernel's table branch is exercised directly."""
    built, st = melt
    spec, cfg = built.spec, built.cfg
    # build a table: E = LJ(sig=1, eps=0.5) shifted at rc=2.5
    r = np.linspace(0.75, 2.5, 600)
    eps, rc = 0.5, 2.5
    s6 = (1.0 / r) ** 6
    shift = 4 * eps * ((1 / rc) ** 12 - (1 / rc) ** 6)
    e = 4 * eps * (s6 * s6 - s6) - shift
    f = 4 * eps * (12 * s6 * s6 - 6 * s6) / r
    from chemlab_tpu.engine import tables
    tb = tables.TableStackBuilder(2048)
    tb.add("<zero>", np.array([1e-3, 10.0]), np.zeros(2), np.zeros(2))
    tid = tb.add("tab_test", r, e, f)
    stack = tb.build()
    t_ma, t_ml = 0, 1
    pair_kind = np.array(spec.pair_kind)
    pair_tab = np.array(spec.pair_tab_a)
    for p in (t_ma * cfg.n_types + t_ml, t_ml * cfg.n_types + t_ma):
        pair_kind[p] = PAIR_TAB
        pair_tab[p] = tid
    spec2 = dataclasses.replace(
        spec, pair_kind=jnp.asarray(pair_kind), pair_tab_a=jnp.asarray(pair_tab),
        pair_tab_b=jnp.asarray(pair_tab), nb_ef=jnp.asarray(stack.ef),
        nb_r0=jnp.asarray(stack.r0), nb_dr=jnp.asarray(stack.dr))

    f_ref, e_ref = _xla_pair(spec2, cfg, st)
    f_pal, e_lj, e_tab = _pallas_pair(spec2, cfg, st)
    assert e_tab == pytest.approx(float(e_ref["lj-tab"]), rel=1e-4, abs=1e-3)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               atol=5e-3, rtol=1e-3)


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
