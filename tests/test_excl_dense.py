"""Dense-static exclusion correction (engine/excl_dense.py).

The pallas path's excluded-pair subtraction on rolled mask planes must
reproduce the flat-list correction: same per-pair values (shared
_pair_eval), different force-assembly order only.  Ref context: the
reference excludes pairs inside its Verlet list build
(src/gromacs_topology.py:1019-1022 + espressopp VerletList.exclude);
here exclusion is algebraic (all-pairs minus excluded)."""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from chemlab_tpu import testsystems  # noqa: E402
from chemlab_tpu.engine import build as build_mod  # noqa: E402
from chemlab_tpu.engine import excl_dense, integrate, pallas_pair, runner  # noqa: E402


@pytest.fixture(scope="module")
def melt_pair():
    """The same reactive melt built twice: flat vs dense exclusions."""
    flat, systop, _ = testsystems.build_melt(
        n_mols=60, reactive=True, seed=11, use_pallas=True,
        excl_dense=False)
    dense, _, _ = testsystems.build_melt(
        n_mols=60, reactive=True, seed=11, use_pallas=True, excl_dense=True)
    st = runner.initial_forces(flat.spec, flat.cfg, flat.state)
    st = testsystems.warmup(flat, st, steps=100)
    return flat, dense, systop, st


def test_build_enables_feature(melt_pair):
    flat, dense, _, _ = melt_pair
    assert flat.cfg.excl_offsets == ()
    assert flat.state.excl_masks is None
    # trimer melt: exclusions are (b, b+1) and (b, b+2)
    assert dense.cfg.excl_offsets == (1, 2)
    assert dense.cfg.excl_irr_cap >= 128
    assert dense.state.excl_masks is not None
    assert dense.state.excl_masks.shape == (2, dense.cfg.n_pad)


def test_derive_partition_is_exact(melt_pair):
    """masks + irr together hold exactly the valid flat pairs, once."""
    _, dense, _, _ = melt_pair
    st = dense.state
    e = np.asarray(st.excl)
    valid = {tuple(sorted(p)) for p in e[e[:, 0] >= 0].tolist()}
    masks = np.asarray(st.excl_masks)
    got = set()
    for k, off in enumerate(dense.cfg.excl_offsets):
        for b in np.nonzero(masks[k])[0]:
            got.add((int(b), int(b) + off))
    irr = np.asarray(st.excl_irr)
    n_irr = int((irr[:, 0] >= 0).sum())
    for p in irr[irr[:, 0] >= 0].tolist():
        pt = tuple(sorted(p))
        assert pt not in got, "pair in both mask and irr: %s" % (pt,)
        got.add(pt)
    assert got == valid
    # chain melt: nearly everything is offset-covered
    assert n_irr < 0.1 * len(valid)


def test_correction_matches_flat(melt_pair):
    flat, dense, _, st = melt_pair
    spec, cfg = flat.spec, flat.cfg
    # derive operands for the warmed state's exclusion list
    masks, irr, ovf = excl_dense.derive(
        st.excl, st.pos.shape[0], dense.cfg.excl_offsets,
        dense.cfg.excl_irr_cap)
    assert not bool(ovf)
    f_flat, el_flat, et_flat, w_flat = pallas_pair.excluded_pair_correction(
        spec, cfg.n_types, st.pos, st.box, st.type_id, st.excl,
        active=st.active, has_tab=cfg.has_tabulated)
    f_d, el_d, et_d, w_d = excl_dense.correction(
        dense.spec, dense.cfg, st.pos, st.box, st.type_id, masks, irr,
        active=st.active, has_tab=cfg.has_tabulated)
    ff, fd = np.asarray(f_flat), np.asarray(f_d)
    scale = max(float(np.abs(ff).max()), 1.0)
    assert np.max(np.abs(ff - fd)) / scale < 1e-5
    assert float(el_d) == pytest.approx(float(el_flat), rel=1e-5, abs=1e-4)
    assert float(et_d) == pytest.approx(float(et_flat), rel=1e-5, abs=1e-4)
    assert float(w_d) == pytest.approx(float(w_flat), rel=1e-5, abs=1e-4)


def test_engine_forces_match(melt_pair):
    """compute_forces through both cfgs on the same particle state."""
    flat, dense, _, st = melt_pair
    st_d = excl_dense.rederive(dense.cfg, st, create=True)
    f_f, e_f, _ = integrate.compute_forces(flat.spec, flat.cfg, st)
    f_d, e_d, _ = integrate.compute_forces(dense.spec, dense.cfg, st_d)
    ff, fd = np.asarray(f_f), np.asarray(f_d)
    scale = max(float(np.abs(ff).max()), 1.0)
    assert np.max(np.abs(ff - fd)) / scale < 1e-5
    assert float(e_d["lj"]) == pytest.approx(float(e_f["lj"]), rel=1e-4)
    p_f = float(integrate.virial_pressure(flat.spec, flat.cfg, st))
    p_d = float(integrate.virial_pressure(dense.spec, dense.cfg, st_d))
    assert p_d == pytest.approx(p_f, rel=1e-4, abs=1e-4)


def test_reactive_run_keeps_partition(melt_pair):
    """Reactions append cross-molecule exclusions -> the irr remainder;
    the derived partition stays exact after firing intervals."""
    _, dense, systop, st = melt_pair
    spec, cfg = dense.spec, dense.cfg
    st = excl_dense.rederive(cfg, st, create=True)
    st = dataclasses.replace(
        st, force=runner.initial_forces(spec, cfg, st).force)
    st = testsystems.activate_initiators(dense, systop, st, n=6)
    st = runner.run_block(spec, cfg, st, 3 * cfg.reaction_interval)
    mc = runner.measure_cheap(spec, cfg, st)
    # partition invariant: covered + irr == valid flat pairs
    e = np.asarray(st.excl)
    n_valid = int(((e[:, 0] >= 0) & (e[:, 1] >= 0)).sum())
    masks = np.asarray(st.excl_masks)
    irr = np.asarray(st.excl_irr)
    assert int(masks.sum()) + int((irr[:, 0] >= 0).sum()) == n_valid
    assert "n_excl_irr" in mc
    assert not bool(mc["overflow"])


def test_cap_growth_keeps_operands(melt_pair):
    """apply_term_caps excl growth re-derives and grows irr in lockstep."""
    _, dense, _, st = melt_pair
    cfg = dense.cfg
    st = excl_dense.rederive(cfg, st, create=True)
    old_cap = st.excl.shape[0]
    old_irr = cfg.excl_irr_cap
    cfg2, st2 = build_mod.apply_term_caps(cfg, st, {}, old_cap + 256)
    assert st2.excl.shape[0] == old_cap + 256
    assert cfg2.excl_irr_cap == old_irr + 256
    assert st2.excl_irr.shape[0] == cfg2.excl_irr_cap
    # partition still exact
    e = np.asarray(st2.excl)
    n_valid = int(((e[:, 0] >= 0) & (e[:, 1] >= 0)).sum())
    assert (int(np.asarray(st2.excl_masks).sum())
            + int((np.asarray(st2.excl_irr)[:, 0] >= 0).sum())) == n_valid


def test_checkpoint_roundtrip(tmp_path, melt_pair):
    from chemlab_tpu import checkpoint

    _, dense, _, st = melt_pair
    cfg, spec = dense.cfg, dense.spec
    st = excl_dense.rederive(cfg, st, create=True)
    path = str(tmp_path / "cpt.npz")
    checkpoint.save_state(path, st, cfg)
    st2, cfg2 = checkpoint.load_state(path, dense.state, cfg, spec)
    assert np.array_equal(np.asarray(st.excl), np.asarray(st2.excl))
    assert np.array_equal(np.asarray(st.excl_masks),
                          np.asarray(st2.excl_masks))
    assert np.array_equal(np.asarray(st.excl_irr), np.asarray(st2.excl_irr))
