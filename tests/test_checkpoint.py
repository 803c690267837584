"""Checkpoint/resume bit-exactness."""

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import checkpoint, testsystems
from chemlab_tpu.engine import build, runner


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    built, systop, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)
    st = testsystems.activate_initiators(built, systop, st, n=4)
    st = runner.run_block(spec, cfg, st, 30)

    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, st)
    st2 = checkpoint.load_state(path, built.state)

    # continuing from the restored state reproduces the original trajectory
    a = runner.run_block(spec, cfg, st, 200)    # crosses a reaction interval
    b = runner.run_block(spec, cfg, st2, 200)
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert np.array_equal(np.asarray(a.bonds.idx), np.asarray(b.bonds.idx))
    assert np.array_equal(np.asarray(a.key), np.asarray(b.key))
    assert int(a.step) == int(b.step)


def test_checkpoint_portable_across_bonded_dense_flag(tmp_path):
    """The derived dense/irregular bonded operands are stripped on save and
    re-derived on load, so a checkpoint round-trips across the
    CHEMLAB_BONDED default flip: save under dense-on, restore under
    dense-off (and back) — same canonical state either way."""
    built_on, systop, _ = testsystems.build_melt(n_mols=60, reactive=True,
                                                 max_events=16)
    st = runner.initial_forces(built_on.spec, built_on.cfg, built_on.state)
    st = runner.run_block(built_on.spec, built_on.cfg, st, 20)
    assert built_on.cfg.bonded_dense and st.bonds_dense is not None

    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, st)

    # restore into a dense-OFF build: no derived subtrees expected
    built_off, _, _ = testsystems.build_melt(n_mols=60, reactive=True,
                                             max_events=16,
                                             bonded_dense=False)
    st_off = checkpoint.load_state(path, built_off.state)
    assert st_off.bonds_dense is None
    assert np.array_equal(np.asarray(st_off.bonds.idx), np.asarray(st.bonds.idx))
    assert np.array_equal(np.asarray(st_off.pos), np.asarray(st.pos))

    # and back into a dense-ON template: derived operands are rebuilt
    st_on = checkpoint.load_state(path, built_on.state)
    assert st_on.bonds_dense is not None
    assert np.array_equal(np.asarray(st_on.bonds_dense.idx),
                          np.asarray(st.bonds_dense.idx))


def test_checkpoint_restores_after_cap_regrowth(tmp_path):
    """A checkpoint written AFTER grow_neighbor_caps regrowth restores into a
    freshly built system (whose derived caps are the original, smaller ones)
    and continues bit-exactly."""
    built, systop, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)
    st = testsystems.activate_initiators(built, systop, st, n=4)
    st = runner.run_block(spec, cfg, st, 30)

    # force a regrowth: the grown cfg's scratch shapes differ from the build
    cfg_big, st_big = build.grow_neighbor_caps(cfg, spec, st)
    assert cfg_big.max_neighbors > cfg.max_neighbors

    path = str(tmp_path / "state_big.npz")
    checkpoint.save_state(path, st_big, cfg=cfg_big)

    # fresh build: identical inputs, original caps
    built2, _, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                          max_events=16)
    st2, cfg2 = checkpoint.load_state(path, built2.state, cfg=built2.cfg,
                                      spec=built2.spec)
    assert cfg2.max_neighbors == cfg_big.max_neighbors
    assert cfg2.cell_cap == cfg_big.cell_cap

    a = runner.run_block(spec, cfg_big, st_big, 200)
    b = runner.run_block(built2.spec, cfg2, st2, 200)
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert np.array_equal(np.asarray(a.bonds.idx), np.asarray(b.bonds.idx))
    assert np.array_equal(np.asarray(a.key), np.asarray(b.key))
