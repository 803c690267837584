"""Checkpoint/resume bit-exactness."""

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import checkpoint, testsystems
from chemlab_tpu.engine import runner


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
