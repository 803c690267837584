"""Lazy-row fast path (cfg.lazy_rows): buckets-only per-step refresh +
reaction-geometry rows built transiently inside reaction_step.

Correctness contract: crossing a reaction interval, the lazy path must fire
the SAME events as the XLA row path (matching is an argmin over pair keys,
so it is candidate-order independent; rc_rx covers every channel cutoff).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import runner


def test_lazy_rows_reaction_events_match_row_path():
    # warm up ONCE (row path) and drive the same settled state through both
    # configs: the pallas soft-core clamp makes warmup-from-overlaps
    # legitimately path-dependent, so each arm warming itself would only
    # compare two different configurations
    built_x, systop, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                                max_events=16,
                                                use_pallas=False)
    built_p, _, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                           max_events=16, use_pallas=True)
    spec, cfg_x = built_x.spec, built_x.cfg
    cfg_p = built_p.cfg
    assert not cfg_x.lazy_rows
    assert cfg_p.lazy_rows
    assert cfg_p.rx_rc <= 2.9
    assert cfg_p.rx_dims >= cfg_p.cell_dims  # finer reaction grid

    st = runner.initial_forces(spec, cfg_x, built_x.state)
    st = testsystems.warmup(built_x, st, steps=100)
    st = testsystems.activate_initiators(built_x, systop, st, n=6)
    st = dataclasses.replace(st, step=jnp.asarray(cfg_x.reaction_interval - 2,
                                                  jnp.int32))

    # transplant the warmed state into the pallas config's neighbor geometry
    # (its tighter cell_cap gives differently shaped buckets)
    from chemlab_tpu.engine import neighbor
    rc_skin = float(jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin)
    nbr_p = neighbor.build_neighbor_state(
        st.pos, st.box, st.active, st.excl, rc_skin,
        dims=cfg_p.cell_dims, cell_cap=cfg_p.cell_cap,
        max_neighbors=cfg_p.max_neighbors, excl_cap=cfg_p.excl_cap)
    st_p = dataclasses.replace(st, nbr=nbr_p)

    out_x = runner.run_block(spec, cfg_x, st, 4)
    out_p = runner.run_block(built_p.spec, cfg_p, st_p, 4)

    ev_x = int(jnp.sum(out_x.reaction_counts))
    ev_p = int(jnp.sum(out_p.reaction_counts))
    assert ev_x > 0
    assert ev_p == ev_x
    assert np.array_equal(np.asarray(out_x.reaction_counts),
                          np.asarray(out_p.reaction_counts))
    # the same bonds formed
    def bond_set(st):
        idx = np.asarray(st.bonds.idx)
        ok = np.asarray(st.bonds.valid)
        return set(map(tuple, np.sort(idx[ok], axis=1).tolist()))
    assert bond_set(out_x) == bond_set(out_p)
    assert not bool(out_p.nbr.overflow)
    # trajectories agree to force-path tolerance
    np.testing.assert_allclose(np.asarray(out_x.pos), np.asarray(out_p.pos),
                               atol=5e-4)
