"""--retune_caps: post-equilibration neighbor-capacity shrink.

The build sizes cell/Verlet capacities from the INITIAL coordinates; a
packed start oversizes them for the equilibrated fluid and every rebuild
plane (and pallas kernel tile) pays the padding.  shrink_neighbor_caps
re-derives the caps from the current state (tuneSkin analog, ref:
start_simulation.py:716-721, applied to capacities instead of the skin).
"""

import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import build, runner


def _setup():
    built, systop, _ = testsystems.build_melt(n_mols=120)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)
    return spec, cfg, st


def test_shrink_recovers_grown_caps():
    spec, cfg, st = _setup()
    cfg_big, st_big = build.grow_neighbor_caps(cfg, spec, st)
    assert cfg_big.cell_cap > cfg.cell_cap

    e_big = float(runner.measure(spec, cfg_big, st_big)["epot"])
    cfg_s, st_s = build.shrink_neighbor_caps(cfg_big, spec, st_big)

    # the observed-occupancy sizing takes the inflated caps back down
    assert cfg_s.cell_cap < cfg_big.cell_cap
    assert cfg_s.max_neighbors < cfg_big.max_neighbors

    # identical physics at the tighter capacities
    e_s = float(runner.measure(spec, cfg_s, st_s)["epot"])
    assert abs(e_s - e_big) <= 1e-5 * abs(e_big)

    # and the shrunk config runs without overflow
    st_s = runner.run_block(spec, cfg_s, st_s, 50)
    m = runner.measure(spec, cfg_s, st_s)
    assert np.isfinite(float(m["epot"]))
    assert not bool(m["overflow"])


def test_shrink_noop_when_tight():
    """When the current caps already match the observed occupancy (one dense
    cell pins the global cap), shrink must return the SAME cfg — no re-jit."""
    spec, cfg, st = _setup()
    cfg2, st2 = build.shrink_neighbor_caps(cfg, spec, st)
    # a second shrink after one pass is a no-op
    cfg3, st3 = build.shrink_neighbor_caps(cfg2, spec, st2)
    assert cfg3 is cfg2
    assert st3 is st2

def test_shrink_term_caps():
    """Term-table shrink: reactive headroom comes down to cursor + margin,
    physics identical, appends still work (regrow backstop intact)."""
    built, systop, _ = testsystems.build_melt(n_mols=120, reactive=True)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)

    e0 = float(runner.measure(spec, cfg, st)["epot"])
    cfg_s, st_s = build.shrink_term_caps(cfg, st, headroom=16)
    assert cfg_s.bond_cap < cfg.bond_cap or cfg_s.angle_cap < cfg.angle_cap
    assert st_s.excl.shape[0] <= st.excl.shape[0]

    e_s = float(runner.measure(spec, cfg_s, st_s)["epot"])
    assert abs(e_s - e0) <= 1e-5 * abs(e0)

    st_s = testsystems.activate_initiators(built, systop, st_s, n=4)
    st_s = runner.run_block(spec, cfg_s, st_s, 250)
    m = runner.measure(spec, cfg_s, st_s)
    assert np.isfinite(float(m["epot"]))
    # reactions fired into the shrunk tables without dropping events
    assert int(m["n_bonds"]) >= int(
        runner.measure(spec, cfg, st)["n_bonds"])

    # idempotent second shrink at the same headroom is a no-op
    cfg2, st2 = build.shrink_term_caps(cfg_s, st_s, headroom=16)
    assert cfg2.bond_cap == cfg_s.bond_cap
    assert cfg2.angle_cap == cfg_s.angle_cap
