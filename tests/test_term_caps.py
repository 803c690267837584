"""Term-table capacity regrowth (grow_term_caps / apply_term_caps).

The reference's FixedPair/Triple/QuadrupleLists reallocate freely as
reactions add bonds; with static shapes the engine instead pads the term
tables and the driver grows them proactively near the cap (so no event is
ever dropped) at the cost of one re-jit.  Growth must be physics-inert:
padding rows carry func 0 / idx -1 and contribute nothing.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import checkpoint, testsystems
from chemlab_tpu.engine import build, runner


def _reactive_state():
    built, systop, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=100)
    st = testsystems.activate_initiators(built, systop, st, n=4)
    return built, spec, cfg, st


def test_grow_term_caps_is_physics_inert():
    built, spec, cfg, st = _reactive_state()
    cfg_big, st_big = build.grow_term_caps(cfg, st)
    assert cfg_big.bond_cap > cfg.bond_cap
    assert cfg_big.angle_cap > cfg.angle_cap
    assert st_big.excl.shape[0] > st.excl.shape[0]
    assert int(st_big.bonds.count) == int(st.bonds.count)

    # identical trajectory + topology events across a reaction interval
    a = runner.run_block(spec, cfg, st, 250)
    b = runner.run_block(spec, cfg_big, st_big, 250)
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    nb = cfg.bond_cap
    assert np.array_equal(np.asarray(a.bonds.idx),
                          np.asarray(b.bonds.idx[:nb]))
    assert np.asarray(b.bonds.idx[nb:, 0] < 0).all()
    na = cfg.angle_cap
    assert np.array_equal(np.asarray(a.angles.idx),
                          np.asarray(b.angles.idx[:na]))
    ne = st.excl.shape[0]
    assert np.array_equal(np.asarray(a.excl), np.asarray(b.excl[:ne]))
    assert int(a.n_excl) == int(b.n_excl)


def test_term_caps_near_full_trigger():
    built, spec, cfg, st = _reactive_state()
    counts = {"n_bonds": int(jnp.sum(st.bonds.valid)),
              "n_angles": int(jnp.sum(st.angles.valid)),
              "n_dihedrals": int(jnp.sum(st.dihedrals.valid)),
              "n_excl": int(st.n_excl),
              "excl_pair_cap": st.excl.shape[0]}
    assert not build.term_caps_near_full(cfg, counts)
    tight = dataclasses.replace(cfg, angle_cap=counts["n_angles"] + 1)
    assert build.term_caps_near_full(tight, counts)
    assert build.term_caps_near_full(cfg, dict(counts, n_excl=int(
        0.95 * st.excl.shape[0])))


def test_checkpoint_restores_after_term_regrowth(tmp_path):
    """A checkpoint written AFTER grow_term_caps restores into a freshly
    built system (smaller derived term caps) and continues bit-exactly."""
    built, spec, cfg, st = _reactive_state()
    st = runner.run_block(spec, cfg, st, 30)
    cfg_big, st_big = build.grow_term_caps(cfg, st)

    path = str(tmp_path / "state_term.npz")
    checkpoint.save_state(path, st_big, cfg=cfg_big)

    built2, _, _ = testsystems.build_melt(n_mols=86, reactive=True,
                                          max_events=16)
    st2, cfg2 = checkpoint.load_state(path, built2.state, cfg=built2.cfg,
                                      spec=built2.spec)
    assert cfg2.bond_cap == cfg_big.bond_cap
    assert cfg2.angle_cap == cfg_big.angle_cap
    assert st2.excl.shape[0] == st_big.excl.shape[0]

    a = runner.run_block(spec, cfg_big, st_big, 200)
    b = runner.run_block(built2.spec, cfg2, st2, 200)
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert np.array_equal(np.asarray(a.bonds.idx), np.asarray(b.bonds.idx))
    assert np.array_equal(np.asarray(a.key), np.asarray(b.key))


def test_presize_term_caps_covers_planned_run():
    """presize_term_caps (VERDICT r3 item 3): one-shot sizing from a
    measured per-block append rate covers the planned run and is
    physics-inert like any apply_term_caps repad."""
    built, spec, cfg, st = _reactive_state()

    def snap(state):
        mc = runner.measure_cheap(spec, cfg, state)
        c = {k: int(mc[k]) for k in ("n_bonds", "n_angles",
                                     "n_dihedrals", "n_excl")}
        c["excl_pair_cap"] = state.excl.shape[0]
        return c

    c0 = snap(st)
    st1, steps = st, 0
    for _ in range(8):   # reaction interval is 200; react within 2000 steps
        st1 = runner.run_block(spec, cfg, st1, 250)
        steps += 250
        c1 = snap(st1)
        if c1["n_bonds"] > c0["n_bonds"]:
            break
    appended = c1["n_bonds"] - c0["n_bonds"]
    assert appended > 0, "fixture must react for the rate to be measurable"

    plan = 5000
    cfg2, st2 = build.presize_term_caps(cfg, st1, c1, c0, steps, plan,
                                        safety=1.6)
    # cap covers current count + extrapolated consumption with margin
    rate = appended / steps
    assert cfg2.bond_cap >= c1["n_bonds"] + int(rate * plan * 1.6)
    # physics-inert: same trajectory as the ungrown config
    a = runner.run_block(spec, cfg, st1, 250)
    b = runner.run_block(spec, cfg2, st2, 250)
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert int(a.bonds.count) == int(b.bonds.count)

    # zero-rate tables don't inflate: dihedral cap unchanged when nothing
    # appended there
    if c1["n_dihedrals"] == c0["n_dihedrals"]:
        assert cfg2.dihedral_cap == cfg.dihedral_cap


def _counts(spec, cfg, st):
    mc = runner.measure_cheap(spec, cfg, st)
    keys = ["n_bonds", "n_angles", "n_dihedrals", "n_excl"]
    if "n_bonds_irr" in mc:
        keys += ["n_bonds_irr", "n_angles_irr"]
    c = {k: int(mc[k]) for k in keys}
    c["excl_pair_cap"] = st.excl.shape[0]
    return c


def test_measure_cheap_reports_irregular_occupancy():
    """Under the dense-static bonded default, measure_cheap exposes the
    irregular tables' occupancy — capacity planning sizes the irr caps
    from this telemetry instead of the lockstep worst case."""
    built, spec, cfg, st = _reactive_state()
    if not cfg.bonded_dense:
        import pytest
        pytest.skip("dense-static bonded disabled in this env")
    c = _counts(spec, cfg, st)
    assert c["n_bonds_irr"] == int(jnp.sum(st.bonds_irr.valid))
    assert c["n_angles_irr"] == int(jnp.sum(st.angles_irr.valid))
    # canonical = dense + irregular (every valid term lives in exactly one)
    assert c["n_bonds"] == int(jnp.sum(st.bonds_dense.valid)) \
        + c["n_bonds_irr"]
    assert c["n_angles"] == int(jnp.sum(st.angles_dense.valid)) \
        + c["n_angles_irr"]


def test_apply_term_caps_honors_explicit_irr_caps():
    """Explicit irr caps suppress the lockstep inflation: growing the
    canonical cap by 10k must not drag 10k dead rows into the per-step
    irregular gather path when the caller sizes irr itself."""
    built, spec, cfg, st = _reactive_state()
    if not cfg.bonded_dense:
        import pytest
        pytest.skip("dense-static bonded disabled in this env")
    irr_keep = cfg.bond_irr_cap
    cfg2, st2 = build.apply_term_caps(
        cfg, st, {"bond_cap": cfg.bond_cap + 10240,
                  "bond_irr_cap": irr_keep})
    assert cfg2.bond_cap == cfg.bond_cap + 10240
    assert cfg2.bond_irr_cap == irr_keep
    assert st2.bonds_irr.idx.shape[0] == irr_keep
    # without the explicit cap the lockstep delta applies
    cfg3, _ = build.apply_term_caps(cfg, st,
                                    {"bond_cap": cfg.bond_cap + 10240})
    assert cfg3.bond_irr_cap == cfg.bond_irr_cap + 10240


def test_near_full_fires_on_tight_irr_cap():
    built, spec, cfg, st = _reactive_state()
    if not cfg.bonded_dense:
        import pytest
        pytest.skip("dense-static bonded disabled in this env")
    counts = _counts(spec, cfg, st)
    assert not build.term_caps_near_full(cfg, counts)
    tight = dataclasses.replace(cfg,
                                angle_irr_cap=counts["n_angles_irr"] + 1)
    assert build.term_caps_near_full(tight, counts)


def test_plan_cap_ladder_rungs_apply_and_preserve_physics():
    """plan_cap_ladder: rate-projected rungs are strictly increasing,
    cumulative, and each application is physics-inert (the soak applies
    them mid-run as precompiled cache hits, SOAK_r05.md)."""
    built, spec, cfg, st = _reactive_state()

    # react long enough to measure a rate
    c0 = _counts(spec, cfg, st)
    st1, steps = st, 0
    for _ in range(8):
        st1 = runner.run_block(spec, cfg, st1, 250)
        steps += 250
        c1 = _counts(spec, cfg, st1)
        if c1["n_bonds"] > c0["n_bonds"]:
            break
    assert c1["n_bonds"] > c0["n_bonds"]
    rate = {k: (c1[k] - c0[k]) / steps for k in c0
            if k not in ("excl_pair_cap", "overflow")}

    # the tiny fixture reacts so slowly that the build caps already cover
    # the whole plan — a correct planner returns NO rungs (growing a table
    # that can't fill is pure per-step padding tax, SOAK_r05.md)
    assert build.plan_cap_ladder(cfg, st1, c1, rate, plan_steps=20000,
                                 rungs=3) == []

    # scale the measured rate so projected consumption exceeds every cap
    # the system actually appends to (a 100k production melt's regime,
    # ~0.4-1 bonds/step) — now rungs must appear
    rate = {k: v * 400 for k, v in rate.items()}
    ladder = build.plan_cap_ladder(cfg, st1, c1, rate, plan_steps=20000,
                                   rungs=3)
    assert ladder, "projected consumption beyond caps must need rungs"
    # rungs grow monotonically in every field they touch
    seen = {f: getattr(cfg, f) for f in
            ("bond_cap", "angle_cap", "dihedral_cap",
             "bond_irr_cap", "angle_irr_cap")}
    excl_seen = st1.excl.shape[0]
    for caps_r, excl_r in ladder:
        for f, v in caps_r.items():
            assert v >= seen[f], (f, v, seen[f])
            seen[f] = v
        if excl_r is not None:
            assert excl_r > excl_seen
            excl_seen = excl_r
    # the last rung covers the full-plan extrapolation for the bond table
    assert seen["bond_cap"] >= c1["n_bonds"] + int(
        rate["n_bonds"] * 20000)

    # applying every rung in order is physics-inert
    cfg_r, st_r = cfg, st1
    for caps_r, excl_r in ladder:
        cfg_r, st_r = build.apply_term_caps(cfg_r, st_r, caps_r, excl_r)
    a = runner.run_block(spec, cfg, st1, 250)
    b = runner.run_block(spec, cfg_r, st_r, 250)
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert int(a.bonds.count) == int(b.bonds.count)
    assert int(a.n_excl) == int(b.n_excl)

    # zero rate everywhere -> no rungs
    assert build.plan_cap_ladder(cfg, st1, c1,
                                 {k: 0.0 for k in rate}, 20000) == []
