"""Per-phase timing breakdown (engine/perf.py) sanity.

The reference records a per-interaction timer dict in its benchmark pickle
(ref: start_simulation.py:1040-1076); ours must contain the six named
phases with positive wall times.
"""

from chemlab_tpu import testsystems
from chemlab_tpu.engine import perf, runner

PHASES = ("neighbor_rebuild", "pair_forces", "bonded_forces",
          "integrate_step", "reaction_step", "observables")


def test_phase_timers_reactive():
    built, systop, _ = testsystems.build_melt(n_mols=60, reactive=True)
    st = runner.initial_forces(built.spec, built.cfg, built.state)
    timers = perf.phase_timers(built.spec, built.cfg, st, repeats=1)
    assert set(PHASES) <= set(timers)
    for k in PHASES:
        assert timers[k] > 0.0, k
    # formatted report mentions every phase
    report = perf.format_timers(timers)
    for k in PHASES:
        assert k in report


def test_phase_timers_nonreactive():
    built, _, _ = testsystems.build_melt(n_mols=40, reactive=False)
    st = runner.initial_forces(built.spec, built.cfg, built.state)
    timers = perf.phase_timers(built.spec, built.cfg, st, repeats=1)
    assert timers["reaction_step"] == 0.0
    assert timers["pair_forces"] > 0.0
