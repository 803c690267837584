"""Per-phase timing breakdown (the reference's engine-timer analog).

The reference prints/pickles a per-interaction timer dict after each run
(ref: start_simulation.py:1040-1076, tools.py:51-99 — espressopp's
``integrator.getTimers()`` split by force term).  Under XLA the production
hot loop is one fused program, so phase costs can't be read off the fused
run; instead this module jits each phase as a standalone program and times
it over the *current* state — an honest estimate of where a block's time
goes, at the cost of a handful of extra compiles (which is why it runs
behind the ``--timers`` flag / at end-of-run, never inside the loop).

Phases timed (>= 6, matching the reference's per-term dict shape):
  neighbor_rebuild  cell binning + candidate pack + exclusion rows
  pair_forces       nonbonded force/energy over neighbor rows
  bonded_forces     bond/angle/dihedral/1-4 terms
  integrate_step    one full md_step (kick/drift/thermostat/rebuild-gate)
  reaction_step     one reactive interval (matching + event application)
  observables       the measure() pass
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from . import bonded_forces, integrate, neighbor, observables, pair_forces
from . import reactions, runner


def _time_fn(fn, *args, repeats: int = 3):
    """Compile once, then median wall time of ``repeats`` executions."""
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def phase_timers(spec, cfg, state, repeats: int = 3):
    """Return {phase: seconds-per-call} for the six engine phases.

    ``state`` should be a settled production state (post-warmup) so the
    timings reflect the real working set.  All phases are timed on whatever
    backend the state lives on.
    """
    timers = {}

    rc_skin = jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin

    @jax.jit
    def _nbr(pos, box, active, excl):
        return neighbor.build_neighbor_state(
            pos, box, active, excl, rc_skin,
            dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
            max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap)

    timers["neighbor_rebuild"] = _time_fn(
        _nbr, state.pos, state.box, state.active, state.excl, repeats=repeats)

    obs_x = jnp.zeros(spec.obs_total.shape[0], jnp.float32)
    tab_a, tab_b, mix_x = pair_forces.resolve_pair_tables(
        spec, obs_x, cfg.n_mix_entries)

    @jax.jit
    def _pair(pos, box, type_id, q, lam, nbr_idx, excl_mask):
        return pair_forces.pair_forces(
            spec, cfg.n_types, pos, box, type_id, q, lam, nbr_idx,
            excl_mask, tab_a, tab_b, mix_x, cfg=cfg)

    timers["pair_forces"] = _time_fn(
        _pair, state.pos, state.box, state.type_id, state.q, state.lam,
        state.nbr.idx, state.nbr.excl_mask, repeats=repeats)

    @jax.jit
    def _bonded(pos, box, type_id, q, bonds, angles, dihedrals, pairs14):
        return bonded_forces.bonded_forces(
            spec, cfg, pos, box, type_id, q, bonds, angles, dihedrals, pairs14)

    timers["bonded_forces"] = _time_fn(
        _bonded, state.pos, state.box, state.type_id, state.q,
        state.bonds, state.angles, state.dihedrals, state.pairs14,
        repeats=repeats)

    @functools.partial(jax.jit, static_argnames=())
    def _step(st):
        return integrate.md_step(spec, cfg, st)

    timers["integrate_step"] = _time_fn(_step, state, repeats=repeats)

    if cfg.has_reactions:
        @jax.jit
        def _react(st):
            return reactions.reaction_step(spec, cfg, st, 0)

        timers["reaction_step"] = _time_fn(_react, state, repeats=repeats)
    else:
        timers["reaction_step"] = 0.0

    timers["observables"] = _time_fn(
        lambda st: runner.measure(spec, cfg, st), state, repeats=repeats)

    return timers


def format_timers(timers: dict, block_steps: int = 1) -> str:
    """Reference-style printout (tools.py:51-99 shape): per-phase seconds
    and the share of one step each phase would account for."""
    step_cost = timers.get("integrate_step", 0.0) or 1e-12
    lines = ["phase                 s/call     x step"]
    for k, v in sorted(timers.items(), key=lambda kv: -kv[1]):
        lines.append("%-20s %9.6f  %8.2fx" % (k, v, v / step_cost))
    return "\n".join(lines)
