"""Headline benchmark: reactive-melt particle-steps/sec.

Runs the atrp_lj-class reactive workload (BASELINE.md: 10k-particle melt,
LJ + harmonic bonds/angles, Langevin NVT, ATRP-style reactions every 200
steps) on the default JAX device and prints one JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
denominator is a measured-order-of-magnitude estimate for single-node
ESPResSo++ on this workload class — ~2e5 particle-steps/sec/core x ~20 MPI
ranks = 4e6 particle-steps/sec (the deployment in examples/atrp_lj/p2ccg.pbs,
2 nodes x 10 ppn) — so vs_baseline ~= speedup over the reference's own
cluster configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time


ESPP_BASELINE_PPS = 4.0e6   # single-node-class ESPResSo++ estimate (see above)


def main():
    n_mols = int(os.environ.get("BENCH_N_MOLS", "3334"))   # ~10k particles
    n_blocks = int(os.environ.get("BENCH_BLOCKS", "5"))
    block_steps = int(os.environ.get("BENCH_BLOCK_STEPS", "200"))

    if os.environ.get("BENCH_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import runner

    built, systop, _ = testsystems.build_melt(n_mols=n_mols, reactive=True)
    spec, cfg = built.spec, built.cfg
    state = runner.initial_forces(spec, cfg, built.state)
    state = testsystems.warmup(built, state, steps=600)
    state = testsystems.activate_initiators(built, systop, state,
                                            n=max(cfg.n_particles // 300, 4))

    # compile + warm the cache (one full block incl. a reaction step);
    # regrow neighbor capacities if the workload's densification exceeds the
    # static estimates (phase-separating melts at large N)
    import dataclasses

    import jax.numpy as jnp

    from chemlab_tpu.engine import build as build_mod

    state = runner.run_block(spec, cfg, state, block_steps)
    jax.block_until_ready(state.pos)
    for _ in range(3):
        if not bool(state.nbr.overflow):
            break
        cfg, state = build_mod.grow_neighbor_caps(cfg, spec, state)
        state = runner.run_block(spec, cfg, state, block_steps)
        jax.block_until_ready(state.pos)

    events_before = int(jnp.sum(state.reaction_counts))
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        state = runner.run_block(spec, cfg, state, block_steps)
    jax.block_until_ready(state.pos)
    dt = time.perf_counter() - t0

    m = runner.measure(spec, cfg, state)
    n_steps = n_blocks * block_steps
    pps = cfg.n_particles * n_steps / dt
    events_timed = int(m["reaction_counts"].sum()) - events_before
    result = {
        "metric": "particle-steps/sec (reactive atrp_lj-class melt, %dk particles)"
                  % (cfg.n_particles // 1000),
        "value": round(pps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(pps / ESPP_BASELINE_PPS, 3),
        "extra": {
            "n_particles": cfg.n_particles,
            "steps_timed": n_steps,
            "wall_s": round(dt, 3),
            "reaction_events": events_timed,
            "reaction_events_per_s": round(events_timed / dt, 2),
            "device": str(jax.devices()[0]),
            "overflow": bool(m["overflow"]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
