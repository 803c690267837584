"""Time the tabulated-melt workload (rim135/dacron class) on the default
device: fused reactive blocks + the isolated pair call, at a given scale.

This is the measurement VERDICT r3 item 6 asks for: the 391k pps @100k
figure predates the packed-row/colt2 wrapper rework, and bench.py's LJ
flagship says nothing about the tabulated class most reference examples
live in.

Usage: python scripts/tab_bench.py [n_mols] [blocks] [block_steps]
Env: TAB_FORCE_CPU=1 to force the CPU backend.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TAB_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from chemlab_tpu import testsystems  # noqa: E402
from chemlab_tpu.engine import build as build_mod  # noqa: E402
from chemlab_tpu.engine import integrate, runner  # noqa: E402


def main():
    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 3334
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    block_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    use_pallas = os.environ.get("TAB_PALLAS", "") == "1"
    # TAB_MIXED=1: the conversion-mixed variant (func 10 MA-MA blended by
    # the MA conversion observable, func 12 static blend — the dacron
    # dynamic-scaling class; VERDICT r4 item 6 asks for the row-path
    # timing of exactly this system)
    builder = (testsystems.build_mixed_tab_melt
               if os.environ.get("TAB_MIXED") else
               testsystems.build_tabulated_melt)
    built, systop, _ = builder(
        n_mols=n_mols, reactive=True, use_pallas=use_pallas)
    spec, cfg = built.spec, built.cfg
    print(json.dumps({"n_particles": cfg.n_particles,
                      "use_pallas": bool(cfg.use_pallas),
                      "max_neighbors": cfg.max_neighbors,
                      "cell_cap": cfg.cell_cap,
                      "device": str(jax.devices()[0])}), flush=True)

    state = runner.initial_forces(spec, cfg, built.state)
    state = testsystems.warmup(built, state, steps=600)
    if not os.environ.get("TAB_NO_RETUNE"):
        cfg, state = build_mod.shrink_neighbor_caps(cfg, spec, state)
        cfg, state = build_mod.shrink_term_caps(cfg, state)
    state = testsystems.activate_initiators(built, systop, state,
                                            n=max(cfg.n_particles // 300, 4))

    state = runner.run_block(spec, cfg, state, block_steps)
    jax.block_until_ready(state.pos)
    for _ in range(3):
        m = runner.measure_cheap(spec, cfg, state)
        counts = {k: int(m[k]) for k in ("n_bonds", "n_angles",
                                         "n_dihedrals", "n_excl")}
        counts["excl_pair_cap"] = state.excl.shape[0]
        if build_mod.term_caps_near_full(cfg, counts):
            cfg, state = build_mod.grow_term_caps(cfg, state, counts=counts)
        elif bool(m["overflow"]):
            cfg, state = build_mod.grow_neighbor_caps(cfg, spec, state)
        else:
            break
        state = runner.run_block(spec, cfg, state, block_steps)
        jax.block_until_ready(state.pos)

    # isolated force-pass timing (includes wrapper)
    @jax.jit
    def force_only(st):
        f, e, _ = integrate.compute_forces(spec, cfg, st)
        return f, e

    f, e = force_only(state)
    jax.block_until_ready(f)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        f, e = force_only(state)
    jax.block_until_ready(f)
    force_ms = (time.perf_counter() - t0) / reps * 1e3

    # timed phase; a block that ends overflowed dropped pairs, so the
    # measurement is void — regrow (production does this between blocks)
    # and re-time, up to 3 attempts
    for _ in range(3):
        ev0 = int(jnp.sum(state.reaction_counts))
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            state = runner.run_block(spec, cfg, state, block_steps)
        jax.block_until_ready(state.pos)
        dt = time.perf_counter() - t0
        m = runner.measure(spec, cfg, state)
        if not bool(m["overflow"]):
            break
        print(json.dumps({"overflow_during_timing": True,
                          "cell_cap": cfg.cell_cap}), flush=True)
        cfg, state = build_mod.grow_neighbor_caps(cfg, spec, state)
    n_steps = n_blocks * block_steps
    print(json.dumps({
        "workload": "tabulated reactive melt (func-8 all pairs)",
        "n_particles": cfg.n_particles,
        "pps": round(cfg.n_particles * n_steps / dt, 1),
        "ms_per_step": round(dt / n_steps * 1e3, 3),
        "force_pass_ms": round(force_ms, 3),
        "steps_timed": n_steps,
        "events": int(m["reaction_counts"].sum()) - ev0,
        "e_tab": float(m.get("lj-tab", 0.0)),
        "overflow": bool(m["overflow"]),
        "cell_cap": cfg.cell_cap,
        "use_pallas": bool(cfg.use_pallas),
    }), flush=True)


if __name__ == "__main__":
    main()
