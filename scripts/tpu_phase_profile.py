"""On-device phase breakdown: where does a run_block step actually go?

Runs perf.phase_timers on a settled reactive melt at the given size, plus a
fused-block steps/s measurement, so the per-phase costs can be compared with
the whole (phases overlap inside the fused program; the ratios are what
matter).  Prints JSON lines.

    python scripts/tpu_phase_profile.py [--n_mols 3334] [--profile_dir DIR]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=3334)
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--block_steps", type=int, default=200)
    a = p.parse_args()

    import jax

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import perf, runner

    built, systop, _ = testsystems.build_melt(n_mols=a.n_mols, reactive=True)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=600)
    st = testsystems.activate_initiators(built, systop, st,
                                         n=max(cfg.n_particles // 300, 4))
    st = runner.run_block(spec, cfg, st, a.block_steps)
    jax.block_until_ready(st.pos)

    t0 = time.perf_counter()
    st = runner.run_block(spec, cfg, st, a.block_steps)
    jax.block_until_ready(st.pos)
    block_s = time.perf_counter() - t0
    print(json.dumps({"n": cfg.n_particles, "device": str(jax.devices()[0]),
                      "block_steps": a.block_steps,
                      "s_per_step_fused": round(block_s / a.block_steps, 6),
                      "pps": round(cfg.n_particles * a.block_steps / block_s, 1)}),
          flush=True)

    timers = perf.phase_timers(spec, cfg, st, repeats=5)
    print(json.dumps({"phase_timers_s": {k: round(v, 6)
                                         for k, v in timers.items()}}),
          flush=True)
    print(perf.format_timers(timers), flush=True)

    if a.profile_dir:
        jax.profiler.start_trace(a.profile_dir)
        st = runner.run_block(spec, cfg, st, a.block_steps)
        jax.block_until_ready(st.pos)
        jax.profiler.stop_trace()
        print("trace written to", a.profile_dir, flush=True)


if __name__ == "__main__":
    main()
