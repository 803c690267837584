"""TPU smoke + performance sweep.

Run this the moment real TPU hardware is reachable (jax.devices() shows the
chip): it validates the engine end-to-end on-device and collects the numbers
that guide optimization:

    python scripts/tpu_smoke.py            # full sweep
    python scripts/tpu_smoke.py --quick    # 10k only, no pallas/tuning

Collected: particle-steps/s at 10k and 100k (reactive), XLA-vs-pallas pair
path comparison, skin tuning curve.  Everything prints as JSON lines for easy
diffing across rounds.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench_system(n_mols, use_pallas=False, blocks=5, block_steps=200):
    import jax

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import runner

    built, systop, _ = testsystems.build_melt(n_mols=n_mols, reactive=True,
                                              use_pallas=use_pallas)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=600)
    st = testsystems.activate_initiators(built, systop, st,
                                         n=max(cfg.n_particles // 300, 4))
    st = runner.run_block(spec, cfg, st, block_steps)   # compile
    jax.block_until_ready(st.pos)
    t = time.perf_counter()
    for _ in range(blocks):
        st = runner.run_block(spec, cfg, st, block_steps)
    jax.block_until_ready(st.pos)
    dt = time.perf_counter() - t
    m = runner.measure(spec, cfg, st)
    return {
        "n": cfg.n_particles,
        "pallas": bool(cfg.use_pallas),
        "pps": round(cfg.n_particles * blocks * block_steps / dt, 1),
        "events": int(m["reaction_counts"].sum()),
        "overflow": bool(m["overflow"]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    a = p.parse_args()

    import jax

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))

    r = bench_system(3334)
    print(json.dumps({"bench_10k_xla": r}))

    if not a.quick:
        try:
            r = bench_system(3334, use_pallas=True)
            print(json.dumps({"bench_10k_pallas": r}))
        except Exception as e:  # pallas path is experimental on-device
            print(json.dumps({"bench_10k_pallas": "FAILED: %r" % e}))

        r = bench_system(33334, blocks=3)
        print(json.dumps({"bench_100k_xla": r}))

        from chemlab_tpu import testsystems, topfile
        from chemlab_tpu.engine import build, tuning
        from chemlab_tpu.topology import compile_system_topology

        top = topfile.parse_lines(
            testsystems._melt_topology_text(3334).splitlines(), "<g>")
        systop = compile_system_topology(top)
        coords = testsystems.melt_coordinates(3334, 0.27, seed=2)
        opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, dt=0.0025,
                                kT=1.0, gen_velocity=True)
        best, res = tuning.tune_skin(systop, coords, opts,
                                     candidates=(0.1, 0.2, 0.3, 0.4, 0.6),
                                     verbose=False)
        print(json.dumps({"skin_tuning": res, "best_skin": best}))


if __name__ == "__main__":
    main()
