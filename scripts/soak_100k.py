"""100k-particle reactive soak (VERDICT r1 item 9; dacron/rim135 scale).

33,334 trimers (100k particles), reactions on, long run with capacity
regrowth handling and a final host-side topology consistency check.
Prints JSON progress lines; the last line is the soak summary for
SOAK_r02.md.

    python scripts/soak_100k.py [--steps 20000] [--block 500]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--block", type=int, default=500)
    p.add_argument("--n_mols", type=int, default=33334)
    p.add_argument("--pallas", type=int, default=-1,
                   help="1/0 force; -1 = auto (on when the backend is TPU)")
    p.add_argument("--presize", type=int, default=1,
                   help="measure one reactive block then size term caps "
                        "for the whole run up front (no mid-run regrow)")
    p.add_argument("--retune", type=int, default=1,
                   help="apply the post-equilibration cap shrink (the CLI's "
                        "--retune_caps) before the timed run")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import build as build_mod
    from chemlab_tpu.engine import runner
    from chemlab_tpu.start_simulation import check_topology

    use_pallas = (jax.default_backend() == "tpu" if a.pallas < 0
                  else bool(a.pallas))
    built, systop, _ = testsystems.build_melt(n_mols=a.n_mols, reactive=True,
                                              use_pallas=use_pallas)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=600)
    if a.retune:
        cfg, st = build_mod.shrink_neighbor_caps(cfg, spec, st)
        cfg, st = build_mod.shrink_term_caps(cfg, st)
        print(json.dumps({"retuned": {"cell_cap": cfg.cell_cap,
                                      "K": cfg.max_neighbors,
                                      "bond_cap": cfg.bond_cap,
                                      "angle_cap": cfg.angle_cap}}), flush=True)
    st = testsystems.activate_initiators(built, systop, st,
                                         n=max(cfg.n_particles // 300, 4))
    st = runner.run_block(spec, cfg, st, a.block)   # compile
    jax.block_until_ready(st.pos)

    done = a.block      # compile block counts toward the run
    prev_counts = None
    if a.presize:
        # VERDICT r3 item 3: measure one reactive block's append rate, then
        # size the term tables ONCE for the whole run — regrowth recompiles
        # (~90 s each at 100k) stay off the timed critical path
        def snap(st):
            mc = runner.measure_cheap(spec, cfg, st)
            c = {k: int(mc[k]) for k in ("n_bonds", "n_angles",
                                         "n_dihedrals", "n_excl")}
            c["excl_pair_cap"] = st.excl.shape[0]
            return c
        c0 = snap(st)
        st = runner.run_block(spec, cfg, st, a.block)
        done += a.block
        c1 = snap(st)
        cfg, st = build_mod.presize_term_caps(cfg, st, c1, c0, a.block,
                                              a.steps - done)
        st = runner.run_block(spec, cfg, st, a.block)   # recompile off-clock
        jax.block_until_ready(st.pos)
        done += a.block
        prev_counts = snap(st)
        print(json.dumps({"presized": {"bond_cap": cfg.bond_cap,
                                       "angle_cap": cfg.angle_cap,
                                       "excl_cap": int(st.excl.shape[0]),
                                       "rate_per_block": {
                                           k: c1[k] - c0[k] for k in c0
                                           if k != "excl_pair_cap"}}}),
              flush=True)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "n": cfg.n_particles, "steps": a.steps}), flush=True)
    regrowths = 0
    untimed = done      # compile + presize blocks run before the clock
    t0 = time.perf_counter()
    while done < a.steps:
        st = runner.run_block(spec, cfg, st, a.block)
        done += a.block
        mc = runner.measure_cheap(spec, cfg, st)
        counts = {k: int(mc[k]) for k in ("n_bonds", "n_angles",
                                          "n_dihedrals", "n_excl")}
        counts["excl_pair_cap"] = st.excl.shape[0]
        if build_mod.term_caps_near_full(cfg, counts,
                                         prev_counts=prev_counts):
            cfg, st = build_mod.grow_term_caps(cfg, st, counts=counts,
                                               prev_counts=prev_counts)
            regrowths += 1
            print(json.dumps({"step": done, "regrow_terms": cfg.bond_cap,
                              "angle_cap": cfg.angle_cap}), flush=True)
        elif bool(mc["overflow"]):
            cfg, st = build_mod.grow_neighbor_caps(cfg, spec, st)
            regrowths += 1
            print(json.dumps({"step": done, "regrow_to_K": cfg.max_neighbors,
                              "cell_cap": cfg.cell_cap}), flush=True)
        prev_counts = counts
        if done % (a.block * 8) == 0:
            m = runner.measure(spec, cfg, st)
            print(json.dumps({
                "step": done, "T": round(float(m["T"]), 4),
                "epot": round(float(m["epot"]), 1),
                "events": int(m["reaction_counts"].sum()),
                "n_bonds": int(m["n_bonds"]),
                "pps_sofar": round(cfg.n_particles * (done - untimed)
                                   / (time.perf_counter() - t0), 1),
            }), flush=True)
    wall = time.perf_counter() - t0
    m = runner.measure(spec, cfg, st)
    problems = check_topology(st)
    print(json.dumps({
        "soak_summary": {
            "device": str(jax.devices()[0]),
            "n_particles": cfg.n_particles,
            "steps": done,
            "wall_s": round(wall, 1),
            "pps": round(cfg.n_particles * (done - untimed) / wall, 1),
            "reaction_events": int(m["reaction_counts"].sum()),
            "final_bonds": int(m["n_bonds"]),
            "T": round(float(m["T"]), 4),
            "capacity_regrowths": regrowths,
            "overflow": bool(m["overflow"]),
            "topology_check": "clean" if not problems else problems[:3],
        }}), flush=True)


if __name__ == "__main__":
    main()
