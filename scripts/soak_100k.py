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
                   help="measure the reactive append rate up front (two "
                        "blocks; the later window avoids the activation "
                        "burst) and plan capacities for the run")
    p.add_argument("--ladder", type=int, default=3,
                   help="capacity rungs to plan + precompile off-clock "
                        "(0 = legacy one-shot presize: pad everything for "
                        "the full run up front — costs steady pps)")
    p.add_argument("--safety", type=float, default=1.35,
                   help="rate extrapolation margin for ladder rungs")
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
    ladder = []         # [(caps_dict, excl_or_None)] rungs not yet applied

    def snap(cfg, st):
        mc = runner.measure_cheap(spec, cfg, st)
        keys = ["n_bonds", "n_angles", "n_dihedrals", "n_excl"]
        if "n_bonds_irr" in mc:
            keys += ["n_bonds_irr", "n_angles_irr"]
        c = {k: int(mc[k]) for k in keys}
        c["excl_pair_cap"] = st.excl.shape[0]
        c["overflow"] = bool(mc["overflow"])
        return c

    if a.presize:
        # VERDICT r3 item 3 (rev 2): measure the append rate over TWO
        # reactive blocks and take the later/lower window — the first
        # post-activation block overstates the steady rate 2-3x (the r5
        # soak presized the angle cap 3x over true consumption from a
        # single burst-window sample, SOAK_r05.md)
        c0 = snap(cfg, st)
        st = runner.run_block(spec, cfg, st, a.block)
        done += a.block
        c1 = snap(cfg, st)
        st = runner.run_block(spec, cfg, st, a.block)
        done += a.block
        c2 = snap(cfg, st)
        rate = {k: min(c1[k] - c0[k], c2[k] - c1[k]) / a.block
                for k in c0 if k not in ("excl_pair_cap", "overflow")}
        if a.ladder:
            # plan capacity rungs for the remaining run and pre-compile
            # run_block at each rung NOW (off-clock): the mid-run step-up
            # is then a re-pad + jit-cache hit, so caps stay within
            # ~1/rungs of real consumption and no recompile lands on the
            # timed path
            ladder = build_mod.plan_cap_ladder(cfg, st, c2, rate,
                                               a.steps - done,
                                               rungs=a.ladder,
                                               safety=a.safety)
            for caps_r, excl_r in ladder:
                cfg_r, st_r = build_mod.apply_term_caps(cfg, st, caps_r,
                                                        excl_r)
                warm = runner.run_block(spec, cfg_r, st_r, a.block)
                jax.block_until_ready(warm.pos)   # compile only; discard
            print(json.dumps({"ladder": [
                dict(r[0], excl=r[1]) for r in ladder],
                "rate_per_block": {k: round(v * a.block, 1)
                                   for k, v in rate.items()}}), flush=True)
        else:
            cfg, st = build_mod.presize_term_caps(cfg, st, c2, c1, a.block,
                                                  a.steps - done)
            st = runner.run_block(spec, cfg, st, a.block)  # re-jit off-clock
            jax.block_until_ready(st.pos)
            done += a.block
            print(json.dumps({"presized": {"bond_cap": cfg.bond_cap,
                                           "angle_cap": cfg.angle_cap,
                                           "excl_cap": int(st.excl.shape[0])
                                           }}), flush=True)
        prev_counts = snap(cfg, st)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "n": cfg.n_particles, "steps": a.steps}), flush=True)
    regrowths = 0
    rung_swaps = 0
    untimed = done      # compile + presize blocks run before the clock
    t0 = time.perf_counter()
    while done < a.steps:
        st = runner.run_block(spec, cfg, st, a.block)
        done += a.block
        counts = snap(cfg, st)
        if build_mod.term_caps_near_full(cfg, counts,
                                         prev_counts=prev_counts):
            while ladder and build_mod.term_caps_near_full(
                    cfg, counts, prev_counts=prev_counts):
                # precompiled rung: re-pad + jit-cache hit, no stall
                caps_r, excl_r = ladder.pop(0)
                cfg, st = build_mod.apply_term_caps(cfg, st, caps_r, excl_r)
                counts["excl_pair_cap"] = st.excl.shape[0]
                rung_swaps += 1
                print(json.dumps({"step": done,
                                  "rung": dict(caps_r, excl=excl_r)}),
                      flush=True)
            if build_mod.term_caps_near_full(cfg, counts,
                                             prev_counts=prev_counts):
                cfg, st = build_mod.grow_term_caps(cfg, st, counts=counts,
                                                   prev_counts=prev_counts)
                regrowths += 1
                print(json.dumps({"step": done, "regrow_terms": cfg.bond_cap,
                                  "angle_cap": cfg.angle_cap}), flush=True)
        elif counts["overflow"]:
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
            "ladder_rung_swaps": rung_swaps,
            "ladder_rungs_left": len(ladder),
            "overflow": bool(m["overflow"]),
            "topology_check": "clean" if not problems else problems[:3],
        }}), flush=True)


if __name__ == "__main__":
    main()
