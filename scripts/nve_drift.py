"""Cheb-vs-row dynamics fidelity on a real tabulated workload.

VERDICT r4 item 7: the production tabulated path is a Chebyshev
approximant (engine/tab_cheb.py, gate CHEMLAB_TAB_FIT_TOL=5e-4); the
per-table fit error and step-0 force cross-checks are recorded in
TABLE_FIDELITY.md, but nothing measured the *dynamics* consequence.
This script does, two ways, on the rim135/dacron-class tabulated melt
(testsystems.build_tabulated_melt — every nonbonded pair a func-8
source-resolution table):

1. NVE drift: thermostat off, >= 50k steps, total-energy trajectory on
   the cheb fast path vs the exact XLA row path.  Reported as the
   linear drift rate dE/dt per particle per step (in kT units) plus the
   RMS fluctuation around the fit — the standard MD integrator-fidelity
   metric.  Both paths share one build + warmup state, so the ONLY
   difference is the pair-force evaluation.
2. Thermostatted reactive observables: 20k steps with the Langevin
   thermostat + ATRP-style reactions on, comparing the T, P and
   bond-count trajectories cheb-vs-row ("trajectories match within
   thermostat statistics", BASELINE.md gate).

Artifact consumer: TABLE_FIDELITY.md ("Dynamics-level validation").

    python scripts/nve_drift.py [--n_mols 2000] [--nve_steps 50000]
                                [--reactive_steps 20000] [--block 1000]
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_leg(built, state0, steps, block, label, reactive=False,
            systop=None):
    """Run one path, returning per-block observable records."""
    import jax

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import runner

    spec, cfg = built.spec, built.cfg
    st = state0
    if reactive:
        st = testsystems.activate_initiators(
            built, systop, st, n=max(cfg.n_particles // 300, 4))
    recs = []
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        st = runner.run_block(spec, cfg, st, block)
        done += block
        m = runner.measure(spec, cfg, st)
        rec = {"step": done,
               "T": float(m["T"]),
               "ekin": float(m["ekin"]),
               "epot": float(m["epot"]),
               "etot": float(m["ekin"]) + float(m["epot"]),
               "P": float(m["P"]) if "P" in m else None,
               "n_bonds": int(m["n_bonds"]),
               "events": int(np.asarray(m["reaction_counts"]).sum()),
               "overflow": bool(m["overflow"])}
        recs.append(rec)
        if done % (block * 10) == 0:
            print(json.dumps({"leg": label, **rec}), flush=True)
    wall = time.perf_counter() - t0
    print(json.dumps({"leg": label, "wall_s": round(wall, 1),
                      "pps": round(cfg.n_particles * steps / wall, 1)}),
          flush=True)
    return recs


def drift_fit(recs, n_particles, kT=1.0):
    """Linear fit of Etot(step): drift per particle per step in kT."""
    s = np.array([r["step"] for r in recs], dtype=np.float64)
    e = np.array([r["etot"] for r in recs], dtype=np.float64)
    a, b = np.polyfit(s, e, 1)
    resid = e - (a * s + b)
    return {"drift_kT_per_particle_per_step": a / (n_particles * kT),
            "rms_fluct_kT_per_particle": float(np.sqrt(np.mean(resid**2)))
            / (n_particles * kT),
            "etot_first": e[0], "etot_last": e[-1]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=2000)
    p.add_argument("--nve_steps", type=int, default=50000)
    p.add_argument("--reactive_steps", type=int, default=20000)
    p.add_argument("--block", type=int, default=1000)
    p.add_argument("--skip_nve", action="store_true")
    p.add_argument("--skip_reactive", action="store_true")
    a = p.parse_args()

    import jax

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import runner

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    out = {"n_mols": a.n_mols, "nve_steps": a.nve_steps,
           "reactive_steps": a.reactive_steps}

    # ---- Phase 1: NVE drift, cheb vs row, identical initial state ----
    if not a.skip_nve:
        import jax.numpy as jnp

        from chemlab_tpu.engine import neighbor

        legs = {}
        built_x, _, _ = testsystems.build_tabulated_melt(
            n_mols=a.n_mols, reactive=False, use_pallas=False,
            thermostat="no", gen_velocity=True)
        built_p, _, _ = testsystems.build_tabulated_melt(
            n_mols=a.n_mols, reactive=False, use_pallas=True,
            thermostat="no", gen_velocity=True)
        # one shared warmup on the row build; the cheb leg receives the
        # SAME particle state with a freshly built neighbor cache for its
        # geometry (the test_tab_cheb transplant pattern), so the only
        # difference between legs is the pair-force evaluation
        st0 = runner.initial_forces(built_x.spec, built_x.cfg,
                                    built_x.state)
        st0 = testsystems.warmup(built_x, st0, steps=600, kT=1.0)
        st0 = runner.run_block(built_x.spec, built_x.cfg, st0, 400)
        jax.block_until_ready(st0.pos)
        for label, built in (("cheb", built_p), ("row", built_x)):
            spec, cfg = built.spec, built.cfg
            rc_skin = float(jnp.sqrt(jnp.max(spec.pair_cutoff2))
                            + spec.skin)
            nbr = neighbor.build_neighbor_state(
                st0.pos, st0.box, st0.active, st0.excl, rc_skin,
                dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
                max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap)
            st = dataclasses.replace(st0, nbr=nbr)
            st = dataclasses.replace(
                st, force=runner.initial_forces(spec, cfg, st).force)
            recs = run_leg(built, st, a.nve_steps, a.block, "nve_" + label)
            legs[label] = drift_fit(recs, cfg.n_particles)
            legs[label]["records"] = recs[:: max(len(recs) // 20, 1)]
        out["nve"] = {k: {kk: vv for kk, vv in v.items() if kk != "records"}
                      for k, v in legs.items()}
        out["nve_records"] = {k: v["records"] for k, v in legs.items()}

    # ---- Phase 2: thermostatted reactive observables ----
    if not a.skip_reactive:
        obs = {}
        for label, use_pallas in (("cheb", True), ("row", False)):
            built, systop, _ = testsystems.build_tabulated_melt(
                n_mols=a.n_mols, reactive=True, use_pallas=use_pallas,
                store_pressure=True)
            spec, cfg = built.spec, built.cfg
            st = runner.initial_forces(spec, cfg, built.state)
            st = testsystems.warmup(built, st, steps=600)
            recs = run_leg(built, st, a.reactive_steps, a.block,
                           "reactive_" + label, reactive=True,
                           systop=systop)
            half = recs[len(recs) // 2:]          # equilibrated half
            obs[label] = {
                "T_mean": float(np.mean([r["T"] for r in half])),
                "T_std": float(np.std([r["T"] for r in half])),
                "P_mean": float(np.mean([r["P"] for r in half])),
                "P_std": float(np.std([r["P"] for r in half])),
                "final_bonds": recs[-1]["n_bonds"],
                "final_events": recs[-1]["events"],
                "bond_traj": [r["n_bonds"] for r in recs],
            }
        out["reactive"] = obs

    print("NVE_DRIFT_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
