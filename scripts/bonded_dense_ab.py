"""A/B the dense-static bonded path at scale on hardware.

Builds the reactive melt twice (CHEMLAB_BONDED-independent: flags passed
explicitly), times the isolated bonded pass and the fused reactive
blocks for both, prints JSON lines.

    python scripts/bonded_dense_ab.py [--n_mols 33334]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench(bonded_dense, n_mols, reps=20, blocks=2, block_steps=200):
    import jax
    import jax.numpy as jnp

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import bonded_forces, build as build_mod, runner
    from chemlab_tpu.engine.integrate import _dense_of

    built, systop, _ = testsystems.build_melt(
        n_mols=n_mols, reactive=True, bonded_dense=bonded_dense,
        use_pallas=jax.default_backend() == "tpu")
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=600)
    cfg, st = build_mod.shrink_neighbor_caps(cfg, spec, st)
    cfg, st = build_mod.shrink_term_caps(cfg, st)
    st = testsystems.activate_initiators(built, systop, st,
                                         n=max(cfg.n_particles // 300, 4))

    @jax.jit
    def bonded(st):
        f, _ = bonded_forces.bonded_forces(
            spec, cfg, st.pos, st.box, st.type_id, st.q,
            st.bonds, st.angles, st.dihedrals, st.pairs14,
            dense=_dense_of(cfg, st))
        return f

    out = bonded(st)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = bonded(st)
    jax.block_until_ready(out)
    bonded_ms = (time.perf_counter() - t0) / reps * 1e3

    st = runner.run_block(spec, cfg, st, block_steps)
    jax.block_until_ready(st.pos)
    t0 = time.perf_counter()
    for _ in range(blocks):
        st = runner.run_block(spec, cfg, st, block_steps)
    jax.block_until_ready(st.pos)
    dt = time.perf_counter() - t0
    m = runner.measure_cheap(spec, cfg, st)
    return {
        "bonded_dense": bonded_dense,
        "bonded_ms": round(bonded_ms, 3),
        "pps_fused": round(cfg.n_particles * blocks * block_steps / dt, 1),
        "ms_per_step": round(dt / (blocks * block_steps) * 1e3, 3),
        "events": int(m["reaction_counts"].sum()),
        "overflow": bool(m["overflow"]),
        "caps": {"bonds": cfg.bond_cap, "angles": cfg.angle_cap,
                 "bond_irr": cfg.bond_irr_cap, "angle_irr": cfg.angle_irr_cap},
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=33334)
    a = p.parse_args()
    for flag in (False, True):
        print(json.dumps(bench(flag, a.n_mols)), flush=True)


if __name__ == "__main__":
    main()
