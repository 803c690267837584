"""Fused-loop decomposition of the reactive-melt step on hardware.

One 100k (or 10k) build, then dispatch-amortized fori_loop timings of:
  - the full fused step (run_block), CHEMLAB_DENSE=gather vs =scatter
    (the unique_indices scatter build, scripts/dense_mode_micro.py)
  - the isolated pallas pair call in both dense modes
  - the excluded-pair correction alone (its two scatter-adds are a
    suspected multi-ms term at 100k; dense-static exclusion candidate)
  - the bonded pass alone (dense-static path)

Single-device launches carry ~27 ms tunnel latency (CLAUDE.md), so every
number here comes from an R-iteration fused loop with a position drift
between iterations to defeat CSE.

    python scripts/pair_wrapper_micro.py [--n_mols 33334] [--reps 50]
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")


def timed_loop(fn, carry, reps, outer=3):
    import jax

    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, reps, fn, c)

    c = loop(carry)
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        c = loop(carry)
        jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=33334)
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--block", type=int, default=200)
    p.add_argument("--skip_steps", action="store_true")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import build as build_mod
    from chemlab_tpu.engine import integrate, pallas_pair, runner

    built, systop, _ = testsystems.build_melt(n_mols=a.n_mols,
                                              reactive=True)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=600)
    cfg, st = build_mod.shrink_neighbor_caps(cfg, spec, st)
    cfg, st = build_mod.shrink_term_caps(cfg, st)
    st = testsystems.activate_initiators(built, systop, st,
                                         n=max(cfg.n_particles // 300, 4))
    st = runner.run_block(spec, cfg, st, a.block)
    jax.block_until_ready(st.pos)
    print(json.dumps({"device": str(jax.devices()[0]),
                      "n": cfg.n_particles, "cell_cap": cfg.cell_cap,
                      "dims": cfg.cell_dims, "K": cfg.max_neighbors,
                      "excl_rows": int(st.excl.shape[0]),
                      "use_pallas": cfg.use_pallas}), flush=True)
    out = {}

    # ---- full fused step, dense-mode A/B --------------------------------
    if not a.skip_steps:
        for mode in ("gather", "scatter"):
            os.environ["CHEMLAB_DENSE"] = mode
            jax.clear_caches()
            stx = runner.run_block(spec, cfg, st, a.block)  # compile+warm
            jax.block_until_ready(stx.pos)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                stx = runner.run_block(spec, cfg, st, a.block)
                jax.block_until_ready(stx.pos)
                best = min(best, time.perf_counter() - t0)
            ms = best / a.block * 1e3
            out["step_" + mode] = ms
            print(json.dumps({"phase": "fused_step", "dense": mode,
                              "ms_per_step": round(ms, 3),
                              "pps": round(cfg.n_particles / (best / a.block),
                                           1)}), flush=True)

    drift = jnp.full_like(st.pos, 1e-5)

    # ---- isolated pair call (kernel + wrapper), both modes --------------
    interpret = jax.default_backend() != "tpu"

    def pair_body(_, c):
        pos, acc = c
        pos = pos + drift
        f, e1, e2, _ = pallas_pair.cell_pair_forces(
            pos, st.type_id, st.active, st.box, st.nbr.buckets,
            cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap,
            interpret=interpret, uniform_lj=cfg.uniform_lj,
            all_lj=cfg.all_lj, slot_of=st.nbr.slot_of, want_energy=False)
        return pos, acc + f[0, 0]

    for mode in ("gather", "scatter"):
        os.environ["CHEMLAB_DENSE"] = mode
        jax.clear_caches()
        ms = timed_loop(pair_body, (st.pos, jnp.float32(0)), a.reps) * 1e3
        out["pair_" + mode] = ms
        print(json.dumps({"phase": "pair_call", "dense": mode,
                          "ms": round(ms, 3)}), flush=True)
    os.environ.pop("CHEMLAB_DENSE", None)
    jax.clear_caches()

    # ---- excluded-pair correction alone ---------------------------------
    def excl_body(_, c):
        pos, acc = c
        pos = pos + drift
        f, el, et, _ = pallas_pair.excluded_pair_correction(
            spec, cfg.n_types, pos, st.box, st.type_id, st.excl,
            active=st.active, has_tab=cfg.has_tabulated,
            cheb=(cfg.cheb_kw, cfg.cheb_ko) if cfg.tab_cheb else None)
        return pos, acc + f[0, 0]

    ms = timed_loop(excl_body, (st.pos, jnp.float32(0)), a.reps) * 1e3
    out["excl_correction"] = ms
    print(json.dumps({"phase": "excl_correction", "ms": round(ms, 3),
                      "excl_rows": int(st.excl.shape[0])}), flush=True)

    # ---- bonded pass alone (production dense config) --------------------
    from chemlab_tpu.engine import bonded_forces

    dense = integrate._dense_of(cfg, st)

    def bonded_body(_, c):
        pos, acc = c
        pos = pos + drift
        f, e = bonded_forces.bonded_forces(
            spec, cfg, pos, st.box, st.type_id, st.q,
            st.bonds, st.angles, st.dihedrals, st.pairs14, dense=dense)
        return pos, acc + f[0, 0]

    ms = timed_loop(bonded_body, (st.pos, jnp.float32(0)), a.reps) * 1e3
    out["bonded"] = ms
    print(json.dumps({"phase": "bonded", "ms": round(ms, 3)}), flush=True)

    print("WRAPPER_MICRO " + json.dumps(
        {k: round(v, 3) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
