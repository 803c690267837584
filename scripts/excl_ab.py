"""On-device A/B of the dense-static exclusion correction (excl_dense.py).

One 100k reactive-melt build with the derived operands, then:
  - fused-loop timing of the isolated correction, flat vs dense
    (same state, same exclusion content)
  - fused run_block step timing with cfg.excl_offsets on vs off
    (dataclasses.replace of the static cfg — one build serves both legs)
  - a force-equivalence check on the warmed state (belt and braces on
    top of tests/test_excl_dense.py)

The wrapper micro measured the flat correction at 3.92 ms/step at 100k
(~23% of the 17.3 ms step); this decides whether the rolled-plane leg
replaces it as the default.

    python scripts/excl_ab.py [--n_mols 33334] [--reps 40] [--block 200]
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=33334)
    p.add_argument("--reps", type=int, default=40)
    p.add_argument("--block", type=int, default=200)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import build as build_mod
    from chemlab_tpu.engine import excl_dense, pallas_pair, runner

    built, systop, _ = testsystems.build_melt(
        n_mols=a.n_mols, reactive=True, excl_dense=True, use_pallas=True)
    spec, cfg = built.spec, built.cfg
    assert cfg.excl_offsets, "dense exclusions did not enable"
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=600)
    cfg, st = build_mod.shrink_neighbor_caps(cfg, spec, st)
    cfg, st = build_mod.shrink_term_caps(cfg, st)
    st = testsystems.activate_initiators(built, systop, st,
                                         n=max(cfg.n_particles // 300, 4))
    print(json.dumps({"device": str(jax.devices()[0]),
                      "n": cfg.n_particles, "offsets": cfg.excl_offsets,
                      "excl_cap": int(st.excl.shape[0]),
                      "excl_irr_cap": cfg.excl_irr_cap}), flush=True)

    # equivalence on the warmed state
    f_flat, el_f, et_f, w_f = pallas_pair.excluded_pair_correction(
        spec, cfg.n_types, st.pos, st.box, st.type_id, st.excl,
        active=st.active, has_tab=cfg.has_tabulated)
    f_d, el_d, et_d, w_d = excl_dense.correction(
        spec, cfg, st.pos, st.box, st.type_id, st.excl_masks, st.excl_irr,
        active=st.active, has_tab=cfg.has_tabulated)
    ff, fd = np.asarray(f_flat), np.asarray(f_d)
    scale = max(float(np.abs(ff).max()), 1.0)
    rel = float(np.max(np.abs(ff - fd))) / scale
    print(json.dumps({"equiv_force_rel": rel,
                      "e_lj": [float(el_f), float(el_d)],
                      "w": [float(w_f), float(w_d)]}), flush=True)
    assert rel < 1e-5, rel

    drift = jnp.full_like(st.pos, 1e-5)

    def timed_loop(body, carry):
        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, a.reps, body, c)

        c = loop(carry)
        jax.block_until_ready(c[1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c = loop(carry)
            jax.block_until_ready(c[1])
            best = min(best, time.perf_counter() - t0)
        return best / a.reps * 1e3

    def flat_body(_, c):
        pos, acc = c
        pos = pos + drift
        f, _, _, _ = pallas_pair.excluded_pair_correction(
            spec, cfg.n_types, pos, st.box, st.type_id, st.excl,
            active=st.active, has_tab=cfg.has_tabulated)
        return pos, acc + f[0, 0]

    def dense_body(_, c):
        pos, acc = c
        pos = pos + drift
        f, _, _, _ = excl_dense.correction(
            spec, cfg, pos, st.box, st.type_id, st.excl_masks, st.excl_irr,
            active=st.active, has_tab=cfg.has_tabulated)
        return pos, acc + f[0, 0]

    out = {}
    out["flat_ms"] = timed_loop(flat_body, (st.pos, jnp.float32(0)))
    print(json.dumps({"phase": "correction", "leg": "flat",
                      "ms": round(out["flat_ms"], 3)}), flush=True)
    out["dense_ms"] = timed_loop(dense_body, (st.pos, jnp.float32(0)))
    print(json.dumps({"phase": "correction", "leg": "dense",
                      "ms": round(out["dense_ms"], 3)}), flush=True)

    # fused step, both legs from the one build
    for leg, cfg_leg in (("dense", cfg),
                         ("flat", dataclasses.replace(cfg,
                                                      excl_offsets=()))):
        stx = runner.run_block(spec, cfg_leg, st, a.block)
        jax.block_until_ready(stx.pos)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            stx = runner.run_block(spec, cfg_leg, st, a.block)
            jax.block_until_ready(stx.pos)
            best = min(best, time.perf_counter() - t0)
        ms = best / a.block * 1e3
        out["step_%s_ms" % leg] = ms
        print(json.dumps({"phase": "fused_step", "leg": leg,
                          "ms_per_step": round(ms, 3),
                          "pps": round(cfg.n_particles / (best / a.block),
                                       1)}), flush=True)

    print("EXCL_AB " + json.dumps({k: round(v, 3) for k, v in out.items()}),
          flush=True)


if __name__ == "__main__":
    main()
