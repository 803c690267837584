"""Decompose the cheb-tab colt2 kernel's cost on device.

Times the isolated pair call on a settled 100k-class tabulated melt under
four ablations to locate the overhead vs the LJ kernel:

  geom      cheb_kw=0, lj_on=False  — tile/DMA floor (zero pair physics)
  lj        cheb_kw=0, lj_on=True   — the LJ-equivalent cost on the same
                                      geometry (islj=0 so forces are zero,
                                      but all LUTs + LJ math run)
  cheb-mxu  real cheb matrices, eval_planes stubbed to coefficient 0 only
                                      — isolates the per-packet cm() MXU
                                      lookups from the recurrence
  cheb      the real thing (kw from the build)

Usage: python scripts/cheb_micro.py [n_mols] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from chemlab_tpu import testsystems
from chemlab_tpu.engine import pallas_pair, runner, tab_cheb


def timeit(fn, st, reps):
    out = fn(st)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(st)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 33334
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    interpret = jax.default_backend() != "tpu"

    built, _, _ = testsystems.build_tabulated_melt(
        n_mols=n_mols, reactive=False, use_pallas=True)
    spec, cfg = built.spec, built.cfg
    assert cfg.tab_cheb, "cheb path not selected at build"
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=200)

    def pair_call(cheb_kw, cheb_ko, lj_on):
        @jax.jit
        def f(s):
            return pallas_pair.cell_pair_forces_colt(
                s.pos, s.type_id, s.active, s.box, s.nbr.buckets,
                cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap,
                interpret=interpret, slot_of=s.nbr.slot_of,
                cheb_kw=cheb_kw, cheb_ko=cheb_ko, lj_on=lj_on)
        return f

    out = {"n_particles": cfg.n_particles, "cell_cap": cfg.cell_cap,
           "kw": cfg.cheb_kw, "ko": cfg.cheb_ko,
           "device": str(jax.devices()[0])}
    out["geom_ms"] = timeit(pair_call(0, 0, False), st, reps)
    out["lj_ms"] = timeit(pair_call(0, 0, True), st, reps)

    real_eval = tab_cheb.eval_planes

    def stub_eval(r2, wall_g, wall_e, well_g, well_e, ay, by, ax, bx,
                  rs2, rcap2, kw, ko):
        return wall_g[0] + 0.0 * r2, wall_e[0] + 0.0 * r2

    tab_cheb.eval_planes = stub_eval
    try:
        out["cheb_mxu_ms"] = timeit(pair_call(cfg.cheb_kw, cfg.cheb_ko,
                                              False), st, reps)
    finally:
        tab_cheb.eval_planes = real_eval
    out["cheb_ms"] = timeit(pair_call(cfg.cheb_kw, cfg.cheb_ko, False),
                            st, reps)

    # the excluded-pair correction (the other half of compute-all-minus-
    # excluded): cheb twin vs exact 4096-bin interpolation
    @jax.jit
    def corr_cheb(s):
        return pallas_pair.excluded_pair_correction(
            spec, cfg.n_types, s.pos, s.box, s.type_id, s.excl,
            active=s.active, cheb=(cfg.cheb_kw, cfg.cheb_ko))

    @jax.jit
    def corr_exact(s):
        return pallas_pair.excluded_pair_correction(
            spec, cfg.n_types, s.pos, s.box, s.type_id, s.excl,
            active=s.active, has_tab=True)

    out["n_excl_cap"] = int(st.excl.shape[0])
    out["corr_cheb_ms"] = timeit(corr_cheb, st, reps)
    out["corr_exact_ms"] = timeit(corr_exact, st, reps)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
