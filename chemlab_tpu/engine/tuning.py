"""Runtime auto-tuning: the espressopp ``tools.decomp.tuneSkin`` analog
(ref: start_simulation.py:716-721).

The Verlet skin trades rebuild frequency against per-step candidate count;
the optimum depends on temperature, density, and hardware.  ``tune_skin``
rebuilds the system at several skins, times a short block on-device for
each, and returns the fastest configuration.
"""

from __future__ import annotations

import time

import jax


def tune_skin(systop, coords, opts, reaction_config=None,
              candidates=(0.1, 0.2, 0.3, 0.4, 0.6), block_steps: int = 100,
              verbose: bool = True):
    """Return (best_skin, results dict skin -> particle-steps/s).

    Each candidate pays one compile; run this once per workload class and
    bake the winner into the params file.
    """
    import dataclasses

    from . import build as build_mod
    from . import runner

    results = {}
    best = (None, 0.0)
    for skin in candidates:
        o = dataclasses.replace(opts, skin=skin)
        built = build_mod.build_system(systop, coords, o,
                                       reaction_config=reaction_config)
        st = runner.initial_forces(built.spec, built.cfg, built.state)
        st = runner.run_block(built.spec, built.cfg, st, block_steps)
        jax.block_until_ready(st.pos)
        t0 = time.perf_counter()
        st = runner.run_block(built.spec, built.cfg, st, block_steps)
        jax.block_until_ready(st.pos)
        dt = time.perf_counter() - t0
        pps = built.cfg.n_particles * block_steps / dt
        results[skin] = pps
        if verbose:
            print("skin %.2f: %.3g particle-steps/s" % (skin, pps))
        if pps > best[1]:
            best = (skin, pps)
    return best[0], results
