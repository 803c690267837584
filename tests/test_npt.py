"""NPT: pressure unit conversion and barostat relaxation.

The reference converts --pressure from bar to GROMACS units kJ/mol/nm^3
before configuring the barostat (ref: start_simulation.py:361
"pressure = args.pressure * 0.060221374"); a raw pass-through targets
~16.6x the intended pressure.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import app_args, start_simulation, testsystems
from chemlab_tpu.engine import integrate, runner


def test_pressure_bar_to_engine_units():
    _, args = app_args.parse_args(
        ["--conf", "c.gro", "--top", "t.top", "--pressure", "1000",
         "--barostat", "br"])
    opts = start_simulation.build_sim_options(args, (".",))
    assert abs(opts.pressure - 60.221374) < 1e-6
    assert opts.barostat == "br"
    # no pressure -> barostat off, pressure 0
    _, args0 = app_args.parse_args(["--conf", "c.gro", "--top", "t.top"])
    opts0 = start_simulation.build_sim_options(args0, (".",))
    assert opts0.pressure == 0.0 and opts0.barostat == "no"


def test_npt_runs_on_pallas_fast_path():
    """With the kernel's pair-virial channel the build no longer disables
    pallas under a barostat; a short barostatted run on the fast path stays
    finite and actually moves the box."""
    built, _, _ = testsystems.build_melt(
        n_mols=40, density=0.3, reactive=False, seed=3, barostat="br",
        pressure=0.15, barostat_tau=2.0, store_pressure=True,
        use_pallas=True)
    spec, cfg = built.spec, built.cfg
    assert cfg.use_pallas and cfg.barostat == "br"
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=60)
    box0 = float(st.box[0])
    st = runner.run_block(spec, cfg, st, 120)
    assert np.isfinite(float(st.pos.sum()))
    assert np.isfinite(float(integrate.virial_pressure(spec, cfg, st)))
    assert float(st.box[0]) != box0


def test_berendsen_barostat_relaxes_to_target_pressure():
    """An LJ melt under the Berendsen barostat relaxes until the measured
    virial pressure matches the target (box density equilibrates)."""
    target_p = 0.15   # engine units kJ/mol/nm^3 (reduced units here)
    built, _, _ = testsystems.build_melt(
        n_mols=200, reactive=False, barostat="br", pressure=target_p,
        barostat_tau=2.0, store_pressure=True)
    spec, cfg = built.spec, built.cfg
    assert cfg.barostat == "br"
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=200)
    box0 = float(st.box[0])

    st = runner.run_block(spec, cfg, st, 6000)
    # average the instantaneous pressure over decorrelated snapshots (a
    # 600-particle box fluctuates ~±0.15 instantaneously)
    ps = []
    for _ in range(20):
        st = runner.run_block(spec, cfg, st, 50)
        ps.append(float(integrate.virial_pressure(spec, cfg, st)))
    p_mean = float(np.mean(ps))
    assert np.isfinite(p_mean)
    assert abs(p_mean - target_p) < 0.1, (p_mean, ps)
    # the box moved substantially toward the equilibrium density
    assert float(st.box[0]) < box0 - 1.0
