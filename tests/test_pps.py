"""func 14 ParticlePairScaling: new neighbor pairs fade in over time."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import testsystems, topfile
from chemlab_tpu.engine import build, runner, integrate
from chemlab_tpu.topology import compile_system_topology


def build_pps_system(tmp_path, incr=0.02):
    # an LJ-like table for the scaled pair
    r = np.linspace(0.8, 2.5, 400)
    s6 = (1.0 / r) ** 6
    e = 4 * (s6 * s6 - s6)
    f = 48 * (s6 * s6 - 0.5 * s6) / r
    tab = tmp_path / "table_ps.xvg"
    with open(tab, "w") as fh:
        for rr, ee, ff in zip(r, e, f):
            fh.write("%.6f %.8f %.8f\n" % (rr, ee, ff))

    text = testsystems._melt_topology_text(80)
    text = text.replace("[ atomstate ]",
                        "[ nonbond_params ]\nMA MA 14 table_ps.xvg %g\n\n"
                        "[ atomstate ]" % incr)
    top = topfile.parse_lines(text.splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(80, 0.3, seed=4)
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, gen_velocity=True, rng_seed=4,
                            table_dirs=(str(tmp_path),))
    return build.build_system(systop, coords, opts), systop


def test_pps_ramp(tmp_path):
    built, systop = build_pps_system(tmp_path)
    spec, cfg = built.spec, built.cfg
    assert cfg.has_pps
    st = runner.initial_forces(spec, cfg, built.state)

    # at step 0 every pair was just born: scaled interaction is zero
    _, e0, _ = integrate.compute_forces(spec, cfg, st)
    assert float(e0["lj-tab"]) == pytest.approx(0.0, abs=1e-6)
    # the unscaled LJ pairs (e.g. MA-ML) are unaffected
    assert float(e0["lj"]) != 0.0

    # the ramp weight is linear in pair age: at fixed geometry, energy at
    # age 25 (ramp 0.5) is half the fully-ramped energy (age >= 1/incr)
    st = runner.run_block(spec, cfg, st, 5)
    base_step = st.step
    st_half = dataclasses.replace(st, step=base_step + 25)
    st_full = dataclasses.replace(st, step=base_step + 10_000)
    _, e_half, _ = integrate.compute_forces(spec, cfg, st_half)
    _, e_full, _ = integrate.compute_forces(spec, cfg, st_full)
    assert float(e_full["lj-tab"]) != 0.0
    # ages differ per pair (born at 0 or at the rebuild); allow slack
    ratio = float(e_half["lj-tab"]) / float(e_full["lj-tab"])
    assert 0.3 < ratio < 0.95
