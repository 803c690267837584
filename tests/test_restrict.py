"""RestrictReaction connectivity-whitelist semantics (ref: reaction_setup.py:115-128)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu import reaction_parser, testsystems, topfile
from chemlab_tpu.engine import build, reactions, runner
from chemlab_tpu.topology import compile_system_topology

CFG = """
[general]
interval: 10

[group_g1]
potential=Harmonic
potential_options=K=30.0,r0=0.97
connectivity_map=%(cmap)s

[reaction_a]
reaction: FA(3, 4) + MA(1, 2) -> FA(1):DA(2)
cutoff: 2.0
rate: 400.0
intramolecular: 1
intraresidual: 1
active: True
group: g1
"""


def test_restricted_to_whitelist(tmp_path):
    n_mols = 60
    top = topfile.parse_lines(
        testsystems._melt_topology_text(n_mols).splitlines(), "<gen>")
    systop = compile_system_topology(top)
    coords = testsystems.melt_coordinates(n_mols, 0.4, seed=5)

    # activate all first-atom MAs as FA(3); whitelist only pairs (1, 4):
    # FA atom id 1 may bond only to MA atom id 4
    cmap = tmp_path / "connections.list"
    cmap.write_text("1 6\n")   # FA atom 1 may bond only to MA atom 6
    rcfg = reaction_parser.parse_config_lines(
        (CFG % {"cmap": str(cmap)}).splitlines())
    opts = build.SimOptions(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025,
                            kT=1.0, gen_velocity=True, rng_seed=5,
                            max_events=16)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    systop2 = systop
    spec, cfg = built.spec, built.cfg

    st = runner.initial_forces(spec, cfg, built.state)
    tsym = systop2.atomsym_atomtype
    tid = np.array(st.type_id)
    chem = np.array(st.chem_state)
    # every first atom of each molecule becomes a radical
    for m in range(n_mols):
        tid[3 * m] = tsym["FA"]
        chem[3 * m] = 3
    st = dataclasses.replace(st, type_id=jnp.asarray(tid),
                             chem_state=jnp.asarray(chem),
                             reactions_on=jnp.asarray(True))
    # put atoms 1 and 6 (rows 0 and 5) within the cutoff
    pos = np.array(st.pos)
    pos[5] = pos[0] + np.asarray([0.9, 0.0, 0.0])
    st = dataclasses.replace(st, pos=jnp.asarray(pos))
    from chemlab_tpu.engine import integrate
    st = integrate.maybe_rebuild_neighbors(spec, cfg, st, force=True)

    st2 = reactions.reaction_step(spec, cfg, st, rng_seed=1)
    events = int(jnp.sum(st2.reaction_counts))
    # despite 60 radicals with rate 400, only the whitelisted pair may react
    assert events == 1
    new_rows = np.asarray(st2.bonds.group) >= 0
    idx = np.asarray(st2.bonds.idx)[new_rows & np.asarray(st2.bonds.valid)]
    assert sorted(idx.tolist()[0]) == [0, 5]
