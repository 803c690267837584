"""Programmatic benchmark/test systems (no input files required).

The reference generates its benchmark melt with a script
(examples/atrp_lj/polymer_melt.py: random chains + warmup); these builders
produce equivalent systems directly in memory for benchmarks, the graft
entry points, and sharding tests.
"""

from __future__ import annotations

import numpy as np

from . import files_io, topfile
from .topology import compile_system_topology

ATRP_CFG_TEXT = """
[general]
interval: 200
nearest=0

[ext_change_neighbour_type]
ext_type=ChangeNeighboursProperty
invoke_on=both
type_transfers=MA:2->PA,ML:1->PL(state=1),ML:2->PL(state=1)

[group_reaction_1]
potential=Harmonic
potential_options=K=30.0,r0=0.97
extensions=change_neighbour_type

[reaction_a]
reaction: FA(3, 4) + MA(1, 2) -> FA(1):DA(2)
cutoff: 1.2
rate: 0.8
intramolecular: 1
intraresidual: 0
active: True
group: reaction_1

[reaction_b]
reaction: DA(3, 4) + MA(1, 2) -> RA(1):DA(2)
cutoff: 1.2
rate: 0.8
intramolecular: 1
intraresidual: 0
active: True
group: reaction_1
"""


def _melt_topology_text(n_mols: int) -> str:
    """An ATRP-style coarse-grained monomer melt: MA-ML-MA trimers with
    harmonic bonds/angles and unit LJ types (reduced units)."""
    return """
[ defaults ]
1 3

[ atomtypes ]
  MA    1.0      0.000     A        1            1
  ML    1.0      0.000     A        1            1
  PA    1.0      0.000     A        1            1
  FA    1.0      0.000     A        1            1
  DA    1.0      0.000     A        1            1
  RA    1.0      0.000     A        1            1
  PL    1.0      0.000     A        1            1

[ atomstate ]
MA 1
PA 1
FA 5
PL 1

[ bondtypes ]
MA ML 1 0.97 60.0
PA PL 1 0.97 60.0
FA PL 1 0.97 60.0
RA PL 1 0.97 60.0
DA PL 1 0.97 60.0
FA RA 1 0.97 60.0
FA DA 1 0.97 60.0
DA RA 1 0.97 60.0
RA RA 1 0.97 60.0

[ angletypes ]
MA ML MA 1 180.0 2.5
PA PL RA 1 180.0 2.5
FA PL RA 1 180.0 2.5
PA PL FA 1 180.0 2.5
PA PL DA 1 180.0 2.5
FA PL FA 1 180.0 2.5
DA PL DA 1 180.0 2.5
FA PL DA 1 180.0 2.5
DA FA PL 1 180.0 2.5
FA DA PL 1 180.0 2.5
FA PA PL 1 180.0 2.5
RA FA PL 1 180.0 2.5
RA RA PL 1 180.0 2.5
RA DA PL 1 180.0 2.5
DA RA PL 1 180.0 2.5
FA RA DA 1 180.0 2.5
FA RA RA 1 180.0 2.5
RA RA RA 1 180.0 2.5
RA RA DA 1 180.0 2.5

[ moleculetype ]
TRI 2

[ atoms ]
1 MA 1 MON AI 1 0.000000 1
2 ML 1 MON LM 2 0.000000 1
3 MA 1 MON AJ 3 0.000000 1

[ bonds ]
1 2
2 3

[ angles ]
1 2 3

[ system ]
generated melt

[ molecules ]
TRI %d
""" % n_mols


def melt_coordinates(n_mols: int, density: float, bond_r: float = 0.97,
                     seed: int = 0) -> files_io.Coordinates:
    """Place trimer molecules at random positions/orientations."""
    rng = np.random.RandomState(seed)
    n = 3 * n_mols
    box_l = float((n / density) ** (1.0 / 3.0))
    box = np.array([box_l, box_l, box_l])
    centers = rng.uniform(0, box_l, size=(n_mols, 3))
    u = rng.normal(size=(n_mols, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = np.empty((n, 3))
    pos[0::3] = centers - bond_r * u
    pos[1::3] = centers
    pos[2::3] = centers + bond_r * u
    pos = np.mod(pos, box)
    res = np.repeat(np.arange(1, n_mols + 1), 3)
    return files_io.Coordinates(
        title="generated melt",
        atom_ids=np.arange(1, n + 1),
        res_idx=res,
        res_names=["MON"] * n,
        atom_names=["AI", "LM", "AJ"] * n_mols,
        pos=pos,
        vel=None,
        box=box,
    )


def build_melt(n_mols: int = 2000, density: float = 0.27, kT: float = 1.0,
               reactive: bool = True, seed: int = 42, **opt_overrides):
    """Build a full reactive melt system ready to run.

    Returns (BuiltSystem, SystemTopology, Coordinates); matches the scale
    shape of the reference's atrp_lj benchmark workload (6k particles at
    n_mols=2000; ref: examples/atrp_lj/single).
    """
    from . import reaction_parser
    from .engine import build

    top = topfile.parse_lines(_melt_topology_text(n_mols).splitlines(),
                              "<generated>")
    systop = compile_system_topology(top)
    coords = melt_coordinates(n_mols, density, seed=seed)
    rcfg = None
    if reactive:
        rcfg = reaction_parser.parse_config_lines(ATRP_CFG_TEXT.splitlines())
    # capacity sizing for LIQUID density: at eps = kT the sub-critical melt
    # phase-separates into droplets near rho ~ 0.85/sigma^3, so local
    # occupancies are ~3x the box mean
    rc_skin = 2.5 + 0.4
    rho_liq = 0.95
    k_liq = int(rho_liq * 4.0 / 3.0 * np.pi * rc_skin**3 * 1.25)
    opts_kw = dict(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025, kT=kT,
                   thermostat="lv", thermostat_gamma=1.0, gen_velocity=True,
                   rng_seed=seed,
                   max_neighbors=-(-k_liq // 8) * 8)
    # cell_cap left to the build heuristics: the pallas kernel's cost scales
    # with cell_cap^2, and regrowth-on-overflow covers droplet densification
    opts_kw.update(opt_overrides)
    opts = build.SimOptions(**opts_kw)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop, coords


MELT_TYPES = ("MA", "ML", "PA", "FA", "DA", "RA", "PL")


def write_lj_pair_tables(out_dir: str, eps: float = 0.25, sig: float = 1.0,
                         dr: float = 0.002, r_max: float = 3.0,
                         rough: float = 0.0, seed: int = 3) -> None:
    """Write table_T1_T2.pot for every melt type pair: the LJ potential
    sampled at source resolution (the rim135/dacron table granularity,
    ref: examples/rim135/table_A_A.xvg has dr=0.002).  ``rough`` adds
    bounded high-frequency structure to F (and integrates it into E) to
    mimic IBI-table roughness without destabilizing the dynamics."""
    import os

    r = np.arange(dr, r_max + dr / 2, dr)
    sr6 = (sig / r) ** 6
    e = 4.0 * eps * (sr6 * sr6 - sr6)
    f = 24.0 * eps * (2.0 * sr6 * sr6 - sr6) / r
    rng = np.random.RandomState(seed)
    names = sorted(MELT_TYPES)
    for i, t1 in enumerate(names):
        for t2 in names[i:]:
            if rough > 0.0:
                bump = rough * np.abs(f) * rng.uniform(-1, 1, size=len(r))
                fq = f + bump
                eq = e.copy()
                eq[:-1] = e[-1] + np.cumsum((fq * dr)[::-1])[::-1][1:]
            else:
                fq, eq = f, e
            path = os.path.join(out_dir, "table_%s_%s.pot" % (t1, t2))
            with open(path, "w") as out:
                for k in range(len(r)):
                    out.write("%.6f %.8e %.8e\n" % (r[k], eq[k], fq[k]))


def build_tabulated_melt(n_mols: int = 2000, density: float = 0.27,
                         kT: float = 1.0, reactive: bool = True,
                         seed: int = 42, rough: float = 0.0,
                         table_dir: str | None = None, **opt_overrides):
    """The melt with every nonbonded type pair served by a func-8 table —
    the rim135/dacron workload class (many per-pair source-resolution
    tables; ref: examples/rim135/cg_topol.top [ nonbond_params ] func 8)."""
    import tempfile

    from . import reaction_parser
    from .engine import build

    if table_dir is None:
        table_dir = tempfile.mkdtemp(prefix="chemlab_tab_")
        write_lj_pair_tables(table_dir, rough=rough)

    names = sorted(MELT_TYPES)
    nb_lines = ["", "[ nonbond_params ]"]
    for i, t1 in enumerate(names):
        for t2 in names[i:]:
            nb_lines.append("%s %s 8" % (t1, t2))
    top_text = _melt_topology_text(n_mols) + "\n".join(nb_lines) + "\n"

    top = topfile.parse_lines(top_text.splitlines(), "<generated-tab>")
    systop = compile_system_topology(top)
    coords = melt_coordinates(n_mols, density, seed=seed)
    rcfg = None
    if reactive:
        rcfg = reaction_parser.parse_config_lines(ATRP_CFG_TEXT.splitlines())
    # no max_neighbors override: the tabulated pairs keep their table's
    # (supercritical) well depth, the melt stays homogeneous, and the
    # build's observed-occupancy sizing (with regrowth as backstop) keeps
    # K tight — K directly multiplies the per-step gather cost of this path
    opts_kw = dict(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025, kT=kT,
                   thermostat="lv", thermostat_gamma=1.0, gen_velocity=True,
                   rng_seed=seed, table_dirs=(table_dir,))
    opts_kw.update(opt_overrides)
    opts = build.SimOptions(**opts_kw)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop, coords


def build_mixed_tab_melt(n_mols: int = 100, density: float = 0.27,
                         kT: float = 1.0, reactive: bool = False,
                         seed: int = 42, **opt_overrides):
    """The tabulated melt with conversion-mixed pairs: MA-MA blends two
    tables by the MA conversion observable (func 10) and MA-ML by a static
    factor (func 12) — the dacron-class dynamic-scaling workload
    (ref: gromacs_topology.py:574-583,756-790)."""
    import os
    import tempfile

    from . import reaction_parser
    from .engine import build

    table_dir = tempfile.mkdtemp(prefix="chemlab_mixtab_")
    write_lj_pair_tables(table_dir)
    # two blend sources with distinct well depths
    dr, r_max, sig = 0.002, 3.0, 1.0
    r = np.arange(dr, r_max + dr / 2, dr)
    for name, eps in (("mixA", 0.25), ("mixB", 0.12)):
        sr6 = (sig / r) ** 6
        e = 4.0 * eps * (sr6 * sr6 - sr6)
        f = 24.0 * eps * (2.0 * sr6 * sr6 - sr6) / r
        with open(os.path.join(table_dir, "table_%s.pot" % name), "w") as out:
            for k in range(len(r)):
                out.write("%.6f %.8e %.8e\n" % (r[k], e[k], f[k]))

    names = sorted(MELT_TYPES)
    nb_lines = ["", "[ nonbond_params ]"]
    for i, t1 in enumerate(names):
        for t2 in names[i:]:
            if (t1, t2) == ("MA", "MA"):
                nb_lines.append("MA MA 10 table_mixA.pot table_mixB.pot "
                                "MA %d" % (2 * n_mols))
            elif (t1, t2) == ("MA", "ML"):
                nb_lines.append("MA ML 12 table_mixA.pot table_mixB.pot "
                                "0.35")
            else:
                nb_lines.append("%s %s 8" % (t1, t2))
    top_text = _melt_topology_text(n_mols) + "\n".join(nb_lines) + "\n"

    top = topfile.parse_lines(top_text.splitlines(), "<generated-mixtab>")
    systop = compile_system_topology(top)
    coords = melt_coordinates(n_mols, density, seed=seed)
    rcfg = None
    if reactive:
        rcfg = reaction_parser.parse_config_lines(ATRP_CFG_TEXT.splitlines())
    opts_kw = dict(lj_cutoff=2.5, cg_cutoff=2.5, skin=0.4, dt=0.0025, kT=kT,
                   thermostat="lv", thermostat_gamma=1.0, gen_velocity=True,
                   rng_seed=seed, table_dirs=(table_dir,))
    opts_kw.update(opt_overrides)
    opts = build.SimOptions(**opts_kw)
    built = build.build_system(systop, coords, opts, reaction_config=rcfg)
    return built, systop, coords


def warmup(built, state, steps: int = 400, max_disp: float = 0.05, kT=None,
           seed: int = 7, chunk: int = 100, **_legacy):
    """Resolve overlaps in a random configuration, then re-draw velocities.

    Displacement-capped steepest descent (each particle moves along its force
    by at most ``max_disp``) — the role the reference's warmup script plays
    (examples/atrp_lj/polymer_melt.py), but deterministic and overlap-proof.

    The descent runs in fixed ``chunk``-step device programs (one compile)
    rather than a single ``steps``-long program: at 100k+ particles a
    multi-minute single launch can trip remote-executor deadlines.
    """
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from .engine import integrate, runner

    spec, cfg = built.spec, built.cfg

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def descend(st, n_steps):
        def body(_, st):
            st = integrate.maybe_rebuild_neighbors(spec, cfg, st)
            force, _, _ = integrate.compute_forces(spec, cfg, st)
            # overflow-safe normalization: |F| can exceed 1e21 on deep
            # overlaps, so sum(F^2) would overflow float32 to inf; the
            # zero-force branch is selected with where (not eps-max) so the
            # compiler's rsqrt rewrite cannot produce 0 * inf = nan
            fmax = jnp.max(jnp.abs(force), -1, keepdims=True)
            nonzero = fmax > 0.0
            fdir = jnp.where(nonzero, force / jnp.where(nonzero, fmax, 1.0), 0.0)
            fnorm = jnp.sqrt(jnp.sum(fdir**2, -1, keepdims=True))
            ok = fnorm > 0.0
            unit = jnp.where(ok, fdir / jnp.where(ok, fnorm, 1.0), 0.0)
            step_len = jnp.minimum(fmax * fnorm * 1e-4, max_disp)
            pos = st.pos + jnp.where(st.active[:, None],
                                     unit * step_len, 0.0)
            shift = jnp.floor(pos / st.box).astype(jnp.int32)
            pos = pos - shift.astype(pos.dtype) * st.box
            return dataclasses.replace(st, pos=pos)

        return jax.lax.fori_loop(0, n_steps, body, st)

    done = 0
    while done < steps:
        n_steps = min(chunk, steps - done)
        state = descend(state, n_steps)
        done += n_steps
    # Maxwell-Boltzmann velocities at the target temperature
    tgt = float(spec.kT) if kT is None else kT
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, state.vel.shape, state.vel.dtype)
    v = v * jnp.sqrt(tgt / state.mass)[:, None]
    v = jnp.where(state.active[:, None], v, 0.0)
    mtot = jnp.sum(jnp.where(state.active, state.mass, 0.0))
    v = v - jnp.sum(state.mass[:, None] * v, 0) / mtot
    v = jnp.where(state.active[:, None], v, 0.0)   # keep padding rows at rest
    state = dataclasses.replace(state, vel=v, step=jnp.asarray(0, jnp.int32))
    return runner.initial_forces(spec, cfg, state)


def generate_example(out_dir: str, n_mols: int = 2000, density: float = 0.27,
                     kT: float = 1.0, seed: int = 11, equilibrate: int = 500):
    """Write a complete runnable example (the reference's polymer_melt.py
    workflow: generate chains, warm up, write conf.gro + topol.top + cfg)."""
    import os

    import jax

    from . import writers
    from .engine import runner

    os.makedirs(out_dir, exist_ok=True)
    built, systop, coords = build_melt(n_mols, density, kT=kT, seed=seed,
                                       reactive=False)
    st = runner.initial_forces(built.spec, built.cfg, built.state)
    st = warmup(built, st, steps=max(equilibrate, 100), kT=kT)
    st = runner.run_block(built.spec, built.cfg, st, equilibrate)
    jax.block_until_ready(st.pos)
    out = writers.state_to_coordinates(st, systop, coords)
    files_io.write_gro(os.path.join(out_dir, "conf.gro"), out, backup=False)
    with open(os.path.join(out_dir, "topol.top"), "w") as f:
        f.write(_melt_topology_text(n_mols))
    with open(os.path.join(out_dir, "atrp.cfg"), "w") as f:
        f.write(ATRP_CFG_TEXT)
    return out_dir


def _main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="chemlab-genmelt",
                                description="generate an equilibrated ATRP "
                                            "melt example directory")
    p.add_argument("out_dir")
    p.add_argument("--n_mols", type=int, default=2000)
    p.add_argument("--density", type=float, default=0.27)
    p.add_argument("--kT", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=11)
    a = p.parse_args(argv)
    generate_example(a.out_dir, a.n_mols, a.density, a.kT, a.seed)
    print("wrote %s" % a.out_dir)
    return 0


def activate_initiators(built, systop, state, n: int = 20, seed: int = 1):
    """Flip n MA monomers to FA radicals in state 3 (the hooks.py step)."""
    import dataclasses

    import jax.numpy as jnp

    tsym = systop.atomsym_atomtype
    rng = np.random.RandomState(seed)
    rows = np.where((np.asarray(state.type_id) == tsym["MA"])
                    & np.asarray(state.active))[0]
    picks = rng.choice(rows, n, replace=False)
    tid = np.array(state.type_id)
    tid[picks] = tsym["FA"]
    chem = np.array(state.chem_state)
    chem[picks] = 3
    return dataclasses.replace(state, type_id=jnp.asarray(tid),
                               chem_state=jnp.asarray(chem),
                               reactions_on=jnp.asarray(True))


if __name__ == "__main__":
    import sys

    sys.exit(_main())
