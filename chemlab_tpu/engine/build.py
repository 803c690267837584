"""System assembly: SystemTopology + Coordinates (+ reactions) -> device arrays.

This is the TPU analog of the reference's whole setup phase
(start_simulation.py:90-441 + gromacs_topology.py set_*_interactions +
reaction_setup.py): instead of instantiating ~40 engine objects, everything
is lowered into the EngineConfig / SimSpec / MDState triplet.

Fidelity notes:
  - LJ mixing uses the *raw* [ atomtypes ] columns exactly as the reference
    does (combination() over the unconverted values;
    ref: gromacs_topology.py:679-681) so step-0 energies match.
  - nonbonded func codes 1,8,9,10,11,12,13,14,15,16,17 are lowered; 18 is
    a no-op exactly like the reference (ref: gromacs_topology.py:880-881).
  - nb-table index 0 is a reserved all-zero table (the "no potential matched"
    target for MultiTabulated ranges without a default).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import files_io
from ..topology import SystemTopology, combine_lj
from . import neighbor, reaction_compile, tables
from .spec import (MIX_MULTIRANGE, MIX_OBS, MIX_STATIC, PAIR_LJ,
                   PAIR_TAB, EngineConfig, SimSpec)
from .state import N_BOND_PARAMS, MDState, TermTable

logger = logging.getLogger(__name__)

F32 = np.float32
I32 = np.int32


@dataclasses.dataclass
class SimOptions:
    """Engine-relevant simulation options (subset of the ~70 CLI flags)."""

    lj_cutoff: float = 1.2
    cg_cutoff: float = 1.4
    coulomb_cutoff: float = 0.0
    skin: float = 0.16
    dt: float = 0.001
    kT: float = 1.0                 # temperature in energy units
    thermostat: str = "lv"
    thermostat_gamma: float = 5.0
    barostat: str = "no"
    pressure: float = 0.0
    barostat_tau: float = 5.0
    barostat_gammaP: float = 1.0
    barostat_mass: float = 50.0
    max_force: float = -1.0
    fudge_qq: float | None = None   # defaults from topology [ defaults ]
    table_groups: tuple = ()
    thermal_groups: tuple = ()
    rng_seed: int = 12345
    gen_velocity: bool = False
    mass_factor: float = 1.0        # amu conversion in the velocity draw
                                    # (ref: start_simulation.py:139-146)
    store_pressure: bool = False
    t_hybrid_bond: int = 0
    t_hybrid_angle: int = 0
    t_hybrid_dihedral: int = 0
    exclude_new_bonds: bool = True
    table_dirs: tuple = (".",)
    output_prefix: str = "sim"
    # capacities / shapes (None = auto)
    n_bins: int = 4096
    max_neighbors: int | None = None
    cell_cap: int | None = None
    deg_cap: int = 8
    excl_cap: int | None = None     # None = 2x observed max + headroom
    extra_bonds: int | None = None
    extra_angles: int | None = None
    extra_dihedrals: int | None = None
    max_events: int = 128
    dtype: str = "float32"
    validate_tables: bool = False   # log per-table resampling error report
    use_pallas: bool | None = None   # None = env CHEMLAB_PALLAS=1
    bonded_dense: bool | None = None  # None = on unless CHEMLAB_BONDED=
                                      # gather; chain terms on rolled
                                      # planes (bonded_dense.py)
    excl_dense: bool | None = None    # None = env CHEMLAB_EXCL=dense;
                                      # chain exclusions on rolled planes
                                      # (excl_dense.py; pallas path only)
    slab_devices: int = 0  # >1: round the cell grid's x-layer count down to
                           # a multiple so the ppermute halo slab DD
                           # (pallas_halo.py) divides it; 0 = env
                           # CHEMLAB_HALO_DEVICES or off


class ObsRegistry:
    """Conversion-observable registry, keyed like the reference's cr_observs
    dict ((type, total, state); ref: start_simulation.py:481-489)."""

    def __init__(self):
        self.keys = []
        self.entries = []   # (obs_idx, type_id, state)
        self.totals = []

    def register(self, type_states, total) -> int:
        """type_states: list of (type_id, state_or_None)."""
        key = (tuple(type_states), total)
        if key in self.keys:
            return self.keys.index(key)
        idx = len(self.keys)
        self.keys.append(key)
        self.totals.append(float(total))
        for tid, st in type_states:
            self.entries.append((idx, tid, -1 if st is None else st))
        return idx

    def label(self, idx: int) -> str:
        type_states, _ = self.keys[idx]
        parts = "_".join(str(t) for t, _ in type_states)
        states = [s for _, s in type_states if s is not None]
        return "cr_%s%s" % (parts, "_%d" % states[0] if states else "")

    def arrays(self):
        n = max(len(self.keys), 1)
        if not self.entries:
            return (np.zeros(1, I32), np.zeros(1, I32), np.full(1, -1, I32),
                    np.ones(n, F32))
        return (
            np.asarray([e[0] for e in self.entries], I32),
            np.asarray([e[1] for e in self.entries], I32),
            np.asarray([e[2] for e in self.entries], I32),
            np.asarray(self.totals, F32),
        )


def _pack_bond_params(func, fields, bond_tb, table_dirs):
    """Raw .top bond fields -> engine param vector (ref: gromacs_topology.py:916-947)."""
    p = np.zeros(N_BOND_PARAMS, F32)
    f = [float(x) for x in fields] if func != 8 else fields
    if func == 1:
        p[0] = f[1] / 2.0   # GROMACS K -> U = K/2 (r-r0)^2
        p[1] = f[0]
    elif func == 7:
        p[0] = f[1]
        p[1] = 0.0
        p[2] = f[0]
    elif func == 8:
        name = files_io.resolve_table("table_b%d" % int(float(fields[0])), table_dirs)
        r, e, fr, _ = files_io.read_table(name, kind="bond")
        p[0] = bond_tb.add(name, r, e, fr)
    elif func == 9:
        p[0] = f[1]
        p[1] = 0.0
        p[2] = f[0]
        p[3] = f[2]
        p[4] = f[3]
    else:
        raise NotImplementedError("bond func %d" % func)
    return p


def _pack_angle_params(func, fields, angle_tb, table_dirs):
    """(ref: gromacs_topology.py:1071-1083)"""
    p = np.zeros(N_BOND_PARAMS, F32)
    if func == 1:
        p[0] = float(fields[1]) / 2.0
        p[1] = math.radians(float(fields[0]))
    elif func == 8:
        name = files_io.resolve_table("table_a%d" % int(float(fields[0])), table_dirs)
        r, e, fr, _ = files_io.read_table(name, kind="angle")
        p[0] = angle_tb.add(name, r, e, fr)
    elif func == 11:
        p[0] = float(fields[1])
        p[1] = math.radians(float(fields[0]))
    else:
        raise NotImplementedError("angle func %d" % func)
    return p


def _pack_dihedral_params(func, fields, dih_tb, table_dirs):
    """(ref: gromacs_topology.py:1184-1204)"""
    p = np.zeros(N_BOND_PARAMS, F32)
    if func == 1:
        p[0] = float(fields[1])
        p[1] = math.radians(float(fields[0]))
        p[2] = float(fields[2]) if len(fields) > 2 else 1.0
    elif func == 3:
        vals = [float(x) for x in fields][-6:]
        p[: len(vals)] = vals
    elif func == 8:
        name = files_io.resolve_table("table_d%d" % int(float(fields[0])), table_dirs)
        r, e, fr, _ = files_io.read_table(name, kind="dihedral")
        p[0] = dih_tb.add(name, r, e, fr)
    elif func == 12:
        p[0] = float(fields[1])
        p[1] = math.radians(float(fields[0]))
    else:
        raise NotImplementedError("dihedral func %d" % func)
    return p


_PACKERS = {
    "bond": _pack_bond_params,
    "angle": _pack_angle_params,
    "dihedral": _pack_dihedral_params,
}


def _load_nb_table(name, nb_tb, table_dirs):
    path = files_io.resolve_table(name, table_dirs)
    r, e, f, _ = files_io.read_table(path, kind="nonbonded")
    return nb_tb.add(path, r, e, f)


def _load_auto_nb_table(s1, s2, nb_tb, table_dirs):
    """Auto filename table_T1_T2 — the reference stores pair keys sorted, so
    published files may use either symbol order; try both."""
    try:
        return _load_nb_table("table_%s_%s" % (s1, s2), nb_tb, table_dirs)
    except FileNotFoundError:
        return _load_nb_table("table_%s_%s" % (s2, s1), nb_tb, table_dirs)


def _build_pair_tables(systop: SystemTopology, opts: SimOptions, nb_tb, obs: ObsRegistry):
    """Lower [ nonbond_params ] + defaults into per-type-pair dispatch arrays
    (ref: gromacs_topology.py:463-899)."""
    T = systop.next_type_id
    n2 = T * T
    out = {
        "pair_kind": np.zeros(n2, I32),
        "pair_sig": np.zeros(n2, F32),
        "pair_eps": np.zeros(n2, F32),
        "pair_cutoff2": np.zeros(n2, F32),
        "pair_shift": np.zeros(n2, F32),
        "pair_caprad": np.zeros(n2, F32),
        "pair_tab_a": np.zeros(n2, I32),
        "pair_tab_b": np.zeros(n2, I32),
        "pair_mix_mode": np.zeros(n2, I32),
        "pair_mix_x": np.ones(n2, F32),
        "pair_obs": np.zeros(n2, I32),
        "pair_lam_scale": np.zeros(n2, bool),
        "pair_max_force": np.full(n2, -1.0, F32),
        "pair_pps_incr": np.zeros(n2, F32),
    }
    mix_entries = []  # (pair_flat, lo, hi, tab_a, tab_b, obs, default)

    cr = systop.defaults["combinationrule"]
    atomtypes = systop.top.atomtypes
    sym2id = systop.atomsym_atomtype
    tab_groups = set(opts.table_groups or ())
    lj_cut, tab_cut = opts.lj_cutoff, opts.cg_cutoff

    def flat(t1, t2):
        return [t1 * T + t2, t2 * T + t1]

    def set_pair(t1, t2, **kw):
        for p in flat(t1, t2):
            for k, v in kw.items():
                out["pair_%s" % k][p] = v

    def lj_shift(sig, eps, rc):
        if eps == 0.0 or sig <= 0.0:
            return 0.0
        sr6 = (sig / rc) ** 6
        return 4.0 * eps * (sr6 * sr6 - sr6)

    def raw_combination(s1, s2):
        # reference quirk: combination over unconverted atomtypes columns
        a, b = atomtypes.get(s1), atomtypes.get(s2)
        if a is None or b is None:
            return -1.0, -1.0
        return combine_lj(a["sigma"], a["epsilon"], b["sigma"], b["epsilon"], cr)

    def register_obs(type_sym, total):
        return obs.register([(sym2id[type_sym], None)], int(total))

    syms = sorted(sym2id, key=sym2id.get)
    for i1, s1 in enumerate(syms):
        for s2 in syms[i1:]:
            t1, t2 = sym2id[s1], sym2id[s2]
            param = systop.top.nonbond_params.get(tuple(sorted((s1, s2))))
            if param is None:
                if s1 in tab_groups and s2 in tab_groups:
                    tab = _load_auto_nb_table(s1, s2, nb_tb, opts.table_dirs)
                    set_pair(t1, t2, kind=PAIR_TAB, tab_a=tab, tab_b=tab,
                             cutoff2=tab_cut**2)
                else:
                    sig, eps = raw_combination(s1, s2)
                    if sig > 0.0:
                        set_pair(t1, t2, kind=PAIR_LJ, sig=sig, eps=eps,
                                 cutoff2=lj_cut**2, shift=lj_shift(sig, eps, lj_cut))
                continue

            func, pp = param["func"], param["params"]
            if func == 1:
                if pp:
                    sig, eps = float(pp[0]), float(pp[1])
                else:
                    sig, eps = raw_combination(s1, s2)
                if sig > 0.0:
                    set_pair(t1, t2, kind=PAIR_LJ, sig=sig, eps=eps,
                             cutoff2=lj_cut**2, shift=lj_shift(sig, eps, lj_cut))
            elif func == 8:
                if pp:
                    tab = _load_nb_table(pp[0], nb_tb, opts.table_dirs)
                else:
                    tab = _load_auto_nb_table(s1, s2, nb_tb, opts.table_dirs)
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=tab, tab_b=tab, cutoff2=tab_cut**2)
            elif func == 9:
                # conversion-switched MultiTabulated (ref: :556-573,724-739)
                tab = _load_nb_table(pp[0], nb_tb, opts.table_dirs)
                o = register_obs(pp[1], int(pp[2]))
                lo, hi = float(pp[3]), float(pp[4])
                default = bool(int(pp[5])) if len(pp) > 5 else False
                for p in flat(t1, t2):
                    mix_entries.append((p, lo, hi, tab, tab, o, default))
                base = tab if default else 0
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=base, tab_b=base,
                         cutoff2=tab_cut**2, mix_mode=MIX_MULTIRANGE)
            elif func == 10:
                ta = _load_nb_table(pp[0], nb_tb, opts.table_dirs)
                tb_ = _load_nb_table(pp[1], nb_tb, opts.table_dirs)
                o = register_obs(pp[2], int(pp[3]))
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=ta, tab_b=tb_,
                         cutoff2=tab_cut**2, mix_mode=MIX_OBS, obs=o)
            elif func == 11:
                mf = float(pp[1]) if len(pp) > 1 else -1.0
                if pp:
                    tab = _load_nb_table(pp[0], nb_tb, opts.table_dirs)
                else:
                    tab = _load_auto_nb_table(s1, s2, nb_tb, opts.table_dirs)
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=tab, tab_b=tab,
                         cutoff2=tab_cut**2, lam_scale=True, max_force=mf)
            elif func == 12:
                ta = _load_nb_table(pp[0], nb_tb, opts.table_dirs)
                tb_ = _load_nb_table(pp[1], nb_tb, opts.table_dirs)
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=ta, tab_b=tb_,
                         cutoff2=tab_cut**2, mix_mode=MIX_STATIC, mix_x=float(pp[2]))
            elif func == 13:
                tab = _load_nb_table(pp[0], nb_tb, opts.table_dirs)
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=tab, tab_b=tab,
                         cutoff2=tab_cut**2, caprad=float(pp[1]))
            elif func == 14:
                # ParticlePairScaling: new neighbor pairs fade in with a
                # per-step scale ramp (ref: gromacs_topology.py:622-631,792-817)
                tab = _load_nb_table(pp[0], nb_tb, opts.table_dirs)
                incr = float(pp[1])
                mf = float(pp[2]) if len(pp) > 2 else -1.0
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=tab, tab_b=tab,
                         cutoff2=tab_cut**2, max_force=mf, pps_incr=incr)
            elif func == 15:
                mf = -1.0
                if pp and len(pp) == 1:
                    mf = float(pp[0])
                    sig, eps = raw_combination(s1, s2)
                elif pp:
                    sig, eps = float(pp[0]), float(pp[1])
                    if len(pp) == 3:
                        mf = float(pp[2])
                else:
                    sig, eps = raw_combination(s1, s2)
                set_pair(t1, t2, kind=PAIR_LJ, sig=sig, eps=eps, cutoff2=lj_cut**2,
                         shift=lj_shift(sig, eps, lj_cut), lam_scale=True, max_force=mf)
            elif func == 16:
                if len(pp) == 1:
                    cap = float(pp[0])
                    sig, eps = raw_combination(s1, s2)
                else:
                    sig, eps, cap = float(pp[0]), float(pp[1]), float(pp[2])
                set_pair(t1, t2, kind=PAIR_LJ, sig=sig, eps=eps, cutoff2=lj_cut**2,
                         shift=lj_shift(sig, eps, lj_cut), caprad=cap)
            elif func == 17:
                o = register_obs(pp[0], int(pp[1]))
                for spec_str in pp[2:]:
                    t = spec_str.split(":")
                    lo, hi = float(t[0]), float(t[1])
                    ta = _load_nb_table(t[2], nb_tb, opts.table_dirs)
                    tb_ = _load_nb_table(t[3], nb_tb, opts.table_dirs)
                    for p in flat(t1, t2):
                        mix_entries.append((p, lo, hi, ta, tb_, o, False))
                set_pair(t1, t2, kind=PAIR_TAB, tab_a=0, tab_b=0,
                         cutoff2=tab_cut**2, mix_mode=MIX_MULTIRANGE)
            elif func == 18:
                logger.warning("func 18 (connectivity-scaled) is a no-op, as in the "
                               "reference")
            else:
                raise ValueError("nonbonded func %d not supported" % func)

    return out, mix_entries


def _pallas_enabled(opts, pair_arrays, qq_pref, cell_dims,
                    n_mix: int = 0) -> tuple:
    """Gate the pallas cell-tile pair kernel: explicit/env opt-in AND the
    system's nonbonded physics fits the kernel's scope.

    Returns (use_pallas, cheb_candidate): ``cheb_candidate`` means the
    system is tabulated and kernel-eligible PROVIDED the per-table Chebyshev
    fits validate (tab_cheb.fit_stack, run after the table stack is built);
    the caller must fall back to the XLA row path if they don't.
    """
    import os as _os

    want = opts.use_pallas
    if want is None:
        env = _os.environ.get("CHEMLAB_PALLAS")
        if env is not None:
            want = env == "1"
        else:
            # default: fast path on TPU, row path elsewhere (interpret-mode
            # pallas is slower than XLA on CPU)
            want = jax.default_backend() == "tpu"
    if not want:
        return False, False
    from . import pallas_pair

    if qq_pref > 0:
        logger.warning("pallas pair kernel disabled: coulomb not supported")
        return False, False
    if pallas_pair.supports(None, pair_arrays):
        return True, False
    # tabulated systems ride the colt2 kernel via Chebyshev-compressed
    # tables (tab_cheb.py) when the geometry admits colt2 (full 27-stencil,
    # cap % 8) and no per-pair feature outside the cheb scope is present
    if (n_mix == 0 and pallas_pair.supports_cheb(pair_arrays)
            and min(int(d) for d in cell_dims) >= 3
            and (opts.cell_cap is None or opts.cell_cap % 8 == 0)):
        return True, True
    logger.warning("pallas pair kernel disabled: unsupported pair variant "
                   "(mixing/caps/lambda/pps) or colt2-ineligible geometry")
    return False, False


def _host_components(n, bonds):
    """Connected components over bonds -> molecule ids (union-find)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for i, j in bonds:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    return np.asarray([find(i) for i in range(n)], dtype=I32)


def _round_up(x, m):
    return int(-(-x // m) * m)


NEIGHBOR_CAP_FIELDS = ("max_neighbors", "cell_cap", "excl_cap",
                       "rx_cell_cap", "rx_k", "rx_rows_cap")


def apply_neighbor_caps(cfg: EngineConfig, spec: SimSpec, state, caps: dict):
    """Re-derive EngineConfig with explicit neighbor capacities and rebuild
    the neighbor scratch to match (checkpoint restore into a fresh build
    whose caps differ from the run that wrote the checkpoint)."""
    cfg = dataclasses.replace(cfg, **caps)
    return _rebuild_neighbor_scratch(cfg, spec, state)


def grow_neighbor_caps(cfg: EngineConfig, spec: SimSpec, state, factor: float = 1.5):
    """Adaptive capacity regrowth after an overflow flag.

    The reference engine reallocates its cell/Verlet structures freely; with
    static shapes we instead re-derive a bigger EngineConfig (forcing a
    re-jit, which is rare) and rebuild the neighbor state with the sticky
    overflow flag cleared.  Returns (cfg, state).
    """
    cfg = dataclasses.replace(
        cfg,
        **{f: _round_up(int(getattr(cfg, f) * factor), 8)
           for f in NEIGHBOR_CAP_FIELDS})
    return _rebuild_neighbor_scratch(cfg, spec, state)


def shrink_neighbor_caps(cfg: EngineConfig, spec: SimSpec, state,
                         margin: float = 1.4):
    """Tighten neighbor capacities to the OBSERVED equilibrated occupancy.

    The build sizes ``cell_cap`` (and friends) from the initial coordinates;
    packed/synthetic starts can be 3-5x denser locally than the equilibrated
    fluid, and every rebuild plane is (N, 27*cell_cap) wide while the pallas
    kernel tile is (cell_cap, 27*cell_cap) — the measured ~5x tile padding of
    TPU_NUMBERS_r02.  After equilibration, re-derive the caps from a fresh
    binning/row build at the current state (x ``margin``, rounded up to 8,
    never growing); overflow + :func:`grow_neighbor_caps` remains the
    backstop for later densification.  The espressopp analog is tuneSkin's
    post-equilibration retuning (ref: start_simulation.py:716-721) applied
    to capacities instead of the skin.  Returns (cfg, state) — a changed cfg
    forces one re-jit.
    """
    import jax.numpy as jnp

    rc_skin = float(jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin)
    buckets, _, _, _ = neighbor.build_cell_buckets(
        state.pos, state.box, state.active, cfg.cell_dims, cfg.cell_cap)
    occ = int(jnp.max(jnp.sum((buckets[:-1] >= 0).astype(jnp.int32), axis=1)))
    nbr = neighbor.build_neighbor_state(
        state.pos, state.box, state.active, state.excl, rc_skin,
        dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
        max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap)
    self_idx = jnp.arange(state.pos.shape[0], dtype=jnp.int32)[:, None]
    kmax = int(jnp.max(jnp.sum((nbr.idx != self_idx).astype(jnp.int32),
                               axis=1)))

    caps = {}
    # cell_cap margin is ADDITIVE, not multiplicative: kernel candidate
    # lanes are 27*cell_cap wide, so every margin slot costs 27 lanes per
    # packet, and the occupancy MAX over ~10^4 cells already absorbs the
    # Poisson tail — +25% (floor +4) covers reactive densification between
    # retunes while overflow+grow_neighbor_caps remains the backstop.
    # (ROOFLINE_r05.md: the old x1.4 margin held cap at 40 against a
    # measured max occupancy of 25 — 37% pure padding in every window.)
    new_cell = _round_up(max(occ + max(4, (occ + 3) // 4), 8), 8)
    if new_cell < cfg.cell_cap and not bool(nbr.overflow):
        caps["cell_cap"] = new_cell
    # K saturated at the current cap means the true count is unknown — skip
    if kmax < cfg.max_neighbors:
        new_k = _round_up(max(int(kmax * margin) + 4, 16), 8)
        if new_k < cfg.max_neighbors:
            caps["max_neighbors"] = new_k
    if "cell_cap" in caps and cfg.rx_rc > 0:
        # rx grid caps scale with the force-grid occupancy (same fluid)
        rx_vol = float(np.prod(np.asarray(state.box) /
                               np.asarray(cfg.rx_dims)))
        vol = float(np.prod(np.asarray(state.box) /
                            np.asarray(cfg.cell_dims)))
        new_rx = _round_up(max(int(caps["cell_cap"] * rx_vol / vol) + 4, 8), 8)
        if new_rx < cfg.rx_cell_cap:
            caps["rx_cell_cap"] = new_rx
    if not caps:
        return cfg, state
    cfg = dataclasses.replace(cfg, **caps)
    return _rebuild_neighbor_scratch(cfg, spec, state)


def _rebuild_neighbor_scratch(cfg: EngineConfig, spec: SimSpec, state):
    import jax.numpy as jnp

    rc_skin = jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin
    nbr = neighbor.build_neighbor_state(
        state.pos, state.box, state.active, state.excl, rc_skin,
        dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
        max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap,
        track_birth=cfg.has_pps, prev=None, step=state.step)
    nbr = dataclasses.replace(nbr, n_rebuilds=state.nbr.n_rebuilds + 1)
    return cfg, dataclasses.replace(state, nbr=nbr)


TERM_CAP_FIELDS = ("bond_cap", "angle_cap", "dihedral_cap")


def _repad_term_table(table, new_cap: int):
    """Grow a TermTable to ``new_cap`` rows, preserving contents and cursor."""
    import jax.numpy as jnp

    cap = table.idx.shape[0]
    if new_cap == cap:
        return table
    if new_cap < cap:
        # shrink (checkpoint-restore template re-pad): only padding may be cut
        if bool((table.idx[new_cap:, 0] >= 0).any()):
            raise ValueError("term table shrink %d -> %d would drop valid rows"
                             % (cap, new_cap))
        return jax.tree_util.tree_map(
            lambda a: a if a.ndim == 0 else a[:new_cap], table)
    pad = new_cap - cap
    return dataclasses.replace(
        table,
        idx=jnp.concatenate([table.idx, jnp.full((pad, table.idx.shape[1]), -1,
                                                 jnp.int32)]),
        func=jnp.concatenate([table.func, jnp.zeros(pad, jnp.int32)]),
        params=jnp.concatenate([table.params,
                                jnp.zeros((pad, table.params.shape[1]),
                                          jnp.float32)]),
        typelookup=jnp.concatenate([table.typelookup,
                                    jnp.zeros(pad, bool)]),
        lam=jnp.concatenate([table.lam, jnp.ones(pad, jnp.float32)]),
        group=jnp.concatenate([table.group, jnp.full(pad, -1, jnp.int32)]),
    )


def apply_term_caps(cfg: EngineConfig, state, caps: dict,
                    excl_pair_cap: int | None = None):
    """Re-pad the dynamic term tables (and optionally the exclusion pair
    list) to explicit capacities, clearing the sticky overflow flag.
    Used by overflow regrowth and by checkpoint restore into a fresh build
    whose derived caps are smaller.  Returns (cfg, state)."""
    import jax.numpy as jnp

    if cfg.bonded_dense:
        # lockstep invariant (bonded_dense.rederive): the irregular caps
        # track the canonical caps' deltas so irr_cap - (cap -
        # n_aligned_static) never shrinks.  A caller with irregular-count
        # telemetry (measure_cheap's n_bonds_irr/n_angles_irr) may pass
        # explicit irr caps instead — canonical padding rows are dead and
        # can never become irregular, so rate-based irr sizing is as safe
        # as rate-based canonical sizing, and far cheaper per step (every
        # padded irr row rides the per-step gather/scatter path).
        caps = dict(caps)
        if "bond_cap" in caps and "bond_irr_cap" not in caps:
            caps["bond_irr_cap"] = max(
                cfg.bond_irr_cap + caps["bond_cap"] - cfg.bond_cap, 128)
        if "angle_cap" in caps and "angle_irr_cap" not in caps:
            caps["angle_irr_cap"] = max(
                cfg.angle_irr_cap + caps["angle_cap"] - cfg.angle_cap, 128)
    if (cfg.excl_offsets and excl_pair_cap is not None
            and "excl_irr_cap" not in caps):
        # same lockstep invariant for the dense-static exclusion remainder:
        # irr_cap = excl_cap - covered_at_build stays an upper bound on the
        # irregular count (appends either match a mask offset or consume
        # irr and flat headroom together; see excl_dense.py)
        caps = dict(caps)
        caps["excl_irr_cap"] = max(
            cfg.excl_irr_cap + excl_pair_cap - state.excl.shape[0], 128)
    cfg = dataclasses.replace(cfg, **caps)
    state = dataclasses.replace(
        state,
        bonds=_repad_term_table(state.bonds, cfg.bond_cap),
        angles=_repad_term_table(state.angles, cfg.angle_cap),
        dihedrals=_repad_term_table(state.dihedrals, cfg.dihedral_cap),
    )
    if cfg.bonded_dense:
        from . import bonded_dense

        state = bonded_dense.rederive(cfg, state)
    if excl_pair_cap is not None and excl_pair_cap != state.excl.shape[0]:
        if excl_pair_cap < state.excl.shape[0]:
            if bool((state.excl[excl_pair_cap:, 0] >= 0).any()):
                raise ValueError("exclusion list shrink would drop pairs")
            state = dataclasses.replace(state,
                                        excl=state.excl[:excl_pair_cap])
        else:
            pad = excl_pair_cap - state.excl.shape[0]
            state = dataclasses.replace(
                state, excl=jnp.concatenate(
                    [state.excl, jnp.full((pad, 2), -1, jnp.int32)]))
    state = dataclasses.replace(
        state, nbr=dataclasses.replace(state.nbr,
                                       overflow=jnp.asarray(False)))
    if cfg.excl_offsets:
        # re-derive the dense-exclusion operands AFTER the sticky-flag
        # clear so a genuine irr overflow at the new caps survives it
        from . import excl_dense

        state = excl_dense.rederive(cfg, state)
    return cfg, state


def _term_headroom_floor(cap: int) -> int:
    """Minimum free rows a term table should keep before proactive regrowth.

    Absolute-remaining based, NOT a fraction of capacity: a 100k-particle
    static topology legitimately sits at ~95% of its build cap (the cap is
    occupancy + a thin reactive slice), and a fractional trigger regrows it
    on the first check even though thousands of free rows remain — the
    round-4 soak measured exactly that flip-flop (shrink to 68352, regrow
    to 102528 at step 1000).  The 512 ceiling keeps the floor at or below
    the build's own reactive slice (``extra_bonds`` >= max(n/32, 512)),
    so freshly built or freshly shrunk caps never trip the trigger.
    Floor never drops below 8 rows: one reaction event can append several
    terms (a bond plus its generated angles), so a table within a handful
    of rows of capacity must fire regardless of how small the cap is
    (test-scale systems shrink caps under 64, where cap//8 rounds to 0 and
    the trigger would otherwise stay silent until overflow)."""
    return max(min(512, cap // 8), cap // 64, 8)


def term_caps_near_full(cfg: EngineConfig, counts: dict,
                        prev_counts: dict | None = None) -> bool:
    """True when any dynamic term table (or the exclusion pair list) is
    within its headroom floor of capacity — the driver grows proactively so
    reaction events are never dropped at the cap (the reference's lists
    reallocate freely).

    With ``prev_counts`` (the previous block's counts dict) the check is
    RATE-AWARE: the floor is raised to 2x the appends observed in the last
    block, so a fast-reacting system (round-4 soak: ~2k new angles per 1k
    steps at 100k) grows before a single block can overrun the cap."""
    def low(key, cap):
        count = counts.get(key, 0)
        need = _term_headroom_floor(cap)
        if prev_counts is not None:
            need = max(need, 2 * (count - prev_counts.get(key, count)))
        return cap - count < need

    return (low("n_bonds", cfg.bond_cap)
            or low("n_angles", cfg.angle_cap)
            or low("n_dihedrals", cfg.dihedral_cap)
            or low("n_excl", counts.get("excl_pair_cap", 1 << 30))
            # irregular bonded tables (dense-static path): rate-sized irr
            # caps need the same proactive trigger, or an overflow would
            # silently drop terms until the sticky flag is caught
            or ("n_bonds_irr" in counts and low("n_bonds_irr",
                                                cfg.bond_irr_cap))
            or ("n_angles_irr" in counts and low("n_angles_irr",
                                                 cfg.angle_irr_cap))
            or ("n_excl_irr" in counts and low("n_excl_irr",
                                               cfg.excl_irr_cap)))


def shrink_term_caps(cfg: EngineConfig, state, headroom: int | None = None):
    """Tighten the bonded term tables + exclusion pair list to the OBSERVED
    occupancy (the term-table analog of :func:`shrink_neighbor_caps`).

    Build-time caps carry reactive headroom (``extra_bonds`` and friends);
    every padded row costs a 16-byte-row gather forward and a scatter-add
    row backward in the per-step bonded pass (scripts/bonded_profile.py:
    at 100k the angle padding alone is ~38k of 279k gather rows).  After
    equilibration the append cursors are known, so re-pad each table down
    to cursor + a thin headroom; ``term_caps_near_full`` + proactive
    :func:`grow_term_caps` in the block loop regrow as conversion
    proceeds.  Shrink-only (a table above its derived target is left
    alone).  Returns (cfg, state); a changed cfg forces one re-jit.
    """
    def target(count, hr, cur_cap):
        # must clear the proactive-regrow trigger (2x the headroom floor at
        # the NEW cap) with slack, or the first block-loop check undoes the
        # shrink at 1.5x — measured flip-flop in the round-4 soak
        t0 = max(count + (headroom if headroom is not None else hr), 128)
        t0 = max(t0, count + 2 * _term_headroom_floor(t0) + 256)
        if cfg.has_reactions and headroom is None:
            # an actively reacting system fills its tables for real (the
            # round-4 soak measured ~1k new bonds + 2k new angles per 1k
            # steps at 100k): keep at least half the existing free slice
            # so one reaction interval can never outrun the next
            # block-boundary capacity check (an explicit headroom
            # overrides — the caller owns the margin, and shrink stays
            # idempotent at a fixed headroom)
            t0 = max(t0, count + (cur_cap - count) // 2)
        return _round_up(t0, 128)

    hr = max(2048, cfg.n_particles // 32)
    tables = {"bond_cap": state.bonds, "angle_cap": state.angles,
              "dihedral_cap": state.dihedrals}
    caps = {}
    for f, table in tables.items():
        # the cursor bounds live rows; rows past it are -1 padding
        tgt = target(int(table.count), hr, getattr(cfg, f))
        if tgt < getattr(cfg, f):
            caps[f] = tgt
    excl_new = None
    excl_tgt = target(int(state.n_excl), 2 * hr, state.excl.shape[0])
    if excl_tgt < state.excl.shape[0]:
        excl_new = excl_tgt
    if not caps and excl_new is None:
        return cfg, state
    return apply_term_caps(cfg, state, caps, excl_new)


def grow_term_caps(cfg: EngineConfig, state, factor: float = 1.5,
                   counts: dict | None = None,
                   prev_counts: dict | None = None):
    """Adaptive regrowth of the bonded term tables + exclusion pair list
    (the TopologyManager-side analog of :func:`grow_neighbor_caps`).

    With ``counts`` (the measure/measure_cheap occupancy dict), only the
    tables within 2x their headroom floor of capacity grow — every padded
    term row costs gathers + AD scatters per step, so inflating a
    half-empty table alongside the saturated one taxes the whole rest of
    the run (a 1.5x all-tables regrowth measured ~15% sustained pps loss
    at 100k).  Without ``counts`` everything grows.  Returns
    (cfg, state); the changed cfg forces one re-jit."""
    count_key = {"bond_cap": "n_bonds", "angle_cap": "n_angles",
                 "dihedral_cap": "n_dihedrals"}

    def need(key, cap):
        n = 2 * _term_headroom_floor(cap)
        if prev_counts is not None and counts is not None:
            n = max(n, 4 * (counts.get(key, 0)
                            - prev_counts.get(key, counts.get(key, 0))))
        return n

    caps = {}
    for f in TERM_CAP_FIELDS:
        cur = getattr(cfg, f)
        if counts is None or cur - counts.get(count_key[f], 0) < \
                need(count_key[f], cur):
            caps[f] = _round_up(int(max(cur, 128) * factor), 128)
    if cfg.bonded_dense and counts is not None and "n_bonds_irr" in counts:
        # irregular-count telemetry available: size the irr caps on their
        # own occupancy instead of the lockstep worst case (apply_term_caps
        # honors explicit irr caps) — padded irr rows are per-step cost
        for irr_f, key in (("bond_irr_cap", "n_bonds_irr"),
                           ("angle_irr_cap", "n_angles_irr")):
            cur = getattr(cfg, irr_f)
            grown = _round_up(int(max(cur, 128) * factor), 128) \
                if cur - counts.get(key, 0) < need(key, cur) else cur
            caps[irr_f] = grown
    excl_new = None
    excl_cap = state.excl.shape[0]
    if (counts is None or excl_cap - counts.get("n_excl", 0)
            < need("n_excl", excl_cap)):
        excl_new = _round_up(int(max(excl_cap, 128) * factor), 128)
    if cfg.excl_offsets and counts is not None and "n_excl_irr" in counts:
        cur = cfg.excl_irr_cap
        if cur - counts.get("n_excl_irr", 0) < need("n_excl_irr", cur):
            caps["excl_irr_cap"] = _round_up(int(max(cur, 128) * factor),
                                             128)
    return apply_term_caps(cfg, state, caps, excl_new)


def presize_term_caps(cfg: EngineConfig, state, counts: dict,
                      prev_counts: dict, block_steps: int,
                      plan_steps: int, safety: float = 1.6):
    """Grow the term tables ONCE to cover a whole planned run, from the
    measured per-block consumption rate — so capacity regrowth (a ~90 s
    recompile at 100k) never lands on a production run's critical path
    (VERDICT r3 item 3; the reference's FixedLists reallocate freely,
    ref gromacs_topology.py:1019, so it has no such stall either).

    ``counts``/``prev_counts`` are measure_cheap dicts one block apart;
    the append rate is extrapolated over ``plan_steps`` with ``safety``
    margin (reaction consumption decays as conversion proceeds, so the
    early-run rate is an upper bound).  Padded canonical rows are cheap
    per-step under the dense-static bonded path (they cost rederive time
    at reaction intervals, not per-step gathers), so oversizing is the
    right trade for a long run.  Returns (cfg, state)."""
    def tgt(key, cap):
        rate = max(0, counts.get(key, 0) - prev_counts.get(key, 0)) \
            / max(block_steps, 1)
        if rate == 0:
            # nothing consumed this table in the measured window: leave it
            # alone (rate-aware proactive growth remains the backstop)
            return cap
        t = counts.get(key, 0) + int(rate * plan_steps * safety) \
            + 2 * _term_headroom_floor(cap) + 256
        return _round_up(t, 128)

    caps = {}
    count_key = {"bond_cap": "n_bonds", "angle_cap": "n_angles",
                 "dihedral_cap": "n_dihedrals"}
    for f in TERM_CAP_FIELDS:
        t = tgt(count_key[f], getattr(cfg, f))
        if t > getattr(cfg, f):
            caps[f] = t
    if cfg.bonded_dense and "n_bonds_irr" in counts:
        # irregular telemetry: size the irr caps from their OWN measured
        # rate (every reaction-created term is irregular, so this is the
        # rate that matters), never from the canonical caps' padding.
        # The round-5 soak measured the lockstep alternative at ~79k dead
        # irr angle rows — all per-step gather/scatter width (SOAK_r05.md).
        for irr_f, key in (("bond_irr_cap", "n_bonds_irr"),
                           ("angle_irr_cap", "n_angles_irr")):
            caps[irr_f] = max(getattr(cfg, irr_f),
                              tgt(key, getattr(cfg, irr_f)))
    excl_new = None
    t = tgt("n_excl", state.excl.shape[0])
    if t > state.excl.shape[0]:
        excl_new = t
    if cfg.excl_offsets and "n_excl_irr" in counts:
        t = tgt("n_excl_irr", cfg.excl_irr_cap)
        if t > cfg.excl_irr_cap:
            caps["excl_irr_cap"] = t
    if not caps and excl_new is None:
        return cfg, state
    return apply_term_caps(cfg, state, caps, excl_new)


def plan_cap_ladder(cfg: EngineConfig, state, counts: dict,
                    rate_per_step: dict, plan_steps: int, rungs: int = 3,
                    safety: float = 1.35):
    """Rate-projected term-capacity rungs for a planned run.

    Instead of one-shot presizing for the WHOLE run (which pads every
    per-step table by the full-run consumption up front — the round-5
    soak paid 3.17M vs 4.67M pps steady for that padding, SOAK_r05.md),
    plan ``rungs`` capacity points at horizons plan_steps*k/rungs.  The
    caller pre-compiles ``run_block`` at every rung OFF the timed path
    (jit caches by the static cfg), then steps up a rung whenever
    :func:`term_caps_near_full` fires — the mid-run "regrow" becomes an
    array re-pad plus a compile-cache hit instead of a ~90 s recompile,
    and capacities track consumption within ~1/rungs of the run.

    ``counts``: current occupancy (measure_cheap dict, irr keys welcome).
    ``rate_per_step``: appends per step per counts-key (caller-measured;
    use a post-activation-burst window — the first reactive block
    overstates the steady rate ~2-3x).  Returns a list of
    ``(caps_dict, excl_cap_or_None)`` rungs, strictly increasing, ready
    for :func:`apply_term_caps`; tables with zero rate stay untouched.
    The reference's FixedLists reallocate freely (ref
    gromacs_topology.py:1019) so it has neither the stall nor the
    padding tax; this recovers both at static shapes."""
    count_key = {"bond_cap": "n_bonds", "angle_cap": "n_angles",
                 "dihedral_cap": "n_dihedrals"}
    if cfg.bonded_dense and "n_bonds_irr" in counts:
        count_key["bond_irr_cap"] = "n_bonds_irr"
        count_key["angle_irr_cap"] = "n_angles_irr"
    if cfg.excl_offsets and "n_excl_irr" in counts:
        count_key["excl_irr_cap"] = "n_excl_irr"

    def tgt(key, cap, horizon):
        rate = max(0.0, rate_per_step.get(key, 0.0))
        if rate == 0:
            return cap
        t = counts.get(key, 0) + int(rate * horizon * safety) \
            + 2 * _term_headroom_floor(cap) + 256
        return max(cap, _round_up(t, 128))

    ladder = []
    prev_caps = {f: getattr(cfg, f) for f in count_key}
    prev_excl = state.excl.shape[0]
    for k in range(1, rungs + 1):
        horizon = plan_steps * k // rungs
        caps = {f: tgt(key, prev_caps[f], horizon)
                for f, key in count_key.items()}
        excl = tgt("n_excl", prev_excl, horizon)
        if all(caps[f] <= prev_caps[f] for f in caps) and excl <= prev_excl:
            continue
        # cumulative targets, only fields that move vs the ORIGINAL cfg
        rung = {f: v for f, v in caps.items() if v != getattr(cfg, f)}
        if cfg.bonded_dense and "bond_irr_cap" in count_key and \
                ("bond_cap" in rung or "angle_cap" in rung):
            # explicit irr caps whenever a canonical cap moves, so
            # apply_term_caps never falls back to lockstep inflation
            rung.setdefault("bond_irr_cap", caps["bond_irr_cap"])
            rung.setdefault("angle_irr_cap", caps["angle_irr_cap"])
        ladder.append((rung, excl if excl > prev_excl else None))
        prev_caps.update(caps)
        prev_excl = max(prev_excl, excl)
    return ladder


@dataclasses.dataclass
class BuiltSystem:
    cfg: EngineConfig
    spec: SimSpec
    state: MDState
    obs: ObsRegistry
    reactions: reaction_compile.CompiledReactions | None
    systop: SystemTopology
    nb_names: list
    term_names: list
    extra_obs_idx: list = dataclasses.field(default_factory=list)


def build_system(systop: SystemTopology, coords, opts: SimOptions,
                 reaction_config: dict | None = None,
                 extra_conversions=()) -> BuiltSystem:
    """Assemble the full device system."""
    T = systop.next_type_id
    n = systop.n_atoms
    if coords.n_atoms != n:
        raise ValueError("coordinate file has %d atoms, topology %d" % (coords.n_atoms, n))
    box = np.asarray(coords.box, F32)

    obs = ObsRegistry()
    nb_tb = tables.TableStackBuilder(opts.n_bins)
    nb_tb.add("<zero>", np.array([1e-3, 10.0]), np.zeros(2), np.zeros(2))
    bond_tb = tables.TableStackBuilder(opts.n_bins)
    angle_tb = tables.TableStackBuilder(opts.n_bins)
    dih_tb = tables.TableStackBuilder(opts.n_bins)

    # ---- reactions first: they define dynamic types (and may register a
    #      dummy atom type for released molecules) ----
    compiled = None
    if reaction_config is not None:
        compiled = reaction_compile.compile_reactions(
            reaction_config, systop, bond_tb, opts.table_dirs, opts.output_prefix)
        T = systop.next_type_id    # may have grown (dummy type)
    dynamic_types = compiled.dynamic_types if compiled else set()
    change_bond_types = compiled.observed_bondtypes if compiled else set()

    # ---- ReleaseMolecule dummy particles (ref: reaction_post_process.py:230-260):
    #      `replicate` dummies per host particle, constrained at eq_length ----
    releases = compiled.releases if compiled else []
    joins = compiled.joins if compiled else []
    freeze_d = compiled.freeze if compiled else None
    # FixDistances definitions: releases first, then joins — the same order
    # reaction_compile uses to assign r_join_def indices
    fd_defs = []
    for release in releases:
        fd_defs.append({
            "eq": release["eq_length"],
            "host_type": (release["host_type"]
                          if release["release_on"] == "type" else -1),
            "dummy_type": release["dummy_type"],
            "target_type": release["target_type"],
            "release_lam": 0.0,
            "capture_lam": 0.0,
            "capture_state": 0,
        })
    for join_d in joins:
        fd_defs.append({
            "eq": join_d["eq_length"],
            "host_type": join_d["host_type"],
            "dummy_type": join_d["dummy_type"],
            "target_type": join_d["target_type"],
            "release_lam": join_d["init_res"],
            "capture_lam": join_d["init_res"],
            "capture_state": join_d["state"],
        })
    n_real = n
    fix_pairs = np.zeros((0, 2), I32)
    dummies = []
    for release in releases:
        host_rows = np.where(systop.type_ids == release["host_type"])[0]
        n_dummy = len(host_rows) * release["replicate"]
        trec = systop.top.atomtypes.get(
            systop.atomtype_atomsym[release["target_type"]], {})
        dummy = {
            "rows": np.arange(n, n + n_dummy),
            "host_of": np.repeat(host_rows, release["replicate"]).astype(I32),
            "type": release["dummy_type"],
            "mass": float(trec.get("mass", 1.0)),
            "state": int(trec.get("state", 0)),
            "lam": release["init_res"],
            "eq": release["eq_length"],
        }
        dummies.append(dummy)
        pairs = np.stack([dummy["host_of"], dummy["rows"].astype(I32)], axis=1)
        fix_pairs = np.concatenate([fix_pairs, pairs], axis=0).astype(I32)
        n = n + n_dummy
        logger.info("generated %d dummy particles (type %d) on %d hosts",
                    n_dummy, release["dummy_type"], len(host_rows))

    # ---- RestrictReaction connectivity whitelist ----
    restrict_rows = np.zeros((0, 2), np.int64)
    if compiled and compiled.restrict_file:
        pairs = set()
        rf = compiled.restrict_file
        if not os.path.exists(rf):
            for d in opts.table_dirs:
                if os.path.exists(os.path.join(d, rf)):
                    rf = os.path.join(d, rf)
                    break
        with open(rf) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    a, b = int(parts[0]) - 1, int(parts[1]) - 1
                    pairs.add((min(a, b), max(a, b)))
        restrict_rows = np.asarray(sorted(pairs), np.int64)
        # note: the reference collects these pairs into exclusions_list
        # (reaction_setup.py:125) but never consumes it — dead code there,
        # so whitelisted pairs stay nonbonded-interacting here too
        logger.info("restricted reactions to %d connections", len(pairs))

    # extra conversion observables requested by the caller (stop criteria)
    extra_obs_idx = [obs.register(ts, total) for ts, total in extra_conversions]

    # ---- nonbonded ----
    pair_arrays, mix_entries = _build_pair_tables(systop, opts, nb_tb, obs)

    # ---- bonded type-lookup tables ----
    bond_func_tt = np.zeros((T, T), I32)
    bond_par_tt = np.zeros((T, T, N_BOND_PARAMS), F32)
    for (a, b), rec in systop.bondparams.items():
        p = _pack_bond_params(rec["func"], rec["params"], bond_tb, opts.table_dirs)
        for key in ((a, b), (b, a)):
            bond_func_tt[key] = rec["func"]
            bond_par_tt[key] = p
    angle_func_tt = np.zeros((T, T, T), I32)
    angle_par_tt = np.zeros((T, T, T, N_BOND_PARAMS), F32)
    for (a, b, c), rec in systop.angleparams.items():
        p = _pack_angle_params(rec["func"], rec["params"], angle_tb, opts.table_dirs)
        for key in ((a, b, c), (c, b, a)):
            angle_func_tt[key] = rec["func"]
            angle_par_tt[key] = p
    dih_func_tt = np.zeros((T, T, T, T), I32)
    dih_par_tt = np.zeros((T, T, T, T, N_BOND_PARAMS), F32)
    for (a, b, c, d), rec in systop.dihedralparams.items():
        p = _pack_dihedral_params(rec["func"], rec["params"], dih_tb, opts.table_dirs)
        for key in ((a, b, c, d), (d, c, b, a)):
            dih_func_tt[key] = rec["func"]
            dih_par_tt[key] = p

    # ---- static bonded terms ----
    def term_entries(raw_terms, params_by_type, pack, canonical):
        idx, funcs, params, tl = [], [], [], []
        for key_ids, fields in raw_terms.items():
            rows = tuple(k - 1 for k in key_ids)
            tids = tuple(int(systop.type_ids[r]) for r in rows)
            ckey = canonical(tids)
            is_dynamic = (bool(set(tids) & dynamic_types) or
                          tuple(sorted(tids)) in change_bond_types) and ckey in params_by_type
            if fields:
                f = int(fields[0])
                p = pack(f, fields[1:], None, opts.table_dirs)
            else:
                rec = params_by_type.get(ckey)
                if rec is None:
                    rec = params_by_type.get(tuple(reversed(ckey)))
                if rec is None:
                    raise ValueError("no parameters for term %s types %s" % (key_ids, tids))
                f = rec["func"]
                p = pack(f, rec["params"], None, opts.table_dirs)
            idx.append(rows)
            funcs.append(f)
            params.append(p)
            tl.append(is_dynamic)
        return idx, funcs, params, tl

    # packers that reuse the shared table builders
    def pack_b(f, fields, _tb, dirs):
        return _pack_bond_params(f, fields, bond_tb, dirs)

    def pack_a(f, fields, _tb, dirs):
        return _pack_angle_params(f, fields, angle_tb, dirs)

    def pack_d(f, fields, _tb, dirs):
        return _pack_dihedral_params(f, fields, dih_tb, dirs)

    b_idx, b_func, b_par, b_tl = term_entries(
        systop.bonds, systop.bondparams, pack_b, lambda t: tuple(sorted(t)))
    a_idx, a_func, a_par, a_tl = term_entries(
        systop.angles, systop.angleparams, pack_a,
        lambda t: (t[2], t[1], t[0]) if t[0] > t[2] else t)
    d_idx, d_func, d_par, d_tl = term_entries(
        systop.dihedrals, systop.dihedralparams, pack_d,
        lambda t: (t[3], t[2], t[1], t[0]) if t[3] > t[0] else t)

    # 1-4 pairs: LJ with fudgeLJ (static resolution; ref: gromacs_topology.py:1314-1411)
    fudge_lj = systop.defaults.get("fudgeLJ", 1.0)
    p14_idx, p14_par = [], []
    for key_ids, fields in systop.pairs.items():
        rows = tuple(k - 1 for k in key_ids)
        if fields and len(fields) >= 3:
            sig, eps = float(fields[1]), float(fields[2])
        else:
            s1 = systop.atomtype_atomsym[int(systop.type_ids[rows[0]])]
            s2 = systop.atomtype_atomsym[int(systop.type_ids[rows[1]])]
            a_t, b_t = systop.top.atomtypes[s1], systop.top.atomtypes[s2]
            sig, eps = combine_lj(a_t["sigma"], a_t["epsilon"], b_t["sigma"],
                                  b_t["epsilon"], systop.defaults["combinationrule"])
        p = np.zeros(N_BOND_PARAMS, F32)
        p[0], p[1], p[2] = sig, fudge_lj * eps, opts.lj_cutoff**2
        sr6 = (sig / opts.lj_cutoff) ** 6 if sig > 0 else 0.0
        p[3] = 4.0 * fudge_lj * eps * (sr6 * sr6 - sr6)
        p14_idx.append(rows)
        p14_par.append(p)

    # ---- capacities ----
    n_pad = _round_up(max(n, 128), 128)
    has_reactions = compiled is not None and compiled.n_reactions > 0
    # Reactive headroom: every padded term row costs gathers + AD scatters in
    # the per-step bonded pass, and every padded exclusion row the same in
    # the excluded-pair correction (at 100k the old n/8 slice put 50k dead
    # angle rows and 100k dead exclusion rows on the gather wall, ~7 ms of
    # the 66 ms step).  Start at a thin n/32 slice; term_caps_near_full +
    # grow_term_caps (start_simulation block loop) regrow proactively as
    # conversion proceeds, and append-overflow flags are the backstop.
    extra_default = _round_up(max(n // 32, 512), 128) if has_reactions else 0
    extra_b = opts.extra_bonds if opts.extra_bonds is not None else extra_default
    extra_a = opts.extra_angles if opts.extra_angles is not None else 4 * extra_b
    extra_d = opts.extra_dihedrals if opts.extra_dihedrals is not None else (
        6 * extra_b if systop.dihedralparams else 0)
    bond_cap = _round_up(max(len(b_idx) + extra_b, 8), 128)
    angle_cap = _round_up(max(len(a_idx) + extra_a, 8), 128)
    dih_cap = _round_up(max(len(d_idx) + extra_d, 8), 128)
    pair14_cap = _round_up(len(p14_idx), 128) if p14_idx else 0
    excl_cap_pairs = _round_up(max(len(systop.exclusions) + 8 * extra_b, 8), 128)
    if opts.excl_cap is None:
        # per-particle exclusion rows: size from the observed topology degree
        # (the (N, K, EXCL_CAP) neighbor mask scales linearly with this cap)
        deg = np.zeros(n_pad, I32)
        for a_, b_ in systop.exclusions:
            deg[a_ - 1] += 1
            deg[b_ - 1] += 1
        obs_deg = int(deg.max()) if len(systop.exclusions) else 0
        excl_cap = _round_up(max(2 * obs_deg + 8, 16), 8)
    else:
        excl_cap = opts.excl_cap

    max_cutoff = max(opts.lj_cutoff, opts.cg_cutoff, opts.coulomb_cutoff)
    rc_skin = max_cutoff + opts.skin
    density = n / float(np.prod(box))
    # under a barostat the box drifts: size cells with extra margin so the
    # static grid stays valid (cell edge >= cutoff+skin) as the box shrinks
    has_barostat = opts.barostat != "no" and opts.pressure > 0
    cell_dims = neighbor.choose_cell_grid(box, rc_skin,
                                          margin=1.10 if has_barostat else 1.02)
    # slab-halo divisibility (pallas_halo.supports): fewer, wider x-layers
    # are always legal (cell edge >= cutoff+skin still holds), so rounding
    # nx DOWN to a multiple of the slab device count relaxes the old
    # "nx % n_dev == 0 or fall back to GSPMD" constraint to "nx >= n_dev"
    slab_dev = opts.slab_devices or int(os.environ.get(
        "CHEMLAB_HALO_DEVICES", "0"))
    if slab_dev > 1:
        nx_r = (cell_dims[0] // slab_dev) * slab_dev
        if nx_r >= 3:   # colt2 needs a full 27-stencil (min dim >= 3)
            cell_dims = (nx_r,) + tuple(cell_dims[1:])
    fudge_qq = (opts.fudge_qq if opts.fudge_qq is not None
                else systop.defaults.get("fudgeQQ", 1.0))
    from ..units import COULOMB_PREFACTOR
    qq_pref = COULOMB_PREFACTOR * fudge_qq if opts.coulomb_cutoff > 0 else 0.0
    use_pallas, cheb_candidate = _pallas_enabled(opts, pair_arrays, qq_pref,
                                                 cell_dims,
                                                 n_mix=len(mix_entries))

    # -- dense-static bonded operands (bonded_dense.py) --
    # irregular capacities obey the lockstep invariant irr_cap >= cap -
    # n_aligned_static: static aligned rows can only be invalidated (never
    # become irregular), so the irregular count is bounded by static-
    # irregular rows + dynamic appends for the life of the system
    # default ON (measured v5e 100k: bonded pass 7.74->4.87 ms, fused
    # reactive 4.49M->5.39M pps; 10k fused 4.81M->5.16M pps — the rolled-
    # plane eval beats the gather/scatter path at both scales);
    # CHEMLAB_BONDED=gather opts back out
    bd_env = os.environ.get("CHEMLAB_BONDED", "")
    if bd_env not in ("", "dense", "gather"):
        import warnings
        warnings.warn("CHEMLAB_BONDED=%r unrecognized (expected 'dense' or "
                      "'gather'); using the default dense path" % bd_env)
        bd_env = "dense"
    bd_enable = (opts.bonded_dense if opts.bonded_dense is not None
                 else bd_env != "gather")

    def _n_aligned(idx_list, arity):
        if not len(idx_list):
            return 0
        arr = np.asarray(idx_list, np.int64)
        if arity == 2:
            b_ = arr.min(1)
            al = arr.max(1) == b_ + 1
        else:
            b_ = arr[:, 0]
            al = np.all(arr == b_[:, None] + np.arange(arity)[None, :], axis=1)
        al &= (b_ + arity - 1) < n_pad
        uniq, cnt = np.unique(b_[al], return_counts=True)
        return int(al.sum() - (cnt - 1).sum())

    bond_irr_cap = _round_up(max(bond_cap - _n_aligned(b_idx, 2), 128),
                             128) if bd_enable else 0
    angle_irr_cap = _round_up(max(angle_cap - _n_aligned(a_idx, 3), 128),
                              128) if bd_enable else 0
    # observed initial occupancies (host, cheap): caps must hold for the
    # starting configuration AND leave headroom for reactive densification
    frac = np.mod(coords.pos, box) / box
    ci = np.clip((frac * np.asarray(cell_dims)).astype(np.int64), 0,
                 np.asarray(cell_dims) - 1)
    cid = (ci[:, 0] * cell_dims[1] + ci[:, 1]) * cell_dims[2] + ci[:, 2]
    obs_cell_max = int(np.bincount(cid).max()) if n else 0
    if opts.max_neighbors is None:
        # 2.2x the homogeneous estimate: reactive runs densify locally as
        # polymer networks form, well past equilibrium-melt fluctuations
        k_est = density * 4.0 / 3.0 * math.pi * rc_skin**3
        max_neighbors = _round_up(max(int(k_est * 2.2) + 16, 24), 8)
    else:
        max_neighbors = opts.max_neighbors
    if opts.cell_cap is None:
        # headroom over mean occupancy: polymerizing systems develop dense
        # pockets.  The cell-tile kernel's cost scales with cell_cap^2 and
        # regrowth-on-overflow recompiles cheaply, so the pallas path runs
        # tight (1.7x mean); the row path's rebuild scales only linearly in
        # cap and keeps the fat 3x margin to avoid recompiles.
        occ_factor = 1.7 if use_pallas else 3.0
        cell_vol = float(np.prod(box / np.asarray(cell_dims)))
        cell_cap = _round_up(max(int(density * cell_vol * occ_factor) + 8,
                                 int(obs_cell_max * 1.3) + 4, 8), 8)
    else:
        cell_cap = opts.cell_cap

    # ---- lazy-row reaction geometry (pallas fast path) ----
    # rows are built transiently at reaction steps on a cell grid sized by
    # the LARGEST reaction cutoff (Gaussian channels: eq + 4 sigma), clamped
    # to the force range — the reference's candidates also come from its
    # rc+skin VerletList, so nothing beyond rc_skin can match in either
    # implementation
    rc_rx = 0.0
    if compiled and compiled.n_reactions:
        ch = compiled.channels
        pair_ch = ~ch["r_is_diss"]
        if pair_ch.any():
            hard = np.sqrt(ch["r_cutoff2"][pair_ch])
            gauss = ch["r_eq"][pair_ch] + 4.0 * ch["r_sigma"][pair_ch]
            rc_rx = float(np.max(np.where(ch["r_sigma"][pair_ch] > 0.0,
                                          np.maximum(gauss, hard), hard)))
    rc_rx = min(max(rc_rx, 0.5), rc_skin)
    rx_dims = neighbor.choose_cell_grid(box, rc_rx,
                                        margin=1.10 if has_barostat else 1.02)
    # scale the rx caps off the FORCE-geometry caps: those carry the
    # caller's knowledge of local densification (e.g. phase-separating
    # melts run 3x the box-mean density), which a box-mean estimate misses
    rx_cell_vol = float(np.prod(box / np.asarray(rx_dims)))
    cell_vol_f = float(np.prod(box / np.asarray(cell_dims)))
    # tight caps: the rx build cost is linear in rx_cell_cap (27*cap
    # candidates per particle) and regrowth-on-overflow is the backstop
    rx_cell_cap = _round_up(
        max(int(cell_cap * rx_cell_vol / cell_vol_f) + 4,
            int(density * rx_cell_vol * 2.0) + 4, 8), 8)
    rx_k = _round_up(
        max(int(max_neighbors * (rc_rx / rc_skin) ** 3) + 8,
            int(density * 4.0 / 3.0 * math.pi * rc_rx**3 * 2.0) + 8, 16), 8)

    # ---- term tables ----
    bonds = TermTable.create(bond_cap, 2, b_idx, b_func, b_par, b_tl)
    angles = TermTable.create(angle_cap, 3, a_idx, a_func, a_par, a_tl)
    dihedrals = TermTable.create(dih_cap, 4, d_idx, d_func, d_par, d_tl)
    pairs14 = TermTable.create(max(pair14_cap, 1), 2, p14_idx, [1] * len(p14_idx), p14_par)

    # ---- exclusions / adjacency / molecules ----
    excl = np.full((excl_cap_pairs, 2), -1, I32)
    for i, (a, b) in enumerate(sorted(systop.exclusions)):
        excl[i] = (a - 1, b - 1)
    n_excl = len(systop.exclusions)

    # -- dense-static exclusion correction (excl_dense.py) --
    # offsets detected from the build-time list; irr cap obeys the same
    # lockstep invariant as the bonded irr caps (excl_cap - covered)
    ex_env = os.environ.get("CHEMLAB_EXCL", "")
    if ex_env not in ("", "dense", "flat"):
        import warnings
        warnings.warn("CHEMLAB_EXCL=%r unrecognized (expected 'dense' or "
                      "'flat'); using the flat path" % ex_env)
        ex_env = ""
    # default ON for the pallas path (measured v5e 100k, scripts/excl_ab.py:
    # correction 3.93 -> 1.15 ms, fused step 17.22 -> 14.08 ms = 7.10M pps,
    # forces bit-exact vs the flat path); CHEMLAB_EXCL=flat opts back out
    ex_enable = (opts.excl_dense if opts.excl_dense is not None
                 else ex_env != "flat")
    excl_offsets = ()
    excl_irr_cap = 0
    if ex_enable and use_pallas:
        from . import excl_dense as _exd

        excl_offsets = _exd.detect_offsets(excl)
        if excl_offsets:
            dvals = np.abs(excl[:n_excl, 1] - excl[:n_excl, 0])
            n_cov = int(np.isin(dvals, excl_offsets).sum())
            excl_irr_cap = _round_up(max(excl_cap_pairs - n_cov, 128), 128)

    adj = np.full((n_pad, opts.deg_cap), -1, I32)
    deg = np.zeros(n_pad, I32)
    bonds0 = [(i - 1, j - 1) for (i, j) in systop.bonds]
    for i, j in bonds0:
        if deg[i] >= opts.deg_cap or deg[j] >= opts.deg_cap:
            raise ValueError("deg_cap=%d too small" % opts.deg_cap)
        adj[i, deg[i]] = j
        adj[j, deg[j]] = i
        deg[i] += 1
        deg[j] += 1
    mol_id = np.zeros(n_pad, I32)
    mol_id[:n] = _host_components(n, bonds0)

    # ---- per-particle arrays ----
    dtype = np.float32 if opts.dtype == "float32" else np.float64
    pos = np.zeros((n_pad, 3), dtype)
    pos[:n_real] = np.mod(coords.pos, coords.box)
    vel = np.zeros((n_pad, 3), dtype)
    if coords.vel is not None:
        vel[:n_real] = coords.vel
    type_id = np.full(n_pad, 0, I32)
    type_id[:n_real] = systop.type_ids
    mass = np.ones(n_pad, dtype)
    mass[:n_real] = systop.masses
    q = np.zeros(n_pad, dtype)
    q[:n_real] = systop.charges
    chem_state = np.zeros(n_pad, I32)
    chem_state[:n_real] = systop.states
    res_id = np.zeros(n_pad, I32)
    res_id[:n_real] = coords.res_idx
    lam = np.ones(n_pad, dtype)
    active = np.zeros(n_pad, bool)
    active[:n] = True

    for dummy in dummies:
        rows = dummy["rows"]
        pos[rows] = np.mod(pos[dummy["host_of"]]
                           + np.asarray([dummy["eq"], 0.0, 0.0], dtype), box)
        type_id[rows] = dummy["type"]
        mass[rows] = dummy["mass"]
        chem_state[rows] = dummy["state"]
        res_id[rows] = rows + 1     # own residue per dummy (ref behavior)
        lam[rows] = dummy["lam"]

    if opts.gen_velocity and coords.vel is None:
        rng = np.random.RandomState(opts.rng_seed)
        m_eff = systop.masses * opts.mass_factor
        v = rng.normal(size=(n_real, 3)) * np.sqrt(opts.kT / m_eff)[:, None]
        v -= np.average(v, axis=0, weights=m_eff)
        vel[:n_real] = v

    # ---- stacks ----
    nb_stack = nb_tb.build()

    # ---- Chebyshev fits for the pallas tabulated fast path ----
    # (tab_cheb.py; decided per table at build — any failed fit sends the
    # whole system back to the exact XLA row path)
    cheb_fit = None
    if use_pallas and cheb_candidate:
        from . import tab_cheb

        used_tabs = np.zeros(nb_stack.ef.shape[0], bool)
        is_tab_pair = pair_arrays["pair_kind"] == PAIR_TAB
        used_tabs[pair_arrays["pair_tab_a"][is_tab_pair]] = True
        used_tabs[pair_arrays["pair_tab_b"][is_tab_pair]] = True
        ef4_host = tables.interleave4(nb_stack.ef)
        cheb_fit = tab_cheb.fit_stack(ef4_host, nb_stack.r0, nb_stack.dr,
                                      used_tabs)
        if cheb_fit is None:
            use_pallas = False
            # re-size the cell cap for the row path's fat-margin policy
            if opts.cell_cap is None:
                cell_vol = float(np.prod(box / np.asarray(cell_dims)))
                cell_cap = _round_up(max(int(density * cell_vol * 3.0) + 8,
                                         int(obs_cell_max * 1.3) + 4, 8), 8)
            logger.warning("tabulated fast path disabled: a pair table "
                           "failed Chebyshev fit validation — exact XLA "
                           "row path selected")
        else:
            logger.info("tabulated fast path: %d tables fit (kw=%d ko=%d, "
                        "worst err %.2e)", int(used_tabs.sum()),
                        cheb_fit.kw, cheb_fit.ko,
                        float(cheb_fit.err[used_tabs].max()))

    # table-scalar kernel mode: with few distinct tables, evaluating each
    # table's polynomial from SMEM scalars and selecting by one table-id
    # plane replaces the kw+ko+6 per-packet MXU coefficient dots with ONE
    # (ROOFLINE_r05.md lever).  Gated by instruction-stream growth:
    # n_tab unrolled Clenshaw chains per packet body.
    cheb_ntab = 0
    cheb_mix = False
    cheb_tab_slot = cheb_sc = cheb_tab_slot_b = None
    if cheb_fit is not None:
        is_tab_pair = pair_arrays["pair_kind"] == PAIR_TAB
        is_mixed = is_tab_pair & (pair_arrays["pair_tab_b"]
                                  != pair_arrays["pair_tab_a"])
        used_ids = np.unique(np.concatenate(
            [pair_arrays["pair_tab_a"][is_tab_pair],
             pair_arrays["pair_tab_b"][is_tab_pair]]))
        # table stacks register one slot per type pair even when many pairs
        # share a .pot file — dedupe by fit CONTENT (the exact f32 scalar
        # rows) so the kernel unrolls one chain per DISTINCT table
        pack_all = tab_cheb.pack_table_scalars(cheb_fit, used_ids)
        uniq_rows, inv = np.unique(pack_all, axis=0, return_inverse=True)
        if (len(uniq_rows) <= 8
                and len(uniq_rows) * (cheb_fit.kw + cheb_fit.ko) <= 128):
            cheb_ntab = int(len(uniq_rows))
            slot = np.zeros(pair_arrays["pair_tab_a"].shape, np.float32)
            slot_b = np.zeros_like(slot)
            for i, t in enumerate(used_ids):
                slot[is_tab_pair
                     & (pair_arrays["pair_tab_a"] == t)] = inv[i] + 1
                # pure pairs keep slot_b = 0 (blend weight forced to 1)
                slot_b[is_mixed
                       & (pair_arrays["pair_tab_b"] == t)] = inv[i] + 1
            cheb_tab_slot = slot
            cheb_sc = uniq_rows
            if is_mixed.any():
                cheb_mix = True
                cheb_tab_slot_b = slot_b
        elif is_mixed.any():
            # func-10/12 blending exists ONLY in the table-scalar mode —
            # too many distinct tables sends the system to the row path
            cheb_fit = None
            use_pallas = False
            if opts.cell_cap is None:
                cell_vol = float(np.prod(box / np.asarray(cell_dims)))
                cell_cap = _round_up(max(int(density * cell_vol * 3.0) + 8,
                                         int(obs_cell_max * 1.3) + 4, 8), 8)
            logger.warning("tabulated fast path disabled: mixed tables "
                           "with >8 distinct fits — exact XLA row path "
                           "selected")

    bond_stack = bond_tb.build()
    angle_stack = angle_tb.build()
    dih_stack = dih_tb.build()
    if opts.validate_tables:
        for label, tb in (("nonbonded", nb_tb), ("bond", bond_tb),
                          ("angle", angle_tb), ("dihedral", dih_tb)):
            for name, itype, ae, re_, af in tb.fidelity_report():
                logger.info(
                    "table fidelity [%s] %s itype=%d: max|dE|=%.3g "
                    "max relE=%.3g max|dF|=%.3g", label, name, itype,
                    ae, re_, af)
                print("table fidelity [%s] %s itype=%d: max|dE|=%.3g "
                      "max relE=%.3g max|dF|=%.3g"
                      % (label, name, itype, ae, re_, af))

    # ---- thermostat / thermal groups ----
    thermal_mask = np.ones(T, bool)
    if opts.thermal_groups:
        thermal_mask[:] = False
        for s in opts.thermal_groups:
            thermal_mask[systop.atomsym_atomtype[s]] = True
    for d in fd_defs:
        # dummy particles must not be thermostatted
        # (ref: reaction_post_process.py:313-314)
        thermal_mask[d["dummy_type"]] = False
    if freeze_d:
        thermal_mask[freeze_d["final_type"]] = False

    # ---- reaction arrays ----
    if compiled and compiled.n_reactions:
        r_arrays = {k: jnp.asarray(v) for k, v in compiled.channels.items()}
        n_r = compiled.n_reactions
    else:
        n_r = 0
        r_arrays = {k: jnp.zeros(0, dt_) for k, dt_ in [
            ("r_t1", I32), ("r_t2", I32), ("r_min1", I32), ("r_max1", I32),
            ("r_min2", I32), ("r_max2", I32), ("r_delta1", I32), ("r_delta2", I32),
            ("r_cutoff2", F32), ("r_min_cutoff2", F32), ("r_sigma", F32), ("r_eq", F32),
            ("r_intramolecular", bool), ("r_intraresidual", bool), ("r_virtual", bool),
            ("r_is_diss", bool), ("r_diss_fade", bool),
            ("r_diss_rate", F32), ("r_group", I32),
            ("r_new_type1", I32), ("r_new_type2", I32), ("r_cnb_type", I32),
            ("r_cnb_min", I32), ("r_cnb_max", I32), ("r_release_n", I32),
            ("r_release_side", I32), ("r_restricted", bool),
            ("r_join_def", I32)]}
    if compiled and compiled.ppnb:
        pp_arrays = {k: jnp.asarray(v) for k, v in compiled.ppnb.items()}
        n_pp = len(compiled.ppnb["ppnb_reaction"])
    else:
        n_pp = 0
        pp_arrays = {k: jnp.zeros(0, I32) for k in [
            "ppnb_reaction", "ppnb_side", "ppnb_old_type", "ppnb_level",
            "ppnb_new_type", "ppnb_new_state", "ppnb_incr_state",
            "ppnb_min_state", "ppnb_max_state"]}
    atrp = compiled.atrp if compiled else None
    if atrp and atrp["entries"]:
        ae = atrp["entries"]
        atrp_arrays = dict(
            atrp_type=jnp.asarray([e[0] for e in ae], I32),
            atrp_state=jnp.asarray([e[1] for e in ae], I32),
            atrp_is_activator=jnp.asarray([e[2] for e in ae], bool),
            atrp_new_type=jnp.asarray([e[3] for e in ae], I32),
            atrp_delta=jnp.asarray([e[4] for e in ae], I32),
            atrp_num=jnp.asarray(atrp["num_particles"], I32),
            atrp_k_activate=jnp.asarray(atrp["k_activate"], F32),
            atrp_k_deactivate=jnp.asarray(atrp["k_deactivate"], F32),
            atrp_delta_catalyst=jnp.asarray(atrp["delta_catalyst"], F32),
        )
        n_atrp = len(ae)
    else:
        n_atrp = 0
        atrp_arrays = dict(
            atrp_type=jnp.zeros(0, I32), atrp_state=jnp.zeros(0, I32),
            atrp_is_activator=jnp.zeros(0, bool), atrp_new_type=jnp.zeros(0, I32),
            atrp_delta=jnp.zeros(0, I32), atrp_num=jnp.asarray(0, I32),
            atrp_k_activate=jnp.asarray(0.0, F32), atrp_k_deactivate=jnp.asarray(0.0, F32),
            atrp_delta_catalyst=jnp.asarray(0.0, F32))

    obs_e_obs, obs_e_type, obs_e_state, obs_totals = obs.arrays()
    rb_rows_ = compiled.rb_rows if compiled else []

    # funcs present (static + type tables + groups)
    bond_funcs = sorted(set(b_func) | set(bond_func_tt.flatten()) |
                        (set(compiled.g_func.tolist()) if compiled else set()))
    bond_funcs = tuple(f for f in bond_funcs if f > 0)
    angle_funcs = tuple(f for f in sorted(set(a_func) | set(angle_func_tt.flatten())) if f > 0)
    dih_funcs = tuple(f for f in sorted(set(d_func) | set(dih_func_tt.flatten())) if f > 0)

    # ---- compacted reaction matching gate ----
    # Candidate rows only for particles that can be the type_1 side of a
    # channel; gated off when those types span the bulk (symmetric A+A
    # systems), where compaction buys nothing.  The capacity is a static
    # bound on |S1| with regrowth-on-overflow as the backstop (initiator
    # counts grow at runtime, e.g. hooks flipping monomers to radicals).
    rx_compact = False
    rx_rows_cap = 0
    if compiled and compiled.n_reactions:
        ch = compiled.channels
        t1_types = sorted({int(t) for t, d in zip(ch["r_t1"], ch["r_is_diss"])
                           if not d})
        if t1_types:
            t1_pop = int(np.isin(type_id[active], t1_types).sum())
            if t1_pop <= max(n_real // 3, 1):
                rx_compact = True
                rx_rows_cap = min(_round_up(max(4 * t1_pop, 1024), 128),
                                  _round_up(n_pad, 128))

    cfg = EngineConfig(
        n_types=T,
        n_particles=n,
        n_pad=n_pad,
        max_neighbors=max_neighbors,
        cell_cap=cell_cap,
        cell_dims=cell_dims,
        deg_cap=opts.deg_cap,
        bond_cap=bond_cap,
        angle_cap=angle_cap,
        dihedral_cap=dih_cap,
        pair14_cap=pair14_cap,
        excl_cap=excl_cap,
        bonded_dense=bd_enable,
        bond_irr_cap=bond_irr_cap,
        angle_irr_cap=angle_irr_cap,
        excl_offsets=excl_offsets,
        excl_irr_cap=excl_irr_cap,
        max_events=opts.max_events,
        n_reactions=n_r,
        n_groups=compiled.n_groups if compiled else 0,
        n_obs=max(len(obs.keys), 1),
        bond_funcs=bond_funcs,
        angle_funcs=angle_funcs,
        dihedral_funcs=dih_funcs,
        thermostat=opts.thermostat,
        iso_coupling=(max(int(opts.thermostat_gamma), 1)
                      if opts.thermostat == "iso" else 1),
        store_pressure=opts.store_pressure,
        barostat=opts.barostat if opts.pressure > 0 else "no",
        has_coulomb=qq_pref > 0,
        has_reactions=has_reactions,
        reaction_interval=compiled.interval if compiled else 0,
        nearest_mode=compiled.nearest if compiled else False,
        max_per_interval=compiled.max_per_interval if compiled else -1,
        exclude_new_bonds=opts.exclude_new_bonds,
        n_mix_entries=len(mix_entries),
        has_mixed_tables=bool(
            mix_entries
            or (pair_arrays["pair_mix_mode"] != 0).any()
            or (pair_arrays["pair_tab_b"] != pair_arrays["pair_tab_a"]).any()),
        needs_conversions=bool(mix_entries
                               or (pair_arrays["pair_mix_mode"] == MIX_OBS).any()),
        use_pallas=use_pallas,
        lazy_rows=use_pallas,
        tab_cheb=cheb_fit is not None,
        cheb_kw=cheb_fit.kw if cheb_fit is not None else 0,
        cheb_ko=cheb_fit.ko if cheb_fit is not None else 0,
        cheb_ntab=cheb_ntab,
        cheb_mix=cheb_mix,
        uniform_lj=bool(
            (pair_arrays["pair_kind"] == PAIR_LJ).all()
            and all(np.unique(pair_arrays[k]).size == 1
                    for k in ("pair_sig", "pair_eps", "pair_cutoff2",
                              "pair_shift"))),
        all_lj=bool((pair_arrays["pair_kind"] == PAIR_LJ).all()),
        rx_dims=rx_dims,
        rx_cell_cap=rx_cell_cap,
        rx_k=rx_k,
        rx_rc=rc_rx,
        rx_compact=rx_compact,
        rx_rows_cap=rx_rows_cap,
        has_lj=bool((pair_arrays["pair_kind"] == PAIR_LJ).any()),
        has_tabulated=bool((pair_arrays["pair_kind"] == PAIR_TAB).any()),
        has_caps=bool((pair_arrays["pair_caprad"] > 0).any()
                      or (pair_arrays["pair_max_force"] > 0).any()),
        has_pps=bool((pair_arrays["pair_pps_incr"] > 0).any()),
        has_lambda_pairs=bool(pair_arrays["pair_lam_scale"].any()),
        use_thermal_group=bool(opts.thermal_groups),
        nb_bins=opts.n_bins,
        max_ppnb=n_pp,
        max_nb_level=compiled.max_nb_level if compiled else 0,
        has_atrp=n_atrp > 0,
        n_atrp=n_atrp,
        atrp_interval=atrp["interval"] if atrp else 0,
        atrp_num=atrp["num_particles"] if atrp else 0,
        atrp_select_from_all=bool(atrp["select_from_all"]) if atrp else True,
        has_dissociation=bool(compiled and compiled.n_reactions
                              and any(c for c in compiled.channels["r_is_diss"])),
        has_fixd=bool(fix_pairs.shape[0] > 0 or joins),
        fixd_cap=max(_round_up(
            fix_pairs.shape[0]
            + sum(int(np.sum(systop.type_ids == jd["target_type"]))
                  + int(np.sum(systop.type_ids == jd["final_type"]))
                  for jd in joins), 128), 1),
        n_fd=max(len(fd_defs), 1),
        has_dyn_resolution=bool(compiled and compiled.dyn_resolution),
        restrict_scan=(int(np.bincount(restrict_rows[:, 0]).max())
                       if restrict_rows.size else 1),
        n_rb=len(compiled.rb_rows) if compiled else 0,
        has_cpt=bool(compiled and compiled.cpt),
        cpt_interval=compiled.cpt["interval"] if compiled and compiled.cpt else 0,
        cpt_num=compiled.cpt["num"] if compiled and compiled.cpt else 0,
        has_freeze=bool(compiled and compiled.freeze),
        freeze_mode=("num" if freeze_d and freeze_d["p_num"] else
                     "pct" if freeze_d and freeze_d["p_pct"] else "prob"),
    )

    if mix_entries:
        mix_arr = np.asarray(mix_entries, dtype=object)
        mix = dict(
            mix_pair=jnp.asarray([m[0] for m in mix_entries], I32),
            mix_lo=jnp.asarray([m[1] for m in mix_entries], F32),
            mix_hi=jnp.asarray([m[2] for m in mix_entries], F32),
            mix_tab_a=jnp.asarray([m[3] for m in mix_entries], I32),
            mix_tab_b=jnp.asarray([m[4] for m in mix_entries], I32),
            mix_obs=jnp.asarray([m[5] for m in mix_entries], I32),
        )
    else:
        mix = dict(mix_pair=jnp.zeros(0, I32), mix_lo=jnp.zeros(0, F32),
                   mix_hi=jnp.zeros(0, F32), mix_tab_a=jnp.zeros(0, I32),
                   mix_tab_b=jnp.zeros(0, I32), mix_obs=jnp.zeros(0, I32))

    spec = SimSpec(
        dt=jnp.asarray(opts.dt, F32),
        kT=jnp.asarray(opts.kT, F32),
        gamma=jnp.asarray(opts.thermostat_gamma, F32),
        max_force=jnp.asarray(opts.max_force, F32),
        pressure=jnp.asarray(opts.pressure, F32),
        barostat_tau=jnp.asarray(opts.barostat_tau, F32),
        barostat_gammaP=jnp.asarray(opts.barostat_gammaP, F32),
        barostat_mass=jnp.asarray(opts.barostat_mass, F32),
        skin=jnp.asarray(opts.skin, F32),
        thermal_type_mask=jnp.asarray(thermal_mask),
        type_mass=jnp.asarray([systop.top.atomtypes.get(
            systop.atomtype_atomsym.get(t, ""), {}).get("mass", 1.0) for t in range(T)], F32),
        type_q=jnp.asarray([systop.top.atomtypes.get(
            systop.atomtype_atomsym.get(t, ""), {}).get("charge", 0.0) for t in range(T)], F32),
        type_state=jnp.asarray([systop.top.atomtypes.get(
            systop.atomtype_atomsym.get(t, ""), {}).get("state", 0) for t in range(T)], I32),
        **{k: jnp.asarray(v) for k, v in pair_arrays.items()},
        qq_prefactor=jnp.asarray(qq_pref, F32),
        qq_cutoff2=jnp.asarray(opts.coulomb_cutoff**2, F32),
        **mix,
        nb_ef=jnp.asarray(nb_stack.ef),
        nb_ef4=jnp.asarray(tables.interleave4(nb_stack.ef)),
        nb_r0=jnp.asarray(nb_stack.r0),
        nb_dr=jnp.asarray(nb_stack.dr),
        **({} if cheb_fit is None else dict(
            cheb_wall_g=jnp.asarray(cheb_fit.wall_g),
            cheb_wall_e=jnp.asarray(cheb_fit.wall_e),
            cheb_well_g=jnp.asarray(cheb_fit.well_g),
            cheb_well_e=jnp.asarray(cheb_fit.well_e),
            cheb_ay=jnp.asarray(cheb_fit.ay),
            cheb_by=jnp.asarray(cheb_fit.by),
            cheb_ax=jnp.asarray(cheb_fit.ax),
            cheb_bx=jnp.asarray(cheb_fit.bx),
            cheb_rs2=jnp.asarray(cheb_fit.rs2),
            cheb_rcap2=jnp.asarray(cheb_fit.rcap2),
            **({} if cheb_ntab == 0 else dict(
                cheb_tab_slot=jnp.asarray(cheb_tab_slot),
                cheb_sc=jnp.asarray(cheb_sc))),
            **({} if not cheb_mix else dict(
                cheb_tab_slot_b=jnp.asarray(cheb_tab_slot_b))))),
        bond_ef=jnp.asarray(bond_stack.ef), bond_r0=jnp.asarray(bond_stack.r0),
        bond_dr=jnp.asarray(bond_stack.dr),
        angle_ef=jnp.asarray(angle_stack.ef), angle_r0=jnp.asarray(angle_stack.r0),
        angle_dr=jnp.asarray(angle_stack.dr),
        dih_ef=jnp.asarray(dih_stack.ef), dih_r0=jnp.asarray(dih_stack.r0),
        dih_dr=jnp.asarray(dih_stack.dr),
        bond_func_tt=jnp.asarray(bond_func_tt), bond_par_tt=jnp.asarray(bond_par_tt),
        angle_func_tt=jnp.asarray(angle_func_tt), angle_par_tt=jnp.asarray(angle_par_tt),
        dih_func_tt=jnp.asarray(dih_func_tt), dih_par_tt=jnp.asarray(dih_par_tt),
        obs_entry_obs=jnp.asarray(obs_e_obs), obs_entry_type=jnp.asarray(obs_e_type),
        obs_entry_state=jnp.asarray(obs_e_state), obs_total=jnp.asarray(obs_totals),
        **r_arrays,
        g_func=jnp.asarray(compiled.g_func) if compiled else jnp.zeros(0, I32),
        g_params=jnp.asarray(compiled.g_params) if compiled else jnp.zeros((0, N_BOND_PARAMS), F32),
        **pp_arrays,
        **atrp_arrays,
        hybrid_bond_rate=jnp.asarray(
            1.0 / opts.t_hybrid_bond if opts.t_hybrid_bond > 0 else 0.0, F32),
        hybrid_angle_rate=jnp.asarray(
            1.0 / opts.t_hybrid_angle if opts.t_hybrid_angle > 0 else 0.0, F32),
        hybrid_dihedral_rate=jnp.asarray(
            1.0 / opts.t_hybrid_dihedral if opts.t_hybrid_dihedral > 0 else 0.0, F32),
        dr_alpha=jnp.asarray(
            [compiled.dyn_resolution.get(t, (0.0, -1, False))[0] if compiled else 0.0
             for t in range(T)], F32),
        dr_final_type=jnp.asarray(
            [compiled.dyn_resolution.get(t, (0.0, -1, False))[1] if compiled else -1
             for t in range(T)], I32),
        dr_set_state=jnp.asarray(
            [compiled.dyn_resolution.get(t, (0.0, -1, False))[2] if compiled else False
             for t in range(T)], bool),
        fd_eq=jnp.asarray([d["eq"] for d in fd_defs] or [0.0], F32),
        fd_host_type=jnp.asarray([d["host_type"] for d in fd_defs] or [-1], I32),
        fd_dummy_type=jnp.asarray([d["dummy_type"] for d in fd_defs] or [-1], I32),
        fd_target_type=jnp.asarray([d["target_type"] for d in fd_defs] or [-1], I32),
        fd_release_lam=jnp.asarray([d["release_lam"] for d in fd_defs] or [0.0], F32),
        fd_capture_lam=jnp.asarray([d["capture_lam"] for d in fd_defs] or [0.0], F32),
        fd_capture_state=jnp.asarray([d["capture_state"] for d in fd_defs] or [0], I32),
        restrict_lo=jnp.asarray(restrict_rows[:, 0].astype(I32)
                                if restrict_rows.size else np.zeros(0, I32)),
        restrict_hi=jnp.asarray(restrict_rows[:, 1].astype(I32)
                                if restrict_rows.size else np.zeros(0, I32)),
        rb_reaction=jnp.asarray([e["reaction"] for e in rb_rows_], I32),
        rb_side=jnp.asarray([e["side"] for e in rb_rows_], I32),
        rb_anchor_type=jnp.asarray([e["anchor_type"] for e in rb_rows_], I32),
        rb_level=jnp.asarray([e["level"] for e in rb_rows_], I32),
        rb_t1=jnp.asarray([e["t1"] for e in rb_rows_], I32),
        rb_t2=jnp.asarray([e["t2"] for e in rb_rows_], I32),
        cpt_old=jnp.asarray(compiled.cpt["old"] if compiled and compiled.cpt
                            else -1, I32),
        cpt_new=jnp.asarray(compiled.cpt["new"] if compiled and compiled.cpt
                            else -1, I32),
        fr_target_type=jnp.asarray(freeze_d["target_type"] if freeze_d else -1, I32),
        fr_final_type=jnp.asarray(freeze_d["final_type"] if freeze_d else -1, I32),
        fr_width=jnp.asarray(
            (np.asarray(box) * freeze_d["width"] if freeze_d
             and freeze_d["width_is_ratio"] else
             np.full(3, freeze_d["width"] if freeze_d else 0.0)), F32),
        fr_dirs=jnp.asarray([(freeze_d is not None and d in freeze_d["dirs"])
                             for d in ("-x", "x", "-y", "y", "-z", "z")]),
        fr_prob=jnp.asarray(freeze_d["prob"] if freeze_d else 0.0, F32),
        fr_p_num=jnp.asarray(freeze_d["p_num"] if freeze_d else 0, I32),
        fr_p_pct=jnp.asarray(freeze_d["p_pct"] if freeze_d else 0.0, F32),
        fr_remove=jnp.asarray(bool(freeze_d and freeze_d["remove"])),
    )

    state = MDState(
        key=jax.random.PRNGKey(opts.rng_seed),
        step=jnp.asarray(0, I32),
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        force=jnp.zeros((n_pad, 3), dtype),
        image=jnp.zeros((n_pad, 3), I32),
        type_id=jnp.asarray(type_id), mass=jnp.asarray(mass), q=jnp.asarray(q),
        chem_state=jnp.asarray(chem_state), res_id=jnp.asarray(res_id),
        mol_id=jnp.asarray(mol_id), lam=jnp.asarray(lam), active=jnp.asarray(active),
        bonds=bonds, angles=angles, dihedrals=dihedrals, pairs14=pairs14,
        fixd_host=jnp.asarray(np.pad(fix_pairs[:, 0] if fix_pairs.size else
                                     np.zeros(0, I32),
                                     (0, cfg.fixd_cap - fix_pairs.shape[0]),
                                     constant_values=-1).astype(I32)),
        fixd_dummy=jnp.asarray(np.pad(fix_pairs[:, 1] if fix_pairs.size else
                                      np.zeros(0, I32),
                                      (0, cfg.fixd_cap - fix_pairs.shape[0]),
                                      constant_values=-1).astype(I32)),
        excl=jnp.asarray(excl), n_excl=jnp.asarray(n_excl, I32),
        adj=jnp.asarray(adj),
        nbr=neighbor.build_neighbor_state(
            jnp.asarray(pos), jnp.asarray(box), jnp.asarray(active), jnp.asarray(excl),
            rc_skin, dims=cell_dims, cell_cap=cell_cap,
            max_neighbors=max_neighbors, excl_cap=excl_cap,
            track_birth=cfg.has_pps),
        box=jnp.asarray(box),
        baro_v=jnp.asarray(0.0, F32),
        reactions_on=jnp.asarray(False),
        reaction_rates=jnp.asarray(compiled.rates if compiled else np.zeros(0, F32)),
        reaction_active=jnp.asarray(np.ones(n_r, bool)),
        reaction_counts=jnp.zeros(n_r, I32),
        intra_counts=jnp.zeros(2, I32),
        freeze_count=jnp.zeros((), I32),
        ev_log_step=jnp.full((), -1, I32),
        ev_log_a=jnp.full(opts.max_events, -1, I32),
        ev_log_b=jnp.full(opts.max_events, -1, I32),
        ev_log_r=jnp.full(opts.max_events, -1, I32),
        ev_log_dist=jnp.full(opts.max_events, -1.0, F32),
        atrp_ratios=jnp.asarray([atrp["ratio_activator"] if atrp else 0.0,
                                 atrp["ratio_deactivator"] if atrp else 0.0], F32),
        atrp_stats=jnp.zeros(2, I32),
    )
    if cfg.bonded_dense:
        from . import bonded_dense

        state = bonded_dense.rederive(cfg, state)
    if cfg.excl_offsets:
        from . import excl_dense

        state = excl_dense.rederive(cfg, state, create=True)

    term_names = (["bond_f%d" % f for f in bond_funcs]
                  + ["angle_f%d" % f for f in angle_funcs]
                  + ["dihedral_f%d" % f for f in dih_funcs])
    return BuiltSystem(cfg=cfg, spec=spec, state=state, obs=obs, reactions=compiled,
                       systop=systop, nb_names=nb_stack.names, term_names=term_names,
                       extra_obs_idx=extra_obs_idx)
