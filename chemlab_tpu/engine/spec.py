"""SimSpec: the static, compiled description of a simulation.

The reference configures ~40 espressopp interaction objects through Python
calls (SURVEY.md §2.3).  Here the same information is lowered into dense
arrays indexed by type id, so a single fused XLA program can evaluate every
potential variant branchlessly:

  - per-type-pair nonbonded dispatch tables (kind/params/cutoff/cap/table
    ids/mixing descriptors) covering nonbond_params func codes
    1,8,9,10,11,12,13,15,16,17 (ref: gromacs_topology.py:463-899)
  - uniform-grid table stacks for nonbonded / bond / angle / dihedral tables
  - per-type bonded parameter lookup tables (the FixedPairListTypes*
    behavior; ref: gromacs_topology.py:949-961)
  - reaction channel tables (ref: reaction_setup.py) and post-process
    descriptors
  - conversion observable descriptors (espressopp.analysis.ChemicalConversion*)

``EngineConfig`` carries the static (hashable) compile-time facts; ``SimSpec``
is a pytree of device arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# ---- nonbonded pair kinds --------------------------------------------------
PAIR_NONE = 0
PAIR_LJ = 1
PAIR_TAB = 2

# ---- pair mixing modes -----------------------------------------------------
MIX_STATIC = 0       # blend factor is mix_x
MIX_OBS = 1          # blend factor from conversion observable obs_idx
MIX_MULTIRANGE = 2   # tables and factor resolved from range entries per step

# ---- reaction post-process sides -------------------------------------------
SIDE_T1 = 0
SIDE_T2 = 1
SIDE_BOTH = 2


def _dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static compile-time configuration (hashable; goes to jit as static)."""

    n_types: int
    n_particles: int          # real particle count
    n_pad: int                # padded particle count (multiple of 128)
    max_neighbors: int        # K
    cell_cap: int             # max particles per cell bucket
    cell_dims: tuple          # static cell-grid dims (from the initial box)
    deg_cap: int              # adjacency fan-out
    bond_cap: int
    angle_cap: int
    dihedral_cap: int
    pair14_cap: int
    excl_cap: int
    max_events: int           # reaction events applied per interval
    n_reactions: int
    n_groups: int
    n_obs: int
    bond_funcs: tuple         # func codes present (static + type tables)
    angle_funcs: tuple
    dihedral_funcs: tuple
    thermostat: str           # 'lv' | 'vr' | 'br' | 'iso' | 'no'
    barostat: str             # 'no' | 'br' | 'lv'
    has_coulomb: bool
    has_reactions: bool
    reaction_interval: int
    nearest_mode: bool
    max_per_interval: int
    exclude_new_bonds: bool   # add created bonds to the exclusion list
    n_mix_entries: int        # func-9/17 range entry count
    needs_conversions: bool   # any conversion-dependent potential active
    use_pallas: bool          # cell-tile pallas pair kernel (TPU fast path)
    has_lj: bool              # any LJ type pair
    has_tabulated: bool       # any tabulated type pair
    has_caps: bool            # any caprad / per-pair max_force
    has_pps: bool             # any func-14 ParticlePairScaling ramp
    has_lambda_pairs: bool    # any dynamic-resolution nonbonded
    use_thermal_group: bool
    nb_bins: int
    max_ppnb: int             # ChangeNeighboursProperty entry count
    max_nb_level: int         # deepest neighbour-property BFS level
    has_atrp: bool
    n_atrp: int               # ATRP reactive-center entry count
    atrp_interval: int
    atrp_num: int             # particles sampled per ATRP invocation
    atrp_select_from_all: bool  # sample all particles vs reactive centers
                                # only (ref: reaction_post_process.py:384-397)
    has_dissociation: bool
    has_fixd: bool            # FixDistances constraints present
    fixd_cap: int             # constraint table capacity
    n_fd: int                 # FixDistances definition count
    has_dyn_resolution: bool  # any per-type lambda ramp active
    restrict_scan: int        # max whitelist entries sharing a lo index
    n_rb: int                 # RemoveNeighboursBonds entry count
    has_cpt: bool             # ChangeParticleType extension active
    cpt_interval: int
    cpt_num: int
    has_freeze: bool          # FreezeRegion extension active
    freeze_mode: str = "prob" # 'prob' | 'num' | 'pct' selection discipline
    iso_coupling: int = 1     # isokinetic rescale interval in steps
                              # (ref Isokinetic coupling = int(thermostat_gamma),
                              #  ref: start_simulation.py:345-348)
    store_pressure: bool = False  # P/L observables without a barostat
                                  # (ref: start_simulation.py:466-469)
    # -- lazy-row (pallas fast path) reaction geometry --
    # With the cell-tile force kernel the Verlet rows are needed ONLY for
    # reaction matching, so the per-step rebuild shrinks to a bucket refresh
    # and rows are built transiently inside reaction_step on a SMALLER cell
    # grid sized by the reaction cutoffs (<< force cutoff) — the dominant
    # rebuild cost drops with (rc_rx / rc_skin)^3.
    lazy_rows: bool = False   # rows built only at reaction steps (pallas mode)
    uniform_lj: bool = False  # every type pair is PAIR_LJ with identical
                              # sig/eps/cutoff/shift: the kernel skips the
                              # one-hot parameter contractions entirely
    all_lj: bool = False      # every type pair is PAIR_LJ (parameters may
                              # differ): the kernel skips the islj gate plane
    # -- Chebyshev-compressed tabulated pairs on the pallas fast path
    #    (tab_cheb.py): enabled only when every USED pair table passed the
    #    build-time fit validation; degrees are part of the jit key --
    tab_cheb: bool = False
    cheb_kw: int = 0          # wall-piece Chebyshev terms
    cheb_ko: int = 0          # well-piece terms (0 = single-piece tables)
    cheb_ntab: int = 0        # table-scalar kernel mode: number of distinct
                              # used pair tables (0 = per-type-pair
                              # coefficient-plane mode).  With few tables the
                              # kernel evaluates each table's polynomial from
                              # SMEM scalars and selects by ONE table-id
                              # plane — replacing kw+ko+6 per-packet MXU
                              # coefficient dots with one (ROOFLINE_r05.md).
    cheb_mix: bool = False    # func-10/12 conversion-mixed tables on the
                              # table-scalar path: blend x*T_a + (1-x)*T_b
                              # per pair via a second table-id plane and a
                              # per-step x plane (ref:
                              # gromacs_topology.py:574-583,756-790)
    rx_dims: tuple = (1, 1, 1)    # reaction cell grid
    rx_cell_cap: int = 8
    rx_k: int = 8             # reaction neighbor-row width
    rx_rc: float = 0.0        # reaction candidate radius
    # -- compacted reaction matching --
    # Most particles cannot be the type_1 side of any channel (e.g. radicals
    # in an ATRP melt): candidate rows are built only for the S1 = matching-
    # type_1-window particles, shrinking the reaction-interval cost from
    # O(N * K) to O(|S1| * K) with deterministic scatter-min conflict
    # resolution.  Gated off when the type_1 types span the bulk.
    rx_compact: bool = False
    rx_rows_cap: int = 0      # static capacity for S1 rows (overflow-flagged)
    has_mixed_tables: bool = False  # any pair can blend two tables (func
                                    # 9/10/12/17): the b-table interpolation
                                    # (a second gather pass) is compiled only
                                    # when this is set
    # -- dense-static bonded operands (bonded_dense.py) --
    # Chain terms with consecutive endpoint ids evaluate on rolled planes
    # (slot = base particle id): zero gather forward, zero scatter in the
    # AD transpose.  The irregular remainder (reactive crosslinks) keeps
    # the gather path at a small capacity that grows in lockstep with the
    # canonical caps (irr count is bounded by static-irregular + dynamic
    # appends; aligned static rows can only be invalidated, never become
    # irregular).
    bonded_dense: bool = False
    bond_irr_cap: int = 0
    angle_irr_cap: int = 0
    # -- dense-static exclusion correction (excl_dense.py) --
    # Chain exclusions (b, b+d) for d in this static offset set evaluate
    # on rolled planes (same trick as bonded_dense applied to the
    # all-pairs-minus-excluded subtraction); the irregular remainder
    # (reactive cross-molecule exclusions) keeps the flat-path correction
    # at excl_irr_cap rows.  Empty tuple = feature off (flat path).
    excl_offsets: tuple = ()
    excl_irr_cap: int = 0
    # Active device mesh (jax.sharding.Mesh, hashable) for row-sharding
    # constraints on the rebuild's (N, S*cap) candidate planes — GSPMD loses
    # the row partitioning across the rebuild's gather/sort boundaries
    # without them (MULTICHIP_r02/r03: a full-size (N, 1080) f32 plane stayed
    # replicated inside the skin cond).  Part of the static jit key, so a
    # meshed trace can never be reused for an unmeshed call or vice versa.
    mesh: object = None


@_dataclass
@dataclasses.dataclass
class SimSpec:
    """Device-array description of the system (pytree)."""

    # -- integration scalars --
    dt: jnp.ndarray
    kT: jnp.ndarray           # target temperature in energy units
    gamma: jnp.ndarray        # thermostat coupling
    max_force: jnp.ndarray    # global force cap, <=0 disables
    pressure: jnp.ndarray     # target pressure (barostats)
    barostat_tau: jnp.ndarray
    barostat_gammaP: jnp.ndarray
    barostat_mass: jnp.ndarray
    skin: jnp.ndarray
    thermal_type_mask: jnp.ndarray   # (T,) bool: types the thermostat acts on

    # -- per-type property tables (for type-change post-processes) --
    type_mass: jnp.ndarray    # (T,)
    type_q: jnp.ndarray       # (T,)
    type_state: jnp.ndarray   # (T,) initial chemical state

    # -- nonbonded pair dispatch, flattened (T*T,) --
    pair_kind: jnp.ndarray
    pair_sig: jnp.ndarray
    pair_eps: jnp.ndarray
    pair_cutoff2: jnp.ndarray
    pair_shift: jnp.ndarray
    pair_caprad: jnp.ndarray      # 0 = uncapped
    pair_tab_a: jnp.ndarray       # int32 table ids
    pair_tab_b: jnp.ndarray
    pair_mix_mode: jnp.ndarray
    pair_mix_x: jnp.ndarray
    pair_obs: jnp.ndarray         # int32 observable id
    pair_lam_scale: jnp.ndarray   # bool: scale by lam_i * lam_j
    pair_max_force: jnp.ndarray   # per-pair force cap, <=0 none
    pair_pps_incr: jnp.ndarray    # func 14 per-step pair-scale increment, 0=off
    qq_prefactor: jnp.ndarray
    qq_cutoff2: jnp.ndarray

    # -- func 9 / 17 range entries --
    mix_pair: jnp.ndarray     # (M,) int32 flattened pair index
    mix_lo: jnp.ndarray       # (M,)
    mix_hi: jnp.ndarray
    mix_tab_a: jnp.ndarray
    mix_tab_b: jnp.ndarray    # == tab_a for func 9
    mix_obs: jnp.ndarray

    # -- cell stencil for the pallas pair kernel --

    # -- table stacks --
    nb_ef: jnp.ndarray        # (nT, bins, 2)
    nb_ef4: jnp.ndarray       # (nT, bins, 4) interleaved lo/hi rows: the hot
                              # path fetches both interpolation endpoints in
                              # one gather (tables.interleave4)
    nb_r0: jnp.ndarray
    nb_dr: jnp.ndarray
    bond_ef: jnp.ndarray
    bond_r0: jnp.ndarray
    bond_dr: jnp.ndarray
    angle_ef: jnp.ndarray
    angle_r0: jnp.ndarray
    angle_dr: jnp.ndarray
    dih_ef: jnp.ndarray
    dih_r0: jnp.ndarray
    dih_dr: jnp.ndarray

    # -- per-type bonded parameter lookup (dynamic-type terms) --
    bond_func_tt: jnp.ndarray     # (T, T) int32
    bond_par_tt: jnp.ndarray      # (T, T, P)
    angle_func_tt: jnp.ndarray    # (T, T, T)
    angle_par_tt: jnp.ndarray     # (T, T, T, P)
    dih_func_tt: jnp.ndarray      # (T, T, T, T)
    dih_par_tt: jnp.ndarray       # (T, T, T, T, P)

    # -- conversion observables: entry lists --
    obs_entry_obs: jnp.ndarray    # (nE,) observable id per entry
    obs_entry_type: jnp.ndarray   # (nE,) type id to count
    obs_entry_state: jnp.ndarray  # (nE,) required state, -1 = any
    obs_total: jnp.ndarray        # (n_obs,) denominator

    # -- reaction channels (R,) --
    r_t1: jnp.ndarray
    r_t2: jnp.ndarray
    r_min1: jnp.ndarray
    r_max1: jnp.ndarray
    r_min2: jnp.ndarray
    r_max2: jnp.ndarray
    r_delta1: jnp.ndarray
    r_delta2: jnp.ndarray
    r_cutoff2: jnp.ndarray
    r_min_cutoff2: jnp.ndarray
    r_sigma: jnp.ndarray          # >0 enables Gaussian cutoff
    r_eq: jnp.ndarray
    r_intramolecular: jnp.ndarray  # bool: allow same-molecule pairs
    r_intraresidual: jnp.ndarray   # bool: allow same-residue pairs
    r_virtual: jnp.ndarray         # bool: no bond created
    r_is_diss: jnp.ndarray         # bool: dissociation channel
    r_diss_fade: jnp.ndarray       # bool: lambda fade-out on break (alpha)
    r_diss_rate: jnp.ndarray       # spontaneous break probability
    r_group: jnp.ndarray           # int32 group id
    # type-change post-process per side (-1 = no change)
    r_new_type1: jnp.ndarray
    r_new_type2: jnp.ndarray
    # bonded-neighbour state constraint on type_1 (exchange reactions;
    # ref: reaction_setup.py:205-206); -1 disables
    r_cnb_type: jnp.ndarray
    r_cnb_min: jnp.ndarray
    r_cnb_max: jnp.ndarray

    # -- reaction groups --
    g_func: jnp.ndarray           # (G,) bond potential func for created bonds
    g_params: jnp.ndarray         # (G, P)

    # -- ChangeNeighboursProperty entries --
    ppnb_reaction: jnp.ndarray    # (PB,) owning reaction id
    ppnb_side: jnp.ndarray        # (PB,) SIDE_*
    ppnb_old_type: jnp.ndarray
    ppnb_level: jnp.ndarray
    ppnb_new_type: jnp.ndarray
    ppnb_new_state: jnp.ndarray   # -1 = keep / use incr
    ppnb_incr_state: jnp.ndarray
    ppnb_min_state: jnp.ndarray   # state window on the target (exchange)
    ppnb_max_state: jnp.ndarray

    # -- ATRPActivator (ref: reaction_post_process.py:380-426) --
    atrp_type: jnp.ndarray        # (nA,) reactive-center type
    atrp_state: jnp.ndarray       # (nA,) required state
    atrp_is_activator: jnp.ndarray  # (nA,) bool: consumes deactivator pool
    atrp_new_type: jnp.ndarray
    atrp_delta: jnp.ndarray       # state increment
    atrp_num: jnp.ndarray         # particles sampled per interval
    atrp_k_activate: jnp.ndarray
    atrp_k_deactivate: jnp.ndarray
    atrp_delta_catalyst: jnp.ndarray

    # -- hybrid-bond lambda ramp (FixedListDynamicResolution;
    #    ref: start_simulation.py:289-293); 0 disables --
    hybrid_bond_rate: jnp.ndarray
    # reaction-generated angles/dihedrals fade in at these per-step rates
    # (t_hybrid_angle/t_hybrid_dihedral; dead flags even in the reference —
    #  implemented here as the natural extension of the bond ramp)
    hybrid_angle_rate: jnp.ndarray
    hybrid_dihedral_rate: jnp.ndarray

    # -- BasicDynamicResolution: per-type per-step lambda increment, and the
    #    property change fired at lambda >= 1 (ref: reaction_post_process.py:291-310) --
    dr_alpha: jnp.ndarray         # (T,) float32, 0 = off
    dr_final_type: jnp.ndarray    # (T,) int32, -1 = keep type
    dr_set_state: jnp.ndarray     # (T,) bool: final change includes state

    # -- FixDistances definitions (ReleaseMolecule + JoinMolecule instances;
    #    ref: reaction_post_process.py:203-362).  A constraint row's owning
    #    definition is identified by its dummy particle's type. --
    fd_eq: jnp.ndarray            # (K,) float32 constraint length
    fd_host_type: jnp.ndarray     # (K,) int32; >=0 -> release on host type change
    fd_dummy_type: jnp.ndarray    # (K,) int32 dummy particle type
    fd_target_type: jnp.ndarray   # (K,) int32 type set on release
    fd_release_lam: jnp.ndarray   # (K,) float32 lambda set on release
    fd_capture_lam: jnp.ndarray   # (K,) float32 lambda set on join capture
    fd_capture_state: jnp.ndarray # (K,) int32 state set on join capture
    r_release_n: jnp.ndarray      # (R,) int32 constraints released per event side
    r_release_side: jnp.ndarray   # (R,) int32 SIDE_*
    # JoinMolecule per-channel capture (ref: reaction_post_process.py:322-362):
    # fd def index (releases-then-joins order) of the channel's join, -1 = none
    r_join_def: jnp.ndarray       # (R,) int32

    # -- RestrictReaction connectivity whitelist (ref: reaction_setup.py:115-128):
    #    lexicographically sorted (lo, hi) int32 pairs; int32-safe for TPU
    #    (jax downcasts int64 with x64 disabled) --
    restrict_lo: jnp.ndarray      # (M,) int32 sorted
    restrict_hi: jnp.ndarray     # (M,) int32, sorted within equal lo runs
    r_restricted: jnp.ndarray     # (R,) bool

    # -- RemoveNeighboursBonds rows (ref: reaction_post_process.py:117-137) --
    rb_reaction: jnp.ndarray      # (RB,) owning channel
    rb_side: jnp.ndarray          # (RB,) SIDE_*
    rb_anchor_type: jnp.ndarray   # (RB,) required type of the reacting anchor
    rb_level: jnp.ndarray         # (RB,) topological distance of the bond
    rb_t1: jnp.ndarray            # (RB,)
    rb_t2: jnp.ndarray            # (RB,)

    # -- ChangeParticleType extension (ref: reaction_post_process.py:364-378) --
    cpt_old: jnp.ndarray          # () int32
    cpt_new: jnp.ndarray          # () int32

    # -- FreezeRegion / ChangeInRegion (ref: reaction_post_process.py:139-201) --
    fr_target_type: jnp.ndarray   # () int32
    fr_final_type: jnp.ndarray    # () int32
    fr_width: jnp.ndarray         # (3,) float32 edge-region width
    fr_dirs: jnp.ndarray          # (6,) bool [-x, x, -y, y, -z, z]
    fr_prob: jnp.ndarray          # () float32 per-step freeze probability
    fr_p_num: jnp.ndarray         # () int32 freeze at most N per step (0=off)
    fr_p_pct: jnp.ndarray         # () float32 freeze fraction per step (0=off)
    fr_remove: jnp.ndarray        # () bool remove instead of freeze

    # -- Chebyshev-compressed tabulated pairs (tab_cheb.py): per-TABLE fit
    #    arrays, lowered to per-type-pair LUT matrices inside the pallas
    #    wrapper.  None unless cfg.tab_cheb (fits validated at build). --
    cheb_wall_g: jnp.ndarray = None   # (nT, kw) F/r coeffs in y01(1/r^2)
    cheb_wall_e: jnp.ndarray = None   # (nT, kw)
    cheb_well_g: jnp.ndarray = None   # (nT, ko) F/r coeffs in x01(r)
    cheb_well_e: jnp.ndarray = None   # (nT, ko)
    cheb_ay: jnp.ndarray = None       # (nT,) y01 = ay / max(r2, rcap2) + by
    cheb_by: jnp.ndarray = None
    cheb_ax: jnp.ndarray = None       # (nT,) x01 = ax * r + bx
    cheb_bx: jnp.ndarray = None
    cheb_rs2: jnp.ndarray = None      # (nT,) wall/well switch on r2
    cheb_rcap2: jnp.ndarray = None    # (nT,) wall clamp radius^2
    # table-scalar kernel mode (cfg.cheb_ntab > 0): compact used-table
    # slot per type pair (+1, 0 = no table) and the (n_tab, P) per-table
    # scalar pack (tab_cheb.pack_table_scalars layout)
    cheb_tab_slot: jnp.ndarray = None  # (T*T,) float32
    cheb_sc: jnp.ndarray = None        # (n_tab, 2kw+2ko+6) float32
    # cfg.cheb_mix: second-table slot per type pair (+1, 0 = pure pair —
    # pure pairs blend with x forced to 1 so both modes stay bit-identical)
    cheb_tab_slot_b: jnp.ndarray = None  # (T*T,) float32
