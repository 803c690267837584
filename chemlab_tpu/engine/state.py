"""MDState: the dynamic simulation state pytree.

Everything the reference engine mutates at runtime lives here as fixed-shape
padded device arrays:

  - particle store: the 8-property schema of the reference
    (id/type/pos/mass/q/res_id/state/lambda_adr; ref: gromacs_topology.py:1418-1441)
    plus velocity/force/image and a molecule id maintained by the topology
    manager
  - bonded term tables (bonds/angles/dihedrals/1-4 pairs) with -1-padded index
    rows: the analog of Fixed{Pair,Triple,Quadruple}List(+Types,+Lambda)
    (SURVEY.md §2.3) — entries carry their own func code and parameter vector;
    rows flagged ``typelookup`` re-resolve parameters from the per-type tables
    each evaluation (the FixedPairListTypes* behavior needed for dynamic types)
  - the exclusion pair list (DynamicExcludeList) and bonded adjacency
    (TopologyManager's bond graph)
  - Verlet-list caches and per-reaction runtime parameters

Index convention: all particle indices are 0-based rows; -1 marks padding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# number of parameter slots per bonded term entry
N_BOND_PARAMS = 6

I32 = jnp.int32
F32 = jnp.float32


def _dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_dataclass
@dataclasses.dataclass
class TermTable:
    """A padded bonded-term table (bonds/angles/dihedrals/1-4 pairs)."""

    idx: jnp.ndarray         # (cap, arity) int32, -1 padded
    func: jnp.ndarray        # (cap,) int32, 0 = invalid row
    params: jnp.ndarray      # (cap, N_BOND_PARAMS) float32
    typelookup: jnp.ndarray  # (cap,) bool — resolve params by particle types
    lam: jnp.ndarray         # (cap,) float32 per-entry lambda (hybrid bonds)
    group: jnp.ndarray       # (cap,) int32 reaction-group id, -1 = static
    count: jnp.ndarray       # () int32 cursor (rows [0, count) may be valid)

    @property
    def capacity(self) -> int:
        return self.idx.shape[0]

    @property
    def arity(self) -> int:
        return self.idx.shape[1]

    @property
    def valid(self) -> jnp.ndarray:
        return self.idx[:, 0] >= 0

    @staticmethod
    def create(cap: int, arity: int, idx=None, func=None, params=None,
               typelookup=None, lam=None, group=None) -> "TermTable":
        n = 0 if idx is None else len(idx)
        out_idx = np.full((cap, arity), -1, dtype=np.int32)
        out_func = np.zeros(cap, dtype=np.int32)
        out_par = np.zeros((cap, N_BOND_PARAMS), dtype=np.float32)
        out_tl = np.zeros(cap, dtype=bool)
        out_lam = np.ones(cap, dtype=np.float32)
        out_grp = np.full(cap, -1, dtype=np.int32)
        if n:
            out_idx[:n] = idx
            if func is not None:
                out_func[:n] = func
            if params is not None:
                out_par[:n, : np.asarray(params).shape[1]] = params
            if typelookup is not None:
                out_tl[:n] = typelookup
            if lam is not None:
                out_lam[:n] = lam
            if group is not None:
                out_grp[:n] = group
        return TermTable(
            idx=jnp.asarray(out_idx),
            func=jnp.asarray(out_func),
            params=jnp.asarray(out_par),
            typelookup=jnp.asarray(out_tl),
            lam=jnp.asarray(out_lam),
            group=jnp.asarray(out_grp),
            count=jnp.asarray(n, dtype=I32),
        )


@_dataclass
@dataclasses.dataclass
class NeighborState:
    """Verlet neighbor list cache (rebuilt on displacement trigger)."""

    idx: jnp.ndarray        # (N, K) int32 neighbor rows, N (=self) padded
    excl_mask: jnp.ndarray  # (N, K) bool — True when pair is excluded
    ref_pos: jnp.ndarray    # (N, 3) positions at last rebuild
    buckets: jnp.ndarray    # (n_cells+1, cap) cell-dense rows (pallas path)
    slot_of: jnp.ndarray    # (N,) int32 inverse of buckets: flat real-bin
                            # slot per particle (n_cells*cap = dropped)
    birth: jnp.ndarray      # (N, K) int32 step the pair first appeared
                            # (ParticlePairScaling, func 14; (1,1) when unused)
    overflow: jnp.ndarray   # () bool — any neighbor slot overflowed
    n_rebuilds: jnp.ndarray # () int32


@_dataclass
@dataclasses.dataclass
class MDState:
    key: jnp.ndarray      # PRNG key
    step: jnp.ndarray     # () int32 global MD step

    # particle store
    pos: jnp.ndarray      # (N, 3) float32, folded into box
    vel: jnp.ndarray      # (N, 3)
    force: jnp.ndarray    # (N, 3)
    image: jnp.ndarray    # (N, 3) int32 periodic image counters
    type_id: jnp.ndarray  # (N,) int32
    mass: jnp.ndarray     # (N,) float32
    q: jnp.ndarray        # (N,) float32
    chem_state: jnp.ndarray  # (N,) int32 chemical state
    res_id: jnp.ndarray   # (N,) int32 residue id (from input)
    mol_id: jnp.ndarray   # (N,) int32 connected-component id (topology manager)
    lam: jnp.ndarray      # (N,) float32 lambda_adr resolution
    active: jnp.ndarray   # (N,) bool — False for padding rows

    # dynamic topology
    bonds: TermTable
    angles: TermTable
    dihedrals: TermTable
    pairs14: TermTable
    excl: jnp.ndarray       # (E, 2) int32 exclusion pairs, -1 padded
    n_excl: jnp.ndarray     # () int32
    adj: jnp.ndarray        # (N, DEG) int32 bonded adjacency, -1 padded

    # FixDistances constraint table (host, dummy) rows, -1 padded
    fixd_host: jnp.ndarray  # (F,) int32
    fixd_dummy: jnp.ndarray # (F,) int32

    # neighbor cache
    nbr: NeighborState

    # box (mutable under barostats)
    box: jnp.ndarray        # (3,) float32
    baro_v: jnp.ndarray     # () float32 — barostat log-volume velocity (lv)

    # reaction runtime parameters (mutable: rates via arrhenius, active flags)
    reactions_on: jnp.ndarray      # () bool — master switch (start_ar gate)
    reaction_rates: jnp.ndarray    # (R,) float32
    reaction_active: jnp.ndarray   # (R,) bool
    reaction_counts: jnp.ndarray   # (R,) int32 accepted events per channel
    intra_counts: jnp.ndarray      # (2,) int32 [intra, inter] residue counters
    atrp_ratios: jnp.ndarray       # (2,) float32 [activator, deactivator]
    atrp_stats: jnp.ndarray        # (2,) int32 [activated, deactivated]
    freeze_count: jnp.ndarray      # () int32 cumulative frozen/removed
    # last reaction interval's accepted events (pair_distances_filename dump;
    # ref: reaction_parser.py:198): -1 padded, refreshed each firing
    ev_log_step: jnp.ndarray       # () int32 step of the last firing (-1 none)
    ev_log_a: jnp.ndarray          # (E,) int32
    ev_log_b: jnp.ndarray          # (E,) int32
    ev_log_r: jnp.ndarray          # (E,) int32
    ev_log_dist: jnp.ndarray       # (E,) float32

    # dense-static bonded operands (cfg.bonded_dense; None otherwise):
    # DERIVED views of bonds/angles (bonded_dense.derive_aligned),
    # refreshed at build and at the end of every reaction interval —
    # the canonical tables above stay the source of truth
    bonds_dense: TermTable | None = None
    bonds_irr: TermTable | None = None
    angles_dense: TermTable | None = None
    angles_irr: TermTable | None = None

    # dense-static exclusion operands (cfg.excl_offsets; None otherwise):
    # DERIVED views of the flat excl list (excl_dense.derive) — per-offset
    # mask planes + the compacted irregular remainder, refreshed on the
    # same cadence as the bonded operands above
    excl_masks: jnp.ndarray | None = None   # (n_offsets, N) bool
    excl_irr: jnp.ndarray | None = None     # (excl_irr_cap, 2) int32

    @property
    def n_particles(self) -> int:
        return self.pos.shape[0]
