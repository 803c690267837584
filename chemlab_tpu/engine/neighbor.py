"""Cell-list binning and Verlet neighbor lists.

TPU-native replacement for the reference's DomainDecomposition cell grid +
VerletList (ref: start_simulation.py:158-197; SURVEY.md §2.2): particles are
binned into fixed-capacity cell buckets with a sort, each particle gathers
candidates from its (statically deduplicated) neighboring cells, and the K
nearest in-range candidates form the neighbor rows.  The list is reused until
the maximum displacement exceeds skin/2 (the classic Verlet criterion the
reference engine uses for its rebuild trigger).

Everything is shape-static: cell grid dims come from EngineConfig, bucket
overflow raises a flag instead of reallocating.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .state import NeighborState

I32 = jnp.int32


def row_constraint(mesh):
    """Row-sharding constraint applier for (N, ...) planes.

    With a mesh, returns a function pinning dim 0 to the mesh's (single) data
    axis via ``with_sharding_constraint``; without one, the identity.  The
    rebuild's candidate planes are the largest buffers in the whole step
    ((N, S*cap) ~ 432 MB at 100k) and GSPMD drops their row partitioning
    across the block-gather/reshape boundaries unless constrained.
    """
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec

    ax = mesh.axis_names[0]

    def constrain(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(ax, *([None] * (x.ndim - 1)))))

    return constrain


def choose_cell_grid(box: np.ndarray, rc_skin: float, margin: float = 1.02):
    """Pick static cell-grid dims: cell edge >= rc_skin * margin.

    The margin keeps the grid valid under small barostat box changes.
    """
    dims = tuple(max(1, int(np.floor(b / (rc_skin * margin)))) for b in box)
    return dims


def neighbor_cell_offsets(dims):
    """Static, deduplicated 27-stencil offsets.

    For grid dims < 3 the periodic wrap makes offsets coincide; deduplicate at
    trace time so small boxes don't double-count pairs.
    """
    seen = set()
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                key = (dx % dims[0], dy % dims[1], dz % dims[2])
                if key not in seen:
                    seen.add(key)
                    out.append(key)
    return np.asarray(out, dtype=np.int32)


def _rank_in_run(sorted_keys):
    """Rank of each element within its run of equal (sorted) keys."""
    n = sorted_keys.shape[0]
    idx = jnp.arange(n, dtype=I32)
    is_start = jnp.concatenate([jnp.ones(1, bool), sorted_keys[1:] != sorted_keys[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    return idx - run_start


def build_cell_buckets(pos, box, active, dims, cell_cap):
    """Scatter particles into (n_cells+1, cell_cap) index buckets (-1 padded).

    Inactive particles land in the trailing junk bin and are silently dropped
    on overflow; real-bin overflow sets the returned flag.

    Also returns ``slot_of`` (N,) int32 — each particle's flat slot index
    into the real bins (cid * cell_cap + rank), with the sentinel
    ``n_cells * cell_cap`` for inactive/dropped particles.  It is the exact
    inverse of ``buckets``; the pallas force path uses it to turn the
    epilogue scatter-add (~C*cap rows) into an (N,) gather.
    """
    n_cells = int(np.prod(dims))
    dims_a = jnp.asarray(dims, dtype=I32)
    frac = pos / box
    ci = jnp.clip((frac * dims_a).astype(I32), 0, dims_a - 1)
    cid = (ci[:, 0] * dims[1] + ci[:, 1]) * dims[2] + ci[:, 2]
    cid = jnp.where(active, cid, n_cells)

    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    rank = _rank_in_run(sorted_cid)
    overflow = jnp.any((rank >= cell_cap) & (sorted_cid < n_cells))
    # out-of-capacity entries get dropped by scatter mode='drop'
    rank_c = jnp.where(rank < cell_cap, rank, cell_cap + n_cells)
    buckets = jnp.full((n_cells + 1, cell_cap), -1, dtype=I32)
    buckets = buckets.at[sorted_cid, rank_c].set(order.astype(I32), mode="drop")
    flat_slot = jnp.where((sorted_cid < n_cells) & (rank < cell_cap),
                          sorted_cid * cell_cap + rank,
                          n_cells * cell_cap).astype(I32)
    slot_of = jnp.zeros(pos.shape[0], I32).at[order].set(flat_slot)
    return buckets, ci, overflow, slot_of


def build_exclusion_rows(excl_pairs, n_pad, excl_cap):
    """Flat exclusion pairs -> per-particle rows (N, EXCL_CAP), -1 padded.

    The flat list is the DynamicExcludeList analog; rows are rebuilt from it
    whenever the neighbor list is rebuilt (exclusions only change at reaction
    events, which force a rebuild).
    """
    a = excl_pairs[:, 0]
    b = excl_pairs[:, 1]
    rows = jnp.concatenate([a, b])
    vals = jnp.concatenate([b, a])
    valid = rows >= 0
    rows = jnp.where(valid, rows, n_pad)  # junk row
    order = jnp.argsort(rows)
    rows_s = rows[order]
    vals_s = vals[order]
    rank = _rank_in_run(rows_s)
    overflow = jnp.any((rank >= excl_cap) & (rows_s < n_pad))
    rank_c = jnp.where(rank < excl_cap, rank, excl_cap + n_pad)
    out = jnp.full((n_pad + 1, excl_cap), -1, dtype=I32)
    out = out.at[rows_s, rank_c].set(vals_s.astype(I32), mode="drop")
    return out[:n_pad], overflow


@functools.partial(jax.jit, static_argnames=("dims", "cell_cap", "max_neighbors",
                                             "excl_cap", "track_birth", "mesh"))
def build_neighbor_state(pos, box, active, excl_pairs, rc_skin, *, dims, cell_cap,
                         max_neighbors, excl_cap, track_birth: bool = False,
                         prev=None, step=None, mesh=None):
    """Build a fresh NeighborState.

    Rows list the K nearest in-range (< rc_skin) active candidates of each
    particle; unused slots point at the particle itself (zero displacement,
    masked out by callers).  ``excl_mask[i, k]`` is True when (i, nbr[i,k]) is
    an excluded pair.

    With ``track_birth`` (ParticlePairScaling, nonbonded func 14) each slot
    carries the step its pair first entered the list: pairs found in the
    previous list inherit their birth step, new pairs start at ``step``.
    """
    n_pad = pos.shape[0]
    n_cells = int(np.prod(dims))
    rows = row_constraint(mesh)
    buckets, ci, overflow, slot_of = build_cell_buckets(pos, box, active,
                                                        dims, cell_cap)
    offsets = jnp.asarray(neighbor_cell_offsets(dims))  # (S, 3)
    dims_a = jnp.asarray(dims, dtype=I32)

    # candidate cells per particle: (N, S)
    nc = (ci[:, None, :] + offsets[None, :, :]) % dims_a
    ncid = rows((nc[..., 0] * dims[1] + nc[..., 1]) * dims[2] + nc[..., 2])

    # squared distances with minimum image on per-axis (N, S*cap) planes.
    # Candidate data is fetched CELL-BLOCK-wise from ONE packed plane of
    # [x, y, z, id+1] rows (built by a single N-row scatter through
    # slot_of): block-row copies measured ~50x cheaper than per-element
    # gathers on v5e (33 ms vs 4.8 s for the 151M-element candidate matrix
    # at 100k) AND their cost is per-ROW, so packing position + identity
    # into one row replaces the former four block gathers (bucket ids +
    # three per-axis planes) with one.  Per-axis math stays on strided
    # (N, S*cap) slices — no (.., small)-minor tensor is ever materialized
    # (a wide (N, S*cap, 3) gather can come back T(8,128)-padded, 42x HBM).
    pid1 = (jnp.arange(n_pad, dtype=I32) + 1).astype(pos.dtype)
    plane4 = jnp.zeros(((n_cells + 1) * cell_cap, 4), pos.dtype)
    # inactive/dropped rows carry the sentinel slot n_cells*cell_cap, which
    # lands in the junk row — never gathered (ncid indexes real cells only)
    plane4 = plane4.at[slot_of].set(
        jnp.concatenate([pos, pid1[:, None]], axis=-1))
    import os as _os

    mode = _os.environ.get("CHEMLAB_REBUILD", "")
    if not mode:
        # the fused plane holds N * S * cap * 16 bytes of scratch (1.7 GB
        # at 100k); beyond ~3 GB fall back to per-channel gathers rather
        # than risk the HBM peak (shapes are static, so this is a
        # compile-time choice)
        fused_bytes = n_pad * offsets.shape[0] * cell_cap * 16
        mode = "fused" if fused_bytes < 3e9 else "split"
    if mode == "split":
        # per-channel block gathers: 4x the gather rows but the fused
        # (N, S*cap*4) plane is never held — the lower-peak-scratch form
        # for very large N (the fused plane is ~1.7 GB at 100k, K-free)
        plane4c = plane4.reshape(n_cells + 1, cell_cap, 4)
        d2 = jnp.zeros((n_pad, ncid.shape[1] * cell_cap), pos.dtype)
        for ax in range(3):
            cand_ax = rows(plane4c[:, :, ax][ncid].reshape(n_pad, -1))
            d = cand_ax - pos[:, ax][:, None]
            d -= box[ax] * jnp.round(d / box[ax])
            d2 += d * d
        d2 = rows(d2)
        cand = rows(plane4c[:, :, 3][ncid].reshape(n_pad, -1)
                    .astype(I32) - 1)
    else:
        plane4r = plane4.reshape(n_cells + 1, cell_cap * 4)
        g = rows(plane4r[ncid].reshape(n_pad, -1))   # (N, S*cap*4), 1 gather
        d2 = jnp.zeros((n_pad, g.shape[1] // 4), pos.dtype)
        for ax in range(3):
            d = g[:, ax::4] - pos[:, ax][:, None]
            d -= box[ax] * jnp.round(d / box[ax])
            d2 += d * d
        d2 = rows(d2)
        # id+1 channel: holes are 0 -> -1, exactly the old bucket padding;
        # ids are exact in f32 up to 2^24 rows
        cand = rows(g[:, 3::4].astype(I32) - 1)      # (N, S*cap)
    cand_safe = jnp.maximum(cand, 0)

    self_idx = jnp.arange(n_pad, dtype=I32)
    valid = (cand >= 0) & (cand != self_idx[:, None]) & (d2 < rc_skin * rc_skin)
    # NOTE: no active[cand] gather — build_cell_buckets bins inactive
    # particles into the junk row, so a real slot's id is always active
    valid &= active[:, None]
    valid = rows(valid)

    # nearest-K compaction via top_k on -d2: measured 2x faster than the
    # cumsum + flat-scatter pack on v5e (scatters serialize), and when a
    # row has more than K in-range candidates it keeps the NEAREST K
    # instead of an arbitrary subset (the overflow flag still rises)
    neg_d2 = -jnp.where(valid, d2, jnp.inf)
    if mesh is None:
        _, sel = jax.lax.top_k(neg_d2, max_neighbors)
    else:
        # top_k lowers to a TopK custom-call GSPMD cannot partition: it
        # all-gathers the (N, S*cap) plane (412 MB at 100k) and replicates
        # the outputs.  Row-wise top_k is embarrassingly parallel, so run it
        # per-device under shard_map — bit-identical per-row results to the
        # global call, zero collectives.
        from jax.sharding import PartitionSpec

        try:
            from jax import shard_map
        except ImportError:          # older jax
            from jax.experimental.shard_map import shard_map

        ax = mesh.axis_names[0]
        sel = shard_map(
            lambda x: jax.lax.top_k(x, max_neighbors)[1],
            mesh=mesh,
            in_specs=PartitionSpec(ax, None),
            out_specs=PartitionSpec(ax, None))(neg_d2)
    sel = rows(sel)
    nbr = jnp.take_along_axis(cand_safe, sel, axis=1)
    ok = jnp.take_along_axis(valid, sel, axis=1)
    nbr = rows(jnp.where(ok, nbr, self_idx[:, None]))
    nbr_overflow = jnp.max(jnp.sum(valid.astype(I32), axis=1)) > max_neighbors

    # exclusion mask — broadcast with K (not EXCL_CAP) as the minor dim:
    # (N, EXCL_CAP, K) keeps the 128-lane axis well filled, where
    # (N, K, EXCL_CAP) would pad a ~16-wide lane dim 8x
    excl_rows, excl_overflow = build_exclusion_rows(excl_pairs, n_pad, excl_cap)
    excl_rows = rows(excl_rows)
    excl_mask = rows(jnp.any(nbr[:, None, :] == excl_rows[:, :, None], axis=1))

    if track_birth:
        now = jnp.asarray(0 if step is None else step, I32)
        birth = jnp.full(nbr.shape, now, I32)
        if prev is not None:
            # inherit birth steps for pairs that persisted across the rebuild
            match = nbr[:, :, None] == prev.idx[:, None, :]     # (N, K, Kold)
            had = jnp.any(match, axis=-1)
            old_birth = jnp.min(
                jnp.where(match, prev.birth[:, None, :], jnp.iinfo(I32).max),
                axis=-1).astype(I32)
            birth = jnp.where(had, old_birth, birth)
    else:
        birth = jnp.zeros((1, 1), I32)

    return NeighborState(
        idx=nbr,
        excl_mask=excl_mask,
        ref_pos=pos,
        buckets=buckets,
        slot_of=rows(slot_of),
        birth=birth,
        overflow=overflow | nbr_overflow | excl_overflow,
        n_rebuilds=jnp.asarray(1, I32),
    )


@functools.partial(jax.jit, static_argnames=("dims", "cell_cap"))
def refresh_buckets(nbr: NeighborState, pos, box, active, *, dims, cell_cap):
    """Re-bin particles into cell buckets WITHOUT rebuilding neighbor rows.

    The pallas cell-tile force path consumes only the buckets; rows (and the
    exclusion mask) are rebuilt transiently at reaction steps.  Keeps the
    Verlet guarantee by resetting ref_pos."""
    import dataclasses

    buckets, _, overflow, slot_of = build_cell_buckets(pos, box, active,
                                                       dims, cell_cap)
    return dataclasses.replace(
        nbr, buckets=buckets, slot_of=slot_of, ref_pos=pos,
        overflow=nbr.overflow | overflow,
        n_rebuilds=nbr.n_rebuilds + 1)


def needs_rebuild(pos, nbr: NeighborState, box, skin):
    """Verlet criterion: any displacement since rebuild exceeds skin/2."""
    dr = pos - nbr.ref_pos
    dr -= box * jnp.round(dr / box)
    d2 = jnp.sum(dr * dr, axis=-1)
    return jnp.max(d2) > (0.5 * skin) ** 2
