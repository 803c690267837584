"""Slab domain decomposition with explicit ppermute halo exchange for the
pallas pair kernel (the multi-chip fast path).

The reference scales spatially: DomainDecomposition assigns each rank a
box region and exchanges ghost-particle layers with its neighbors every
step (ref: start_simulation.py:155-171, espressopp storage).  The GSPMD
row-sharded engine has no spatial ownership, so a meshed `pallas_call` is
replicated work: XLA cannot partition the kernel, every device computes
the full cell grid, and the operands round-trip through all-gathers
(MULTICHIP_r05.md audit).

This module is the TPU-native analog of the reference's ghost exchange,
behind `CHEMLAB_HALO=1` on a meshed cfg:

  - the cell grid is slabbed along x (cell ids are x-major, so a slab is
    a contiguous row range of the bucket table: device d owns layers
    [d*w, (d+1)*w), w = nx / n_devices);
  - under `shard_map`, each device `ppermute`s its boundary x-layers to
    its ring neighbors — TWO (ny*nz, cap) layer transfers replace the
    all-gather of the full cell-dense operand, and periodicity comes from
    the ring wrap;
  - each device runs the colt2 kernel on its slab only (x_halo mode:
    offset x indexing into the haloed operand, grid over the w inner
    layers) — per-device kernel time divides by the mesh size instead of
    replicating;
  - slot forces scatter into per-device partial (N, 3) arrays that
    `psum_scatter` back to the particle-row sharding the integrator uses.

Per-step collective bill (audited): one broadcast of the packed (N, 4)
particle rows, two (ny*nz, cap) ppermutes, one (N, 3) psum_scatter +
scalar psum — strictly below the GSPMD path's per-step volume at 100k
(MULTICHIP_r05.md table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import pallas_pair


def supports(cfg) -> bool:
    """Slab mode needs a mesh, >= 2 devices, and an x cell-layer count the
    mesh divides (w >= 1; the z/y axes stay whole per device).

    AUTO-ENABLED for qualifying meshed cfgs (CHEMLAB_HALO=0 opts out; the
    audited per-step collective bill is strictly below the GSPMD path's,
    MULTICHIP_r05.md) — build with ``SimOptions.slab_devices = n_devices``
    so the cell grid's x-layer count is rounded to a dividing multiple."""
    import os

    if cfg.mesh is None or os.environ.get("CHEMLAB_HALO", "1") == "0":
        return False
    d = cfg.mesh.devices.size
    return d > 1 and cfg.cell_dims[0] % d == 0 and cfg.cell_dims[0] // d >= 1


def cell_pair_forces_halo(pos, type_id, active, box, buckets, dims, spec,
                          n_types: int, cap: int, mesh,
                          interpret: bool = False, uniform_lj: bool = False,
                          want_virial: bool = False,
                          cheb_kw: int = 0, cheb_ko: int = 0,
                          want_energy: bool = True, all_lj: bool = False,
                          cheb_ntab: int = 0, cheb_mix: bool = False,
                          obs_x=None):
    """Same contract as pallas_pair.cell_pair_forces (UNexcluded all-pairs
    sum; callers subtract exclusions), evaluated slab-parallel."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    nx, ny, nz = (int(d) for d in dims)
    n_dev = mesh.devices.size
    ax_name = mesh.axis_names[0]
    w = nx // n_dev
    layer = ny * nz                         # cells per x-layer
    n_cells = nx * ny * nz
    n = pos.shape[0]

    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_pair(pos, type_id, active, box, bloc, spec, obs_in):
        # bloc: (w*layer, cap) — this device's slab of the bucket table
        bloc = bloc.reshape(w * layer, cap)
        left = jax.lax.ppermute(bloc[-layer:], ax_name, fwd)
        right = jax.lax.ppermute(bloc[:layer], ax_name, bwd)
        ext = jnp.concatenate([left, bloc, right], axis=0)
        out_flat = pallas_pair.cell_pair_forces_colt(
            pos, type_id, active, box, ext, (w + 2, ny, nz), spec,
            n_types, cap, interpret=interpret, uniform_lj=uniform_lj,
            want_virial=want_virial, impl="colt2",
            cheb_kw=cheb_kw, cheb_ko=cheb_ko,
            lj_on=(cheb_kw == 0), x_halo=True,
            want_energy=want_energy, all_lj=all_lj,
            cheb_ntab=cheb_ntab, cheb_mix=cheb_mix,
            obs_x=obs_in if cheb_mix else None)             # (w*layer*cap, 4)
        # every particle lives in exactly one slot of exactly one slab
        flat_rows = jnp.where(bloc >= 0, bloc, n).reshape(-1)
        force = jnp.zeros((n, 3), pos.dtype).at[flat_rows].set(
            out_flat[:, :3], mode="drop")
        ch3 = jax.lax.psum(jnp.sum(out_flat[:, 3]), ax_name)
        # back to the integrator's particle-row sharding: each device keeps
        # its N/D rows of the summed force
        force = jax.lax.psum_scatter(force, ax_name, scatter_dimension=0,
                                     tiled=True)
        return force, ch3

    pspec = jax.tree_util.tree_map(lambda _: P(), spec)
    obs_in = (obs_x if obs_x is not None
              else jnp.zeros((1,), pos.dtype))   # replicated placeholder
    force, s3 = shard_map(
        local_pair, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(ax_name), pspec, P()),
        out_specs=(P(ax_name), P()),
        check_vma=False,
    )(pos, type_id, active, box, buckets[:n_cells], spec, obs_in)

    zero = jnp.asarray(0.0, pos.dtype)
    if want_virial:
        return force, zero, zero, s3
    if cheb_kw:
        return force, zero, s3, zero
    return force, s3, zero, zero
