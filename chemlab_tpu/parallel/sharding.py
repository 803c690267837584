"""Sharding placement for the MD state pytree."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None,
              node_grid=None) -> Mesh:
    """A 1-D mesh over the particle axis (the reference's node grid is 3-D
    over space; a 1-D row shard is the natural XLA layout since spatial
    locality is re-established by the cell sort each rebuild).

    ``node_grid`` accepts the reference's ``x,y,z`` process-grid flag and
    flattens it: GSPMD row sharding is grid-shape agnostic, so the product
    simply selects the device count (ref: start_simulation.py:152-157).
    """
    if node_grid is not None:
        if isinstance(node_grid, str):
            node_grid = tuple(int(x) for x in node_grid.split(","))
        n_devices = int(np.prod(node_grid))
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                # the reference errors when node grid != world size
                # (ref: start_simulation.py:152-157)
                raise ValueError("requested %d devices, only %d available"
                                 % (n_devices, len(devices)))
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def _row_sharded(mesh, ndim):
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def state_sharding(mesh: Mesh, state):
    """Sharding pytree for an MDState: arrays whose leading dim is the padded
    particle count or a term-table capacity shard over ``data``; scalars and
    channel tables replicate."""
    n_pad = state.pos.shape[0]
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())

    def spec_for(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return repl
        d0 = leaf.shape[0]
        # particle arrays and capacity-padded tables (all multiples of 128,
        # so they divide evenly over <=128 devices of a power-of-two mesh)
        if d0 >= n_dev and d0 % n_dev == 0 and d0 >= 128:
            return _row_sharded(mesh, leaf.ndim)
        return repl

    return jax.tree_util.tree_map(spec_for, state)


def shard_state(mesh: Mesh, state):
    """device_put the state according to :func:`state_sharding`."""
    sh = state_sharding(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def shard_system(built, mesh: Mesh):
    """Place a BuiltSystem on the mesh: replicated spec, sharded state.

    Returns ``(spec, state)``; pair with :func:`meshed_cfg` so the engine's
    rebuild applies its row-sharding constraints (the candidate planes
    otherwise lose their partitioning across gather/sort boundaries).
    """
    repl = NamedSharding(mesh, P())
    spec = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), built.spec)
    state = shard_state(mesh, built.state)
    return spec, state


def meshed_cfg(cfg, mesh: Mesh):
    """EngineConfig carrying the active mesh (static jit key: a meshed trace
    is never reused for an unmeshed call)."""
    import dataclasses

    return dataclasses.replace(cfg, mesh=mesh)
