"""Multi-chip scaling over a jax.sharding.Mesh.

The reference scales by spatial domain decomposition over MPI ranks
(SURVEY.md §2.2/§5.7: node grid, cell grid, ghost halo exchange).  The
TPU-native equivalent here is single-program data parallelism over particle
rows: every per-particle array (positions, velocities, forces, types, the
neighbor rows, the bonded term tables) is sharded over the mesh's ``data``
axis, the SimSpec is replicated, and XLA's GSPMD partitioner inserts the
collectives (all-gathers for neighbor position reads — the halo exchange
analog, riding ICI — and psums for observables and the force scatter of
bonded terms).

Entry points:
  - :func:`make_mesh`      — build a 1-D device mesh
  - :func:`shard_system`   — place a BuiltSystem's state onto the mesh
  - the engine's jitted ``runner.run_block`` runs unchanged on sharded state
"""

from .sharding import (make_mesh, meshed_cfg, shard_state, shard_system,
                       state_sharding)

__all__ = ["make_mesh", "meshed_cfg", "shard_state", "shard_system",
           "state_sharding"]
