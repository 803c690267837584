"""chemlab_tpu — a TPU-native reactive coarse-grained molecular dynamics framework.

A from-scratch re-design of cgchemlab/chemlab (GROMACS-style reactive MD driven
by a C++/MPI ESPResSo++ engine) for TPUs: the whole hot path — neighbor lists,
pair/bonded forces, velocity-Verlet + thermostats, and the reactive layer (bond
formation/dissociation, type/state changes, dynamic topology) — runs on-device
as fused XLA programs over fixed-shape padded arrays, sharded over a
``jax.sharding.Mesh`` for multi-chip scaling.

Layer map (mirrors the reference's, see SURVEY.md §1):
  - ``files_io``      .gro/.pdb coordinate + table file I/O   (ref: src/chemlab/files_io.py)
  - ``topfile``       GROMACS .top/.itp section parser        (ref: src/chemlab/files_io.py:401)
  - ``topology``      topology compiler -> padded arrays      (ref: src/chemlab/gromacs_topology.py:132)
  - ``reaction_parser``  reaction .cfg INI grammar            (ref: src/chemlab/reaction_parser.py)
  - ``engine``        the TPU device engine (JAX/Pallas)      (ref: external cgchemlab/espressopp C++)
  - ``start_simulation``  CLI orchestration                   (ref: src/start_simulation.py)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience re-exports (keeps `import chemlab_tpu` jax-free)."""
    if name in ("read_coordinates", "read_gro", "write_gro"):
        from . import files_io
        return getattr(files_io, name)
    if name == "build_system_topology":
        from .topology import build_system_topology
        return build_system_topology
    if name == "parse_config":
        from .reaction_parser import parse_config
        return parse_config
    if name in ("build_system", "SimOptions"):
        from .engine import build
        return getattr(build, name)
    if name in ("run_block", "measure", "initial_forces"):
        from .engine import runner
        return getattr(runner, name)
    raise AttributeError(name)
