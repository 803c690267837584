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
