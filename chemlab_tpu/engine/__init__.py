"""The TPU device engine.

This package replaces the reference's external C++/MPI ESPResSo++ engine
(SURVEY.md §2.3) with a JAX/XLA implementation over fixed-shape padded
arrays:

  - ``tables``       uniform-grid potential table stacks + interpolation
  - ``spec``         SimSpec: the static compiled description of a system
  - ``state``        MDState: the dynamic pytree (particles + topology)
  - ``neighbor``     cell-list binning and Verlet neighbor lists
  - ``pair_forces``  nonbonded forces (LJ / tabulated / coulomb, all variants)
  - ``bonded_forces``bond/angle/dihedral/1-4 terms over padded index tables
  - ``integrate``    velocity-Verlet + thermostats/barostats
  - ``reactions``    the reactive layer (ChemicalReaction equivalent)
  - ``topo``         on-device topology manager (angle/dihedral generation)
  - ``runner``       fused multi-step run blocks
"""
