"""Type-lookup miss keeps the bond's static potential.

A reaction/activation can retype a bonded particle into a signature with no
[bondtypes] entry; the per-row lookup then yields func 0.  The row must fall
back to its static (birth) potential — in the reference, terms keep their
original FixedPairList potential unless a registered entry replaces them.
A silently forceless bond lets the excluded pair collapse to r=0, which the
cell-tile path's compute-all-minus-excluded formulation amplifies into an
f32-cancellation explosion (observed live before this guard).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import bonded_forces, runner


def test_lookup_miss_keeps_static_bond_force():
    built, systop, _ = testsystems.build_melt(n_mols=40, reactive=True)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)

    # retype one bonded MA -> FA: the trimer topology has no FA-ML bondtype
    tid = np.asarray(st.type_id).copy()
    fa = systop.atomsym_atomtype["FA"]
    ml = systop.atomsym_atomtype["ML"]
    bidx = np.asarray(st.bonds.idx)
    ok = np.asarray(st.bonds.valid)
    row = int(np.where(ok)[0][0])
    a, b = bidx[row]
    a_t, b_t = tid[a], tid[b]
    # pick the MA side (the other is ML)
    p = a if tid[b] == ml else b
    tid[p] = fa
    assert int(spec.bond_func_tt[fa, ml]) == 0, "fixture: FA-ML must be absent"
    # stretch the bond off its equilibrium so the harmonic force is nonzero
    pos = np.asarray(st.pos).copy()
    pos[p] += 0.2
    pos_j = jnp.asarray(pos)
    st = dataclasses.replace(st, pos=pos_j)
    st2 = dataclasses.replace(st, type_id=jnp.asarray(tid))

    f1, _ = bonded_forces.bonded_forces(spec, cfg, st.pos, st.box, st.type_id,
                                        st.q, st.bonds, st.angles,
                                        st.dihedrals, st.pairs14)
    f2, _ = bonded_forces.bonded_forces(spec, cfg, st2.pos, st2.box,
                                        st2.type_id, st2.q, st2.bonds,
                                        st2.angles, st2.dihedrals, st2.pairs14)
    # the bond force on the retyped particle survives (same static params)
    assert float(jnp.max(jnp.abs(f2[p]))) > 0.0
    np.testing.assert_allclose(np.asarray(f1[p]), np.asarray(f2[p]), atol=1e-5)
