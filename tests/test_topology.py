"""Topology reader/compiler tests (ref strategy: src/tests/test_topology_reader.py)."""

import os

import numpy as np
import pytest

from chemlab_tpu import topfile, topology

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def systop():
    return topology.build_system_topology(os.path.join(DATA, "sys.top"))


def test_replicated_counts(systop):
    # TRI x3 (3 atoms, 2 bonds, 1 angle) + DIM x2 (2 atoms, 1 bond)
    assert systop.n_atoms == 3 * 3 + 2 * 2
    assert len(systop.bonds) == 3 * 2 + 2 * 1
    assert len(systop.angles) == 3 * 1
    assert len(systop.dihedrals) == 0


def test_atom_ids_contiguous(systop):
    # All bond indices must be valid 1-based atom ids.
    for (i, j) in systop.bonds:
        assert 1 <= i <= systop.n_atoms
        assert 1 <= j <= systop.n_atoms
    # DIM bonds live after the TRI block.
    dim_bonds = [b for b in systop.bonds if b[0] > 9]
    assert sorted(dim_bonds) == [(10, 11), (12, 13)]


def test_type_registry_master_union(systop):
    # Molecule order assigns AA=0, BB=1, CC=2; master-only types follow.
    assert systop.atomsym_atomtype["AA"] == 0
    assert systop.atomsym_atomtype["BB"] == 1
    assert systop.atomsym_atomtype["CC"] == 2
    # XX, YY appear only in [ atomtypes ] of the master file (reaction products).
    assert "XX" in systop.atomsym_atomtype
    assert "YY" in systop.atomsym_atomtype
    assert systop.next_type_id == 5


def test_atomstate_from_ff(systop):
    # AA state=1, BB state=2 (from [ atomstate ] in the included ff.itp).
    states = systop.states
    assert states[0] == 1  # AA
    assert states[1] == 2  # BB
    assert states[2] == 0  # CC has no atomstate entry


def test_per_particle_params(systop):
    assert systop.masses[2] == 2.0
    assert np.all(systop.type_ids[:3] == [0, 1, 2])
    assert np.all(systop.type_ids[9:] == [0, 0, 0, 0])


def test_bondparams_expansion(systop):
    aa, bb, cc = 0, 1, 2
    assert tuple(sorted((aa, bb))) in systop.bondparams
    assert systop.bondparams[(aa, bb)]["func"] == 1
    assert systop.bondparams[(aa, bb)]["params"][0] == "0.50"
    # XX-BB tabulated bond type
    xx = systop.atomsym_atomtype["XX"]
    assert systop.bondparams[tuple(sorted((xx, bb)))]["func"] == 8


def test_angleparams_canonical_key(systop):
    aa, bb, cc = 0, 1, 2
    key = (aa, bb, cc)
    assert key in systop.angleparams
    assert systop.angleparams[key]["func"] == 1


def test_exclusions_nrexcl(systop):
    # TRI has nrexcl=2: 1-2, 2-3 bonds plus the 1-3 second neighbour.
    assert (1, 2) in systop.exclusions
    assert (2, 3) in systop.exclusions
    assert (1, 3) in systop.exclusions
    # second TRI copy shifted by 3
    assert (4, 6) in systop.exclusions
    # DIM has a single bond
    assert (10, 11) in systop.exclusions
    assert len(systop.exclusions) == 3 * 3 + 2 * 1


def test_generate_exclusions_ring():
    # A 4-ring with nrexcl=3 excludes every pair exactly once.
    bonds = [(1, 2), (2, 3), (3, 4), (4, 1)]
    excl = topology.generate_exclusions(bonds, 3)
    assert excl == {(1, 2), (2, 3), (3, 4), (1, 4), (1, 3), (2, 4)}


def test_c6c12_conversion():
    sig, eps = topology.convert_c6c12(1.0, 1.0, 1)
    assert sig == pytest.approx(1.0)
    assert eps == pytest.approx(0.25)
    # Rule 2 passes through unchanged.
    assert topology.convert_c6c12(0.3, 0.5, 2) == (0.3, 0.5)


def test_combination_rules():
    sig, eps = topology.combine_lj(1.0, 4.0, 4.0, 1.0, 1)
    assert sig == pytest.approx(2.0)
    assert eps == pytest.approx(2.0)
    sig, eps = topology.combine_lj(1.0, 4.0, 4.0, 1.0, 2)
    assert sig == pytest.approx(2.5)
    assert eps == pytest.approx(2.0)


def test_defines_and_includes(tmp_path):
    (tmp_path / "inc.itp").write_text("#define MYK 42.0\n[ bondtypes ]\nPP QQ 1 0.3 MYK\n")
    (tmp_path / "main.top").write_text(
        '#include "inc.itp"\n[ atomtypes ]\nPP 1.0 0.0 A 1 1\nQQ 1.0 0.0 A 1 1\n'
        "[ moleculetype ]\nM 1\n[ atoms ]\n1 PP 1 M P 1 0.0 1.0\n2 QQ 1 M Q 2 0.0 1.0\n"
        "[ bonds ]\n1 2\n[ system ]\nx\n[ molecules ]\nM 1\n"
    )
    st = topology.build_system_topology(str(tmp_path / "main.top"))
    key = tuple(sorted((st.atomsym_atomtype["PP"], st.atomsym_atomtype["QQ"])))
    assert st.bondparams[key]["params"] == ["0.3", "42.0"]


def test_improper_dihedral_section(tmp_path):
    (tmp_path / "m.top").write_text(
        "[ atomtypes ]\nA1 1.0 0.0 A 1 1\n"
        "[ moleculetype ]\nM 1\n"
        "[ atoms ]\n1 A1 1 M a 1\n2 A1 1 M b 2\n3 A1 1 M c 3\n4 A1 1 M d 4\n5 A1 1 M e 5\n"
        "[ bonds ]\n1 2\n"
        "[ dihedrals ]\n1 2 3 4 1 180 5 2\n"
        "[ dihedrals ]\n2 3 4 5 12 180 5\n"
        "[ system ]\nx\n[ molecules ]\nM 1\n"
    )
    tf = topfile.read_topology_file(str(tmp_path / "m.top"))
    mol = tf.molecule_defs["M"]
    assert (1, 2, 3, 4) in mol.dihedrals
    assert (2, 3, 4, 5) in mol.improper_dihedrals
