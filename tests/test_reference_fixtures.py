"""Parity tests on the REFERENCE's own unit-test fixtures
(ref: src/tests/test_topology_reader.py, src/tests/test_reaction_parser.py).
"""

import os

import pytest

from chemlab_tpu import reaction_parser
from chemlab_tpu.topology import build_system_topology

REF = "/root/reference/src/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures not mounted")


@pytest.fixture(scope="module")
def systop():
    return build_system_topology(os.path.join(REF, "topol.top"))


def test_replicated_molecule_counts(systop):
    """Same invariant as the reference's test_replicated_molecules: totals
    equal per-molecule counts times replication."""
    top = systop.top
    for attr, table in (("bonds", systop.bonds), ("angles", systop.angles),
                        ("pairs", systop.pairs)):
        expected = sum(n * len(getattr(top.molecule_defs[name], attr))
                       for name, n in top.molecules)
        assert len(table) == expected, attr
    expected_dih = sum(
        n * (len(top.molecule_defs[name].dihedrals)
             + len(top.molecule_defs[name].improper_dihedrals))
        for name, n in top.molecules)
    assert len(systop.dihedrals) == expected_dih
    expected_atoms = sum(n * len(top.molecule_defs[name].atoms)
                         for name, n in top.molecules)
    assert systop.n_atoms == expected_atoms


def test_fixture_atomstate(systop):
    """topol.top's [ atomstate ] entries land on the atom types."""
    states = {sym: rec.get("state") for sym, rec in systop.top.atomtypes.items()
              if "state" in rec}
    assert states, "fixture declares atomstate entries"


def test_reference_exchange_equation():
    """Same equation as the reference's test_reaction_parser.py:27-50."""
    eq = "C(0,1):E(0,1) + W(0,1) -> A(1):Z(1) + E(1)"
    rl, rtype = reaction_parser.parse_exchange_equation(eq)
    assert rtype == reaction_parser.REACTION_EXCHANGE
    assert rl["type_1"]["name"] == "C" and rl["type_1"]["new_type"] == "A"
    assert rl["type_1"]["min"] == 0 and rl["type_1"]["max"] == 1
    assert rl["type_1"]["delta"] == 1
    assert rl["type_2"]["name"] == "E" and rl["type_2"]["new_type"] == "E"
    assert rl["type_2"]["delta"] == 1
    assert rl["type_3"]["name"] == "W" and rl["type_3"]["new_type"] == "Z"
    assert rl["type_3"]["delta"] == 1


def test_malformed_exchange_not_misparsed_as_dissociation():
    """A broken exchange equation must error, not silently register as a
    dissociation (prefix-match hazard in the grammar-trial loop)."""
    bad = "A(1,1):B(1,1) + C(1,1) -> A1(0) + B1(0)"
    with pytest.raises(ValueError):
        reaction_parser.process_reaction([("reaction", bad), ("rate", "1.0"),
                                          ("cutoff", "1.0")])
