"""Reaction .cfg grammar tests (ref strategy: src/tests/test_reaction_parser.py)."""

import textwrap

import pytest

from chemlab_tpu import reaction_parser as rp


def test_parse_normal_equation():
    rl, kind = rp.parse_equation("FA(3, 4) + MA(1, 2) -> FA(1):DA(2)")
    assert kind == rp.REACTION_NORMAL
    assert rl["type_1"]["name"] == "FA"
    assert rl["type_1"]["min"] == 3 and rl["type_1"]["max"] == 4
    assert rl["type_1"]["new_type"] == "FA" and rl["type_1"]["delta"] == 1
    assert rl["type_2"]["name"] == "MA"
    assert rl["type_2"]["new_type"] == "DA" and rl["type_2"]["delta"] == 2


def test_parse_dissociation_equation():
    rl, kind = rp.parse_reverse_equation("A(1,3):B(0,2) -> A(-1) + B(1)")
    assert kind == rp.REACTION_DISSOCATION
    assert rl["type_1"]["delta"] == -1
    assert rl["type_2"]["delta"] == 1
    assert rl["type_1"]["new_type"] == "A"


def test_parse_exchange_equation():
    rl, kind = rp.parse_exchange_equation("C(0,1):E(0,1) + W(0,1) -> A(1):Z(1) + E(1)")
    assert kind == rp.REACTION_EXCHANGE
    assert rl["type_1"]["name"] == "C"
    assert rl["type_1"]["new_type"] == "A"
    assert rl["type_1"]["min"] == 0 and rl["type_1"]["max"] == 1
    assert rl["type_2"]["name"] == "E"
    assert rl["type_2"]["new_type"] == "E"
    assert rl["type_2"]["delta"] == 1
    assert rl["type_3"]["name"] == "W"
    assert rl["type_3"]["new_type"] == "Z"
    assert rl["type_3"]["delta"] == 1


def test_parse_full_config(tmp_path):
    cfg = textwrap.dedent(
        """
        [general]
        interval: 200
        nearest=0

        [ext_change]
        ext_type=ChangeNeighboursProperty
        invoke_on=both
        type_transfers=MA:2->PA,ML:1->PL(state=1)

        [group_g1]
        potential=Harmonic
        potential_options=K=30.0,r0=0.97
        extensions=change

        [reaction_a]
        reaction: FA(3, 4) + MA(1, 2) -> FA(1):DA(2)
        cutoff: 1.2
        rate: 0.8
        intramolecular: 1
        intraresidual: 0
        active: True
        group: g1
        """
    )
    path = tmp_path / "r.cfg"
    path.write_text(cfg)
    config = rp.parse_config(str(path))
    assert config["general"]["interval"] == 200
    assert config["general"]["nearest"] is False
    assert config["general"]["max_per_interval"] == -1
    g1 = config["reactions"]["g1"]
    assert g1["potential"] == "Harmonic"
    assert g1["potential_options"] == {"K": "30.0", "r0": "0.97"}
    assert g1["extensions"]["change"]["class"] == "ChangeNeighboursProperty"
    assert len(g1["reaction_list"]) == 1
    r = g1["reaction_list"][0]
    assert r["rate"] == 0.8
    assert r["cutoff"] == 1.2
    assert r["intramolecular"] is True
    assert r["intraresidual"] is False
    assert r["active"] is True
    assert r["reaction_type"] == rp.REACTION_NORMAL


def test_reaction_without_cutoff_raises(tmp_path):
    cfg = "[group_g]\npotential=Harmonic\npotential_options=K=1,r0=1\n" \
          "[reaction_x]\nreaction: A(0,1) + B(0,1) -> A(1):B(1)\nrate: 1.0\ngroup: g\n"
    path = tmp_path / "bad.cfg"
    path.write_text(cfg)
    with pytest.raises(ValueError):
        rp.parse_config(str(path))


def test_smooth_cutoff_and_dissociation(tmp_path):
    cfg = textwrap.dedent(
        """
        [general]
        interval: 100

        [group_g]
        potential=Harmonic
        potential_options=K=1,r0=1

        [reaction_d]
        reaction: A(1,3):B(0,2) -> A(-1) + B(1)
        sigma: 0.05
        eq_distance: 1.1
        rate: 1.0
        diss_rate: 0.2
        alpha: 0.001
        group: g
        """
    )
    path = tmp_path / "d.cfg"
    path.write_text(cfg)
    config = rp.parse_config(str(path))
    r = config["reactions"]["g"]["reaction_list"][0]
    assert r["reaction_type"] == rp.REACTION_DISSOCATION
    assert r["sigma"] == 0.05
    assert r["eq_distance"] == 1.1
    assert r["diss_rate"] == 0.2
    assert r["alpha"] == 0.001
