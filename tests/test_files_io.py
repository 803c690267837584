"""Coordinate/table I/O tests."""

import math
import os

import numpy as np
import pytest

from chemlab_tpu import files_io


def _write_sample_gro(path, n=4, with_vel=True):
    lines = ["sample system", str(n)]
    for k in range(n):
        base = "%5d%-5s%5s%5d%8.3f%8.3f%8.3f" % (k // 2 + 1, "MOL", "A%d" % k, k + 1,
                                                 0.1 * k, 0.2 * k, 0.3 * k)
        if with_vel:
            base += "%8.3f%8.3f%8.3f" % (0.01 * k, -0.01 * k, 0.5)
        lines.append(base)
    lines.append("5.0 6.0 7.0")
    path.write_text("\n".join(lines) + "\n")


def test_gro_read(tmp_path):
    p = tmp_path / "conf.gro"
    _write_sample_gro(p)
    c = files_io.read_gro(str(p))
    assert c.n_atoms == 4
    assert c.title == "sample system"
    np.testing.assert_allclose(c.box, [5.0, 6.0, 7.0])
    np.testing.assert_allclose(c.pos[2], [0.2, 0.4, 0.6])
    np.testing.assert_allclose(c.vel[3], [0.03, -0.03, 0.5])
    assert list(c.atom_ids) == [1, 2, 3, 4]
    assert c.res_idx[3] == 2


def test_gro_roundtrip(tmp_path):
    p = tmp_path / "conf.gro"
    _write_sample_gro(p, with_vel=False)
    c = files_io.read_gro(str(p))
    assert c.vel is None
    out = tmp_path / "out.gro"
    files_io.write_gro(str(out), c, backup=False)
    c2 = files_io.read_gro(str(out))
    np.testing.assert_allclose(c.pos, c2.pos, atol=1e-3)
    np.testing.assert_allclose(c.box, c2.box, atol=1e-6)


def test_prepare_path_backs_up(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("old")
    files_io.prepare_path(str(p))
    assert not p.exists()
    assert (tmp_path / "_f.txt.1_").read_text() == "old"


def test_table_kind_from_name():
    assert files_io.table_kind_from_name("table_b3.xvg") == "bond"
    assert files_io.table_kind_from_name("table_a12.pot") == "angle"
    assert files_io.table_kind_from_name("table_d1.xvg") == "dihedral"
    assert files_io.table_kind_from_name("table_MA_ML.xvg") == "nonbonded"


def test_read_bonded_xvg(tmp_path):
    p = tmp_path / "table_b1.xvg"
    rows = ["%g %g %g" % (r, r * r, -2 * r) for r in np.linspace(0.0, 1.0, 11)]
    p.write_text("\n".join(rows))
    r, e, f, kind = files_io.read_table(str(p))
    assert kind == "bond"
    assert r[0] > 0.0  # r=0 dropped
    np.testing.assert_allclose(e, r**2, atol=1e-12)


def test_read_angle_xvg_degrees(tmp_path):
    p = tmp_path / "table_a1.xvg"
    degs = np.linspace(1.0, 180.0, 10)
    p.write_text("\n".join("%g %g %g" % (d, 1.0, 2.0) for d in degs))
    r, e, f, kind = files_io.read_table(str(p))
    assert kind == "angle"
    assert r[-1] == pytest.approx(math.pi)
    # force scaled by 180/pi
    assert f[0] == pytest.approx(2.0 * 180.0 / math.pi)


def test_read_nonbonded_xvg_7col(tmp_path):
    p = tmp_path / "table_T1_T2.xvg"
    rows = []
    for r in np.linspace(0.0, 2.0, 21):
        rows.append("%g 0 0 %g %g %g %g" % (r, -(r + 1e-9) ** -6 if r else 0, 1.0, (r + 1e-9) ** -12 if r else 0, 2.0))
    p.write_text("\n".join(rows))
    r, e, f, kind = files_io.read_table(str(p), c6=1.0, c12=1.0)
    assert kind == "nonbonded"
    assert np.all(r > 0)
    np.testing.assert_allclose(f, 3.0 * np.ones_like(f))


def test_convert_table_writes_pot(tmp_path):
    p = tmp_path / "table_b2.xvg"
    p.write_text("\n".join("%g %g %g" % (r, r, 1.0) for r in np.linspace(0.1, 1.0, 10)))
    pot = files_io.convert_table(str(p))
    assert pot.endswith("table_b2.pot")
    assert os.path.exists(pot)
    r, e, f, _ = files_io.read_table(pot)
    assert len(r) == 10


def test_criteria_any_semantics():
    """A run stops when ANY criterion is reached (ref: :759-770)."""
    from chemlab_tpu import tools

    c1 = tools.StopCriterion(kind="conversion", stop_value=0.5, obs_idx=0)
    c2 = tools.StopCriterion(kind="bond_count", stop_value=10,
                             type_pair=(1, 2))
    # neither reached
    assert not tools.criteria_reached([c1, c2], [0.1], {(1, 2): 3})
    # only the conversion reached -> stop
    assert tools.criteria_reached([c1, c2], [0.6], {(1, 2): 3})
    # only the bond count reached -> stop
    assert tools.criteria_reached([c1, c2], [0.1], {(1, 2): 12})


def test_pdb_roundtrip(tmp_path):
    """write_pdb -> read_pdb preserves ids, names, positions, box
    (VERDICT r3 item 9; ref files_io.py:311-398 PDBFile read+write)."""
    p = tmp_path / "conf.gro"
    _write_sample_gro(p, with_vel=False)
    c = files_io.read_gro(str(p))
    # PDB boxes must be cubic for read_pdb
    c.box = np.array([5.0, 5.0, 5.0])
    out = tmp_path / "out.pdb"
    files_io.write_pdb(str(out), c, backup=False)
    c2 = files_io.read_pdb(str(out))
    assert c2.n_atoms == c.n_atoms
    assert list(c2.atom_ids) == list(c.atom_ids)
    assert c2.atom_names == c.atom_names
    assert c2.res_names == [n[:3] for n in c.res_names]
    assert list(c2.res_idx) == list(c.res_idx)
    np.testing.assert_allclose(c2.pos, c.pos, atol=1e-3)
    np.testing.assert_allclose(c2.box, c.box, atol=1e-6)
    # dispatcher sees both suffixes
    c3 = files_io.read_coordinates(str(out))
    np.testing.assert_allclose(c3.pos, c.pos, atol=1e-3)
    files_io.write_coordinates(str(tmp_path / "w.gro"), c, backup=False)
    files_io.write_coordinates(str(tmp_path / "w.pdb"), c, backup=False)


def test_gro_append_trajectory(tmp_path):
    """DumpGRO append mode stacks frames; each frame stays independently
    parseable (ref start_simulation.py:686-696 dump_gro append)."""
    p = tmp_path / "conf.gro"
    _write_sample_gro(p, with_vel=False)
    c = files_io.read_gro(str(p))
    traj = tmp_path / "traj.gro"
    files_io.write_gro(str(traj), c, backup=False)
    c_shift = files_io.read_gro(str(traj))
    c_shift.pos = c_shift.pos + 0.1
    files_io.write_gro(str(traj), c_shift, append=True)
    lines = traj.read_text().splitlines()
    n = c.n_atoms
    frame_len = n + 3
    assert len([l for l in lines if l.strip()]) == 2 * frame_len
    # second frame parses on its own and carries the shifted positions
    second = tmp_path / "second.gro"
    second.write_text("\n".join(lines[frame_len:]) + "\n")
    c2 = files_io.read_gro(str(second))
    np.testing.assert_allclose(c2.pos, c.pos + 0.1, atol=1e-3)
