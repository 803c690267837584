"""CLI-level sharding: main() places state on the full virtual device mesh
(the reference's every run is MPI-launched over a node grid;
ref: start_simulation.py:152-171)."""

import os

import jax
import pytest

from chemlab_tpu import start_simulation

EXAMPLE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "examples", "atrp_melt")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cli_runs_sharded(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(EXAMPLE)
    start_simulation.main([
        "@params",
        "--node_grid", "2,2,2",
        "--run", "200", "--int_step", "200",
        "--start_ar", "0",
        "--trj_collect", "200", "--energy_collect", "200",
        "--topol_collect", "200",
        "--output_prefix", str(tmp_path) + "/",
        "--output_file", str(tmp_path / "trj.h5"),
    ])
    out = capsys.readouterr().out
    assert "Device mesh: 8 x cpu" in out
    assert (tmp_path / "trj.h5").exists()
    assert (tmp_path / "_energy.csv").exists()
