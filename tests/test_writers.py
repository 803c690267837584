"""H5MD writer unit tests — in particular the connectivity series
following term-table capacity growth (a reactive run regrows its bond
table mid-run; the dump must widen in place, ref: DumpTopology keeps a
-1-padded fixed-name series)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from chemlab_tpu import writers


def test_connectivity_series_survives_capacity_growth(tmp_path):
    path = str(tmp_path / "t.h5")
    w = writers.H5MDWriter(path, n_particles=4, box=np.ones(3))

    t0 = np.array([[0, 1], [1, 2], [-1, -1]], np.int32)        # cap 3
    w.dump_connectivity("chem_bonds_0", 0, 0.0, t0)
    t1 = np.array([[0, 1], [1, 2], [2, 3], [-1, -1], [-1, -1]],
                  np.int32)                                     # grown to 5
    w.dump_connectivity("chem_bonds_0", 10, 0.1, t1)
    t2 = np.array([[0, 1], [1, 2]], np.int32)                   # shrunk to 2
    w.dump_connectivity("chem_bonds_0", 20, 0.2, t2)
    w.close()

    with h5py.File(path, "r") as f:
        v = f["connectivity/chem_bonds_0/value"][...]
        s = f["connectivity/chem_bonds_0/step"][...]
    assert list(s) == [0, 10, 20]
    assert v.shape == (3, 5, 2)
    # frame 0 backfilled with -1 beyond its original cap
    assert np.array_equal(v[0, :3], t0)
    assert (v[0, 3:] == -1).all()
    assert np.array_equal(v[1], t1)
    # shrunk frame padded back up with -1
    assert np.array_equal(v[2, :2], t2)
    assert (v[2, 2:] == -1).all()
