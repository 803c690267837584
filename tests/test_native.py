"""Native host library vs Python fallback equivalence."""

import numpy as np
import pytest

from chemlab_tpu import files_io, native, testsystems
from chemlab_tpu.topology import generate_exclusions

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_gro_roundtrip_matches_python(tmp_path):
    c = testsystems.melt_coordinates(500, 0.3, seed=2)
    path = str(tmp_path / "m.gro")
    files_io.write_gro(path, c, backup=False)
    ref = files_io.read_gro(path)
    nat = files_io.read_gro_native(path)
    assert nat.n_atoms == ref.n_atoms
    np.testing.assert_allclose(nat.pos, ref.pos)
    np.testing.assert_allclose(nat.box, ref.box)
    assert nat.res_names == ref.res_names
    assert nat.atom_names == ref.atom_names
    assert np.array_equal(nat.res_idx, ref.res_idx)


def test_exclusions_match_python():
    rng = np.random.RandomState(0)
    # random branched graph
    bonds = [(i, i + 1) for i in range(1, 300)]
    bonds += [(int(rng.randint(1, 300)), int(rng.randint(1, 300))) for _ in range(50)]
    bonds = [(a, b) for a, b in bonds if a != b]
    nat = native.generate_exclusions(bonds, 3)
    lib = native._LIB
    try:
        native._LIB = None
        py = generate_exclusions(bonds, 3)
    finally:
        native._LIB = lib
    assert nat == py
