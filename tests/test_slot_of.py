"""slot_of invariants: the (N,) inverse of the cell-bucket scatter, and the
equivalence of the scatter-built and gather-built cell-dense operands.

The pallas fast path's wrapper relies on slot_of for its epilogue
(pallas_pair.cell_pair_forces): forces come back through slot_of instead of
a scatter-add.  The packed (C, cap, 4) operand is gather-built by default
(measured faster on v5e); CHEMLAB_DENSE=scatter opts into the
scatter-into-zeros build, which must stay bit-identical.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemlab_tpu.engine import neighbor


def _random_system(seed, n=257, box_l=6.0, dims=(4, 4, 4), cap=24,
                   inactive=13):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box_l, (n, 3)), jnp.float32)
    box = jnp.full((3,), box_l, jnp.float32)
    active = jnp.asarray(rng.uniform(size=n) > inactive / n)
    return pos, box, active, dims, cap


@pytest.mark.parametrize("seed", [0, 1])
def test_slot_of_inverts_buckets(seed):
    pos, box, active, dims, cap = _random_system(seed)
    buckets, _, overflow, slot_of = neighbor.build_cell_buckets(
        pos, box, active, dims, cap)
    assert not bool(overflow)
    n_cells = int(np.prod(dims))
    flat = np.asarray(buckets[:n_cells]).reshape(-1)
    slot = np.asarray(slot_of)
    n = pos.shape[0]
    act = np.asarray(active)
    for p in range(n):
        if act[p]:
            # active particle: its slot points back at it
            assert flat[slot[p]] == p
        else:
            # inactive: sentinel, and no real slot holds it
            assert slot[p] == n_cells * cap
            assert not np.any(flat == p)
    # every real slot is owned by exactly the particle that points at it
    owned = flat[flat >= 0]
    assert len(owned) == len(set(owned.tolist()))
    assert sorted(owned.tolist()) == sorted(np.nonzero(act)[0].tolist())


def test_scatter_dense_equals_masked_gather():
    pos, box, active, dims, cap = _random_system(7)
    buckets, _, _, slot_of = neighbor.build_cell_buckets(
        pos, box, active, dims, cap)
    n_cells = int(np.prod(dims))
    type_id = jnp.asarray(
        np.random.default_rng(7).integers(0, 5, pos.shape[0]), jnp.int32)
    tv = jnp.where(active, type_id + 1, 0).astype(pos.dtype)
    packed = jnp.concatenate([pos, tv[:, None]], axis=-1)

    rows = jnp.maximum(buckets[:n_cells], 0)
    gathered = jnp.where((buckets[:n_cells] >= 0)[..., None],
                         packed[rows], 0.0)
    scattered = jnp.zeros((n_cells * cap, 4), pos.dtype).at[slot_of].set(
        packed, mode="drop").reshape(n_cells, cap, 4)
    np.testing.assert_array_equal(np.asarray(gathered), np.asarray(scattered))


def test_dense_mode_forces_identical():
    """CHEMLAB_DENSE=scatter (opt-in) is bit-identical to the default
    masked-gather operand build."""
    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import pallas_pair, runner

    built, _, _ = testsystems.build_melt(n_mols=64, reactive=False,
                                         use_pallas=True)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)

    def call():
        return pallas_pair.cell_pair_forces(
            st.pos, st.type_id, st.active, st.box, st.nbr.buckets,
            cfg.cell_dims, spec, cfg.n_types, cfg.cell_cap, interpret=True,
            uniform_lj=cfg.uniform_lj, slot_of=st.nbr.slot_of)

    old = os.environ.pop("CHEMLAB_DENSE", None)
    try:
        f_g, e_g, _, w_g = call()          # default: masked-gather build
        os.environ["CHEMLAB_DENSE"] = "scatter"
        f_sc, e_sc, _, w_sc = call()
    finally:
        os.environ.pop("CHEMLAB_DENSE", None)
        if old is not None:
            os.environ["CHEMLAB_DENSE"] = old
    np.testing.assert_array_equal(np.asarray(f_sc), np.asarray(f_g))
    assert float(e_sc) == float(e_g)
    assert float(w_sc) == float(w_g)
