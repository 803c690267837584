"""Split the pair-call cost: pure pallas kernel vs wrapper (operand build +
epilogue), plus the excluded-pair correction and the bonded pass — the
three biggest non-kernel step components at 100k (TPU_NUMBERS_r04 bisect).

Usage: python scripts/wrapper_split.py [n_mols]
"""
import functools
import json
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import bonded_forces, pallas_pair, runner

n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 33334
built, _, _ = testsystems.build_melt(n_mols=n_mols, reactive=True)
spec, cfg = built.spec, built.cfg
st = runner.initial_forces(spec, cfg, built.state)
st = testsystems.warmup(built, st, steps=200)

n_cells = int(np.prod(cfg.cell_dims))
cap = cfg.cell_cap
print(json.dumps({"n": cfg.n_particles, "cap": cap,
                  "dims": list(cfg.cell_dims),
                  "excl_rows": int(st.excl.shape[0]),
                  "bond_cap": int(st.bonds.idx.shape[0]),
                  "angle_cap": int(st.angles.idx.shape[0]),
                  "dih_cap": int(st.dihedrals.idx.shape[0]),
                  "n_bonds": int(jnp.sum(st.bonds.valid)),
                  "n_angles": int(jnp.sum(st.angles.valid))}), flush=True)


def timeit(f, *args, reps=20):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


# full pair call (operand + kernel + epilogue), both kernels
for kind in ("cell", "colt"):
    import os
    os.environ["CHEMLAB_KERNEL"] = kind
    full = jax.jit(lambda s: pallas_pair.cell_pair_forces(
        s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
        spec, cfg.n_types, cap, uniform_lj=cfg.uniform_lj,
        slot_of=s.nbr.slot_of)[0])
    print(json.dumps({"pair_full_%s_ms" % kind: round(timeit(full, st), 3)}),
          flush=True)
    os.environ.pop("CHEMLAB_KERNEL", None)

# operand build alone (masked gather, the default)
@jax.jit
def operand(s):
    rows = jnp.maximum(s.nbr.buckets[:n_cells], 0)
    tv = jnp.where(s.active, s.type_id + 1, 0).astype(s.pos.dtype)
    packed = jnp.concatenate([s.pos, tv[:, None]], axis=-1)
    return jnp.where((s.nbr.buckets[:n_cells] >= 0)[..., None],
                     packed[rows], 0.0)

cpos = operand(st)
print(json.dumps({"operand_gather_ms": round(timeit(operand, st), 3)}),
      flush=True)

# epilogue alone: slot_of row gather out of a (C*cap, 4) flat result
flat = jnp.zeros((n_cells * cap, 4), jnp.float32)

@jax.jit
def epilogue(fl, s):
    in_grid = s.nbr.slot_of < n_cells * cap
    rows_f = fl[jnp.where(in_grid, s.nbr.slot_of, 0)]
    return jnp.where(in_grid[:, None], rows_f[:, :3], 0.0)

print(json.dumps({"epilogue_gather_ms": round(timeit(epilogue, flat, st), 3)}),
      flush=True)

# excluded-pair correction alone
exc = jax.jit(lambda s: pallas_pair.excluded_pair_correction(
    spec, cfg.n_types, s.pos, s.box, s.type_id, s.excl, active=s.active,
    has_tab=cfg.has_tabulated)[0])
print(json.dumps({"excl_correction_ms": round(timeit(exc, st), 3)}),
      flush=True)

# bonded: grad-based (production) vs energy-only forward
bf = jax.jit(lambda s: bonded_forces.bonded_forces(
    spec, cfg, s.pos, s.box, s.type_id, s.q, s.bonds, s.angles,
    s.dihedrals, s.pairs14)[0])
print(json.dumps({"bonded_grad_ms": round(timeit(bf, st), 3)}), flush=True)

be = jax.jit(lambda s: sum(bonded_forces.bonded_energy_terms(
    spec, cfg, s.pos, s.box, s.type_id, s.q, s.bonds, s.angles,
    s.dihedrals, s.pairs14).values()))
print(json.dumps({"bonded_energy_fwd_ms": round(timeit(be, st), 3)}),
      flush=True)
