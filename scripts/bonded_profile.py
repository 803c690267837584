"""Split the bonded-pass cost at 100k: forward gather vs backward scatter.

The round-4 step bisect put the bonded pass at ~8 ms of the 23 ms
100k reactive step (TPU_NUMBERS_r04.md).  The pass is one concatenated
16-byte-row gather (forward) + jax.grad, whose reverse accumulates
through one scatter-add (backward).  This times the pieces in
isolation to direct the next optimization:

    python scripts/bonded_profile.py [--n_mols 33334] [--reps 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *a, reps=20):
    out = fn(*a)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=33334)
    p.add_argument("--reps", type=int, default=20)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import bonded_forces as bf
    from chemlab_tpu.engine import runner

    built, systop, _ = testsystems.build_melt(n_mols=a.n_mols, reactive=True)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=200)

    caps = {"bonds": st.bonds.idx.shape, "angles": st.angles.idx.shape,
            "dihedrals": st.dihedrals.idx.shape, "pairs14": st.pairs14.idx.shape}
    occ = {k: int(jnp.sum(getattr(st, k).idx[:, 0] >= 0))
           for k in ("bonds", "angles", "dihedrals", "pairs14")}
    m_rows = sum(t * k for (t, k) in caps.values())
    print(json.dumps({"n": cfg.n_particles, "caps": {k: list(v) for k, v in caps.items()},
                      "occupancy": occ, "gather_rows": m_rows}), flush=True)

    box = st.box

    @jax.jit
    def full(st):
        f, terms = bf.bonded_forces(spec, cfg, st.pos, box, st.type_id, st.q,
                                    st.bonds, st.angles, st.dihedrals, st.pairs14)
        return f

    @jax.jit
    def fwd_only(st):
        terms = bf.bonded_energy_terms(spec, cfg, st.pos, box, st.type_id,
                                       st.q, st.bonds, st.angles,
                                       st.dihedrals, st.pairs14)
        return sum(terms.values())

    # grad wrt the GATHERED rows only (elementwise AD, no scatter), to
    # isolate what the final index-add costs on top
    pos4 = jnp.concatenate(
        [st.pos, st.type_id.astype(st.pos.dtype)[:, None]], axis=-1)
    idx_all = jnp.concatenate([
        jnp.maximum(st.bonds.idx, 0).reshape(-1),
        jnp.maximum(st.angles.idx, 0).reshape(-1),
        jnp.maximum(st.dihedrals.idx, 0).reshape(-1),
        jnp.maximum(st.pairs14.idx, 0).reshape(-1)])

    def e_of_rows(rows_all, st):
        parts, off = {}, 0
        for name in ("bonds", "angles", "dihedrals", "pairs14"):
            t, k = getattr(st, name).idx.shape
            parts[name] = rows_all[off:off + t * k].reshape(t, k, 4)
            off += t * k
        tot = 0.0
        tot += sum(bf.bond_energies(spec, cfg.bond_funcs, parts["bonds"],
                                    box, st.bonds).values())
        tot += sum(bf.angle_energies(spec, cfg.angle_funcs, parts["angles"],
                                     box, st.angles).values())
        if cfg.dihedral_funcs:
            tot += sum(bf.dihedral_energies(spec, cfg.dihedral_funcs,
                                            parts["dihedrals"], box,
                                            st.dihedrals).values())
        if cfg.pair14_cap:
            tot += sum(bf.pair14_energies(spec, parts["pairs14"], box, st.q,
                                          st.pairs14).values())
        return tot

    @jax.jit
    def rows_grad(st, pos4, idx_all):
        rows_all = pos4[idx_all]
        return jax.grad(e_of_rows)(rows_all, st)

    g = rows_grad(st, pos4, idx_all)
    N_PAD = st.pos.shape[0]

    @jax.jit
    def gather_only(pos4, idx_all):
        return pos4[idx_all]

    @jax.jit
    def scatter_add(g, idx_all):
        return jnp.zeros((N_PAD, 4), g.dtype).at[idx_all].add(g)

    perm = jnp.argsort(idx_all)
    idx_sorted = idx_all[perm]

    @jax.jit
    def scatter_sorted(g, perm, idx_sorted):
        return jnp.zeros((N_PAD, 4), g.dtype).at[idx_sorted].add(
            g[perm], indices_are_sorted=True)

    @jax.jit
    def segsum_sorted(g, perm, idx_sorted):
        return jax.ops.segment_sum(g[perm], idx_sorted, num_segments=N_PAD,
                                   indices_are_sorted=True)

    @jax.jit
    def scatter_planar(g, idx_all):
        # three 1-D scatters: minor dim of the operand is the particle axis
        # (lane-aligned) instead of the 4-wide channel axis
        return [jnp.zeros((N_PAD,), g.dtype).at[idx_all].add(g[:, c])
                for c in range(3)]

    @jax.jit
    def scatter_t(g, idx_all):
        # one transposed scatter into (4, N): channel axis major
        return jnp.zeros((4, N_PAD), g.dtype).at[:, idx_all].add(g.T)

    # rolled-dense static eval (the round-5 candidate): harmonic bonds at
    # offset (0,1) + harmonic angles at (0,1,2) evaluated on shifted planes,
    # value_and_grad, NO gather or scatter anywhere
    bmask = jnp.arange(N_PAD) % 3 != 2          # ~2/3 of slots own a bond
    amask = jnp.arange(N_PAD) % 3 == 0          # 1/3 own an angle
    kb = jnp.ones((N_PAD,), jnp.float32)
    r0 = jnp.full((N_PAD,), 0.9, jnp.float32)

    @jax.jit
    def dense_rolled(pos, box):
        def e(p):
            pj = jnp.roll(p, -1, axis=0)
            pk = jnp.roll(p, -2, axis=0)
            d1 = p - pj
            d1 = d1 - box * jnp.round(d1 / box)
            r = jnp.sqrt(jnp.sum(d1 * d1, -1) + 1e-12)
            eb = jnp.sum(jnp.where(bmask, kb * (r - r0) ** 2, 0.0))
            d2 = pk - pj
            d2 = d2 - box * jnp.round(d2 / box)
            n1 = jnp.sqrt(jnp.sum(d1 * d1, -1) + 1e-12)
            n2 = jnp.sqrt(jnp.sum(d2 * d2, -1) + 1e-12)
            c = jnp.clip(jnp.sum(-d1 * d2, -1) / (n1 * n2), -0.9999, 0.9999)
            th = jnp.arccos(c)
            ea = jnp.sum(jnp.where(amask, kb * (th - 1.9) ** 2, 0.0))
            return eb + ea
        return jax.grad(e)(pos)

    res = {
        "full_ms": timeit(full, st, reps=a.reps),
        "scatter_planar_ms": timeit(scatter_planar, g, idx_all, reps=a.reps),
        "scatter_t_ms": timeit(scatter_t, g, idx_all, reps=a.reps),
        "dense_rolled_ms": timeit(dense_rolled, st.pos, box, reps=a.reps),
        "fwd_only_ms": timeit(fwd_only, st, reps=a.reps),
        "gather_only_ms": timeit(gather_only, pos4, idx_all, reps=a.reps),
        "rows_grad_ms": timeit(rows_grad, st, pos4, idx_all, reps=a.reps),
        "scatter_add_ms": timeit(scatter_add, g, idx_all, reps=a.reps),
        "scatter_sorted_ms": timeit(scatter_sorted, g, perm, idx_sorted,
                                    reps=a.reps),
        "segsum_sorted_ms": timeit(segsum_sorted, g, perm, idx_sorted,
                                   reps=a.reps),
    }
    print(json.dumps({k: round(v, 3) for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()
