"""Bisect the tabulated row-path step at a given scale on the default device.

Times: full fused step, force pass, force-pass pieces (pos gather, param
gathers, table gather), neighbor rebuild (full build_neighbor_state), bucket
refresh, top_k alone, bonded pass — the decomposition that decides where the
tabulated fast-path work goes.

Usage: python scripts/tab_bisect.py [n_mols]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import build as build_mod
from chemlab_tpu.engine import neighbor, pair_forces, runner


def t(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 33334
    built, systop, _ = testsystems.build_tabulated_melt(n_mols=n_mols,
                                                        reactive=True)
    spec, cfg = built.spec, built.cfg
    state = runner.initial_forces(spec, cfg, built.state)
    state = testsystems.warmup(built, state, steps=600)
    cfg, state = build_mod.shrink_neighbor_caps(cfg, spec, state)
    cfg, state = build_mod.shrink_term_caps(cfg, state)
    state = testsystems.activate_initiators(built, systop, state,
                                            n=max(cfg.n_particles // 300, 4))
    state = runner.run_block(spec, cfg, state, 200)
    jax.block_until_ready(state.pos)
    K = cfg.max_neighbors
    print(json.dumps({"n": cfg.n_particles, "K": K, "cell_cap": cfg.cell_cap,
                      "dims": list(cfg.cell_dims)}), flush=True)

    res = {}
    # fused 100-step block
    ms = t(lambda s: runner.run_block(spec, cfg, s, 100), state, reps=3)
    res["step_ms"] = ms / 100

    # force pass
    from chemlab_tpu.engine import integrate

    @jax.jit
    def force_full(s):
        f, e, _ = integrate.compute_forces(spec, cfg, s)
        return f

    res["force_pass"] = t(force_full, state)

    # pieces over the live neighbor rows
    st = state
    rc_skin = float(np.sqrt(np.max(np.asarray(spec.pair_cutoff2)))) + float(spec.skin)

    @jax.jit
    def pos_gather_only(s):
        packed = jnp.concatenate(
            [s.pos, s.type_id.astype(s.pos.dtype)[:, None]], -1)
        pj = packed[s.nbr.idx]
        d2 = jnp.zeros(s.nbr.idx.shape, s.pos.dtype)
        for ax in range(3):
            d = s.pos[:, ax][:, None] - pj[..., ax]
            d -= s.box[ax] * jnp.round(d / s.box[ax])
            d2 += d * d
        return jnp.sum(d2)

    res["pos_gather+geom"] = t(pos_gather_only, st)

    @jax.jit
    def param_gathers(s):
        packed = jnp.concatenate(
            [s.pos, s.type_id.astype(s.pos.dtype)[:, None]], -1)
        pj = packed[s.nbr.idx]
        ti = s.type_id[:, None]
        tj = pj[..., 3].astype(jnp.int32)
        p = ti * cfg.n_types + tj
        out = spec.pair_kind[p].astype(jnp.float32)
        out += spec.pair_cutoff2[p]
        out += spec.pair_tab_a[p].astype(jnp.float32)
        out += spec.nb_r0[spec.pair_tab_a[p]]
        out += spec.nb_dr[spec.pair_tab_a[p]]
        return jnp.sum(out)

    res["pos+5param_gathers"] = t(param_gathers, st)

    @jax.jit
    def table_gather(s):
        packed = jnp.concatenate(
            [s.pos, s.type_id.astype(s.pos.dtype)[:, None]], -1)
        pj = packed[s.nbr.idx]
        d2 = jnp.zeros(s.nbr.idx.shape, s.pos.dtype)
        for ax in range(3):
            d = s.pos[:, ax][:, None] - pj[..., ax]
            d -= s.box[ax] * jnp.round(d / s.box[ax])
            d2 += d * d
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))
        ti = s.type_id[:, None]
        tj = pj[..., 3].astype(jnp.int32)
        p = ti * cfg.n_types + tj
        ta = spec.pair_tab_a[p]
        from chemlab_tpu.engine import tables
        e, f = tables.interpolate4(spec.nb_ef4, spec.nb_r0, spec.nb_dr, ta, r)
        return jnp.sum(e) + jnp.sum(f)

    res["pos+geom+tab_lookup"] = t(table_gather, st)

    # rebuild costs
    @jax.jit
    def full_rebuild(s):
        nbr = neighbor.build_neighbor_state(
            s.pos, s.box, s.active, s.excl, rc_skin,
            dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
            max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap)
        return nbr.idx

    res["full_rebuild"] = t(full_rebuild, st, reps=3)

    @jax.jit
    def refresh(s):
        nbr = neighbor.refresh_buckets(s.nbr, s.pos, s.box, s.active,
                                       dims=cfg.cell_dims,
                                       cell_cap=cfg.cell_cap)
        return nbr.buckets

    res["bucket_refresh"] = t(refresh, st)

    # top_k alone on the real candidate plane shape
    S = len(neighbor.neighbor_cell_offsets(cfg.cell_dims))
    L = S * cfg.cell_cap
    rng = np.random.RandomState(0)
    negd2 = jnp.asarray(-rng.rand(cfg.n_particles, L).astype(np.float32))

    @jax.jit
    def topk(x):
        return jax.lax.top_k(x, K)[1]

    res["top_k_%dx%d->%d" % (cfg.n_particles, L, K)] = t(topk, negd2, reps=3)

    # bonded pass
    from chemlab_tpu.engine import bonded_forces

    @jax.jit
    def bonded(s):
        f, e = bonded_forces.bonded_forces(
            spec, cfg, s.pos, s.box, s.type_id, s.q, s.bonds, s.angles,
            s.dihedrals, s.pairs14,
            dense=(s.bonds_dense, s.bonds_irr, s.angles_dense, s.angles_irr)
            if cfg.bonded_dense and s.bonds_dense is not None else None)
        return f

    res["bonded_pass"] = t(bonded, st)

    for k, v in res.items():
        print(json.dumps({k: round(v, 3)}), flush=True)


if __name__ == "__main__":
    main()
