"""Micro A/B of the pallas pair wrapper's dense-operand build on v5e.

ROOFLINE_r05.md: the 100k pair call is overhead-bound and its wrapper
gather (C*cap = 442k packed rows at cap 32) is a leading uncounted
term.  Candidate replacements, measured here in isolation at real
shapes and index patterns inside a fused fori_loop (dispatch-amortized,
CSE-defeated by a per-iteration position drift):

  base      no operand build (loop overhead + packed-row derivation)
  gather    masked gather  g = where(valid, packed[rows], 0)   [default]
  scatter   zeros.at[slot_of].set(packed)          [old CHEMLAB_DENSE=scatter]
  scatteru  same + unique_indices=True             [never tried on hardware]
  persist   carried buffer .at[slot_of].set(packed, unique_indices=True)
            (no zero-init: holes stay zero between rebuilds — the
            "persistent cell-dense operand" rung, CLAUDE.md r4/r5)

Artifact consumer: ROOFLINE_r05.md addendum / TPU_NUMBERS_r06.md.

    python scripts/dense_mode_micro.py [--n 100000] [--reps 200]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100000)
    p.add_argument("--cap", type=int, default=32)
    p.add_argument("--reps", type=int, default=200)
    p.add_argument("--outer", type=int, default=5)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from chemlab_tpu.engine import neighbor

    # realistic geometry: the 100k melt box (rho 0.27) and its 24^3 grid
    n = a.n
    rho = 0.27
    box_l = (n / rho) ** (1.0 / 3.0)
    box = jnp.full(3, box_l, jnp.float32)
    rc_skin = 2.9
    dims = tuple(int(d) for d in np.maximum(
        np.floor(box_l / rc_skin), 3).astype(int) * np.ones(3, int))
    n_cells = int(np.prod(dims))
    cap = a.cap

    rng = np.random.RandomState(0)
    pos0 = jnp.asarray(rng.uniform(0, box_l, (n, 3)).astype(np.float32))
    type_id = jnp.asarray(rng.randint(0, 7, n).astype(np.int32))
    active = jnp.ones(n, bool)
    buckets, _, ovf, slot_of = neighbor.build_cell_buckets(
        pos0, box, active, dims, cap)
    print(json.dumps({"device": str(jax.devices()[0]), "n": n,
                      "dims": dims, "cap": cap,
                      "rows_gather": n_cells * cap,
                      "overflow": bool(ovf)}), flush=True)

    rows = jnp.maximum(buckets[:n_cells], 0)
    mask = (buckets[:n_cells] >= 0)[..., None]
    tv_all = (type_id + 1).astype(jnp.float32)
    in_grid = slot_of < n_cells * cap
    sidx = jnp.where(in_grid, slot_of, n_cells * cap)

    def packed_of(pos):
        return jnp.concatenate([pos, tv_all[:, None]], axis=-1)

    def consume(op):
        # cheap consumer so the build can't be DCE'd; shape-agnostic
        return jnp.sum(op[..., 0]) + jnp.sum(op[..., 3])

    drift = jnp.full((n, 3), 1e-5, jnp.float32)

    def body_base(_, c):
        pos, s, buf = c
        pos = pos + drift
        s = s + consume(packed_of(pos))
        return pos, s, buf

    def body_gather(_, c):
        pos, s, buf = c
        pos = pos + drift
        g = jnp.where(mask, packed_of(pos)[rows], 0.0)
        return pos, s + consume(g), buf

    def body_scatter(_, c):
        pos, s, buf = c
        pos = pos + drift
        g = jnp.zeros((n_cells * cap, 4), jnp.float32).at[sidx].set(
            packed_of(pos), mode="drop")
        return pos, s + consume(g), buf

    def body_scatteru(_, c):
        pos, s, buf = c
        pos = pos + drift
        g = jnp.zeros((n_cells * cap, 4), jnp.float32).at[sidx].set(
            packed_of(pos), mode="drop", unique_indices=True)
        return pos, s + consume(g), buf

    def body_persist(_, c):
        pos, s, buf = c
        pos = pos + drift
        buf = buf.at[sidx].set(packed_of(pos), mode="drop",
                               unique_indices=True)
        return pos, s + consume(buf), buf

    bodies = {"base": body_base, "gather": body_gather,
              "scatter": body_scatter, "scatteru": body_scatteru,
              "persist": body_persist}

    buf0 = jnp.zeros((n_cells * cap, 4), jnp.float32)

    results = {}
    for name, body in bodies.items():
        @jax.jit
        def loop(carry, body=body):
            return jax.lax.fori_loop(0, a.reps, body, carry)

        carry = (pos0, jnp.asarray(0.0, jnp.float32), buf0)
        carry = loop(carry)            # compile + warm
        jax.block_until_ready(carry[1])
        best = np.inf
        for _ in range(a.outer):
            carry = (pos0, jnp.asarray(0.0, jnp.float32), buf0)
            t0 = time.perf_counter()
            carry = loop(carry)
            jax.block_until_ready(carry[1])
            best = min(best, time.perf_counter() - t0)
        per_iter_ms = best / a.reps * 1e3
        results[name] = per_iter_ms
        print(json.dumps({"mode": name, "ms_per_iter": round(per_iter_ms,
                                                             4)}),
              flush=True)

    base = results.pop("base")
    print("DENSE_MICRO " + json.dumps(
        {"base_ms": round(base, 4),
         **{k: {"ms": round(v, 4), "build_ms": round(v - base, 4)}
            for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
