"""Microbenchmarks for the tabulated fast-path design space (on-TPU).

Times the primitive ops every candidate design is built from, at 100k scale:

  1. (N, K) packed-pos row gather — random topology-order indices
  2. (N, K) row gather with CELL-CLUSTERED indices (neighbors resolve into
     a spatially sorted shadow array: within a row, indices fall in 27 runs)
  3. (M,) ef4 table-row gather at realistic (table, bin) index mixes
  4. per-row top_k compaction of K slots (in-cut prefilter candidate)
  5. full row-path force pass vs its pos-gather-only and table-only parts

Usage: python scripts/tab_micro.py [n] [K]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    rng = np.random.RandomState(0)

    # fluid-like geometry: particles on a grid + jitter, cells of edge 2.9
    rho = 0.27
    box = (n / rho) ** (1 / 3)
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    packed = np.concatenate([pos, rng.uniform(1, 8, (n, 1)).astype(np.float32)],
                            axis=1)

    # topology-order rows: random neighbor ids (worst case)
    rows_rand = rng.randint(0, n, (n, K)).astype(np.int32)

    # cell-clustered rows: sort particles by cell id; neighbors of row i are
    # drawn from a contiguous window of the sorted order (27-cell locality)
    cell = (pos[:, 0] // 2.9).astype(np.int64) * 10000 + \
           (pos[:, 1] // 2.9).astype(np.int64) * 100 + \
           (pos[:, 2] // 2.9).astype(np.int64)
    order = np.argsort(cell, kind="stable")
    base = rng.randint(0, n, (n, 1))
    win = 3 * int(rho * 2.9**3 * 9)           # ~3 cells worth of slots
    rows_local = ((base + rng.randint(0, win, (n, K))) % n).astype(np.int32)

    packed_j = jnp.asarray(packed)
    rr = jnp.asarray(rows_rand)
    rl = jnp.asarray(rows_local)

    g = jax.jit(lambda a, r: a[r])
    print("pos row gather (N,K)=%dx%d  random : %7.3f ms" % (n, K, timeit(g, packed_j, rr)))
    print("pos row gather (N,K)=%dx%d  local  : %7.3f ms" % (n, K, timeit(g, packed_j, rl)))

    # table gather: nT tables x 1024 bins x 4ch
    for nT in (8, 32):
        ef4 = jnp.asarray(rng.randn(nT * 1024, 4).astype(np.float32))
        for m in (2_600_000, 8_000_000):
            # realistic bin mix: clustered around the r distribution
            tabs = rng.randint(0, nT, m).astype(np.int32)
            bins = np.clip((rng.beta(4, 2, m) * 1024).astype(np.int32), 0, 1023)
            idx = jnp.asarray(tabs * 1024 + bins)
            print("ef4 gather nT=%-3d M=%.1fM          : %7.3f ms"
                  % (nT, m / 1e6, timeit(g, ef4, idx)))

    # flat 4-byte element gather for comparison
    ef1 = jnp.asarray(rng.randn(32 * 1024).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 32 * 1024, 2_600_000).astype(np.int32))
    print("flat 4B gather M=2.6M               : %7.3f ms" % timeit(g, ef1, idx))

    # per-row top_k prefilter: pick K2 in-cut slots of K
    for K2 in (32, 48):
        r2 = jnp.asarray(rng.rand(n, K).astype(np.float32))

        @jax.jit
        def tk(x, K2=K2):
            v, i = jax.lax.top_k(-x, K2)
            return v, i

        print("top_k %d->%d per row                : %7.3f ms"
              % (K, K2, timeit(tk, r2)))

    # argsort alternative
    @jax.jit
    def srt(x):
        return jnp.argsort(x, axis=1)

    r2 = jnp.asarray(rng.rand(n, K).astype(np.float32))
    print("argsort K per row                   : %7.3f ms" % timeit(srt, r2))

    # fused: gather pos + compute r2 + gather table + blend (the row-path
    # force pass skeleton) on (N, K)
    ef4 = jnp.asarray(rng.randn(32 * 1024, 4).astype(np.float32))

    @jax.jit
    def skeleton(packed, rows):
        pj = packed[rows]                       # (N, K, 4)
        d = packed[:, None, :3] - pj[..., :3]
        r2 = jnp.sum(d * d, -1)
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        u = jnp.clip(r * 400.0, 0.0, 1022.999)
        i0 = u.astype(jnp.int32)
        frac = (u - i0)[..., None]
        tp = (pj[..., 3].astype(jnp.int32) % 32) * 1024
        v = ef4[tp + i0]
        ef = v[..., :2] * (1 - frac) + v[..., 2:] * frac
        f = jnp.sum(ef[..., 1:2] * d, axis=1)
        return f, jnp.sum(ef[..., 0])

    print("row force skeleton random rows      : %7.3f ms" % timeit(skeleton, packed_j, rr))
    print("row force skeleton local rows       : %7.3f ms" % timeit(skeleton, packed_j, rl))


if __name__ == "__main__":
    main()
