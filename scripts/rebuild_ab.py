"""Time build_neighbor_state (fused vs split candidate gather) on device."""
import json, os, sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from chemlab_tpu import testsystems
from chemlab_tpu.engine import neighbor, runner

n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 33334
mode = os.environ.get("CHEMLAB_REBUILD", "fused")
built, _, _ = testsystems.build_melt(n_mols=n_mols, reactive=True)
spec, cfg = built.spec, built.cfg
st = runner.initial_forces(spec, cfg, built.state)
st = testsystems.warmup(built, st, steps=200)
rc = float(jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin)
kw = dict(dims=cfg.cell_dims, cell_cap=cfg.cell_cap,
          max_neighbors=cfg.max_neighbors, excl_cap=cfg.excl_cap)
f = lambda: neighbor.build_neighbor_state(st.pos, st.box, st.active,
                                          st.excl, rc, **kw)
r = f(); jax.block_until_ready(r.idx)
t0 = time.perf_counter()
for _ in range(10):
    r = f()
jax.block_until_ready(r.idx)
dt = (time.perf_counter() - t0) / 10
# buckets-only refresh (the fast-path skin rebuild)
g = lambda: neighbor.refresh_buckets(r, st.pos, st.box, st.active,
                                     dims=cfg.cell_dims,
                                     cell_cap=cfg.cell_cap)
rb = g(); jax.block_until_ready(rb.buckets)
t0 = time.perf_counter()
for _ in range(10):
    rb = g()
jax.block_until_ready(rb.buckets)
dt2 = (time.perf_counter() - t0) / 10
print(json.dumps({"mode": mode, "n": cfg.n_particles, "K": cfg.max_neighbors,
                  "cell_cap": cfg.cell_cap,
                  "row_build_ms": round(dt * 1e3, 2),
                  "bucket_refresh_ms": round(dt2 * 1e3, 2)}), flush=True)
