"""One-process kernel matrix + fused pps at a given scale."""
import json, os, sys, time, dataclasses
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from chemlab_tpu import testsystems
from chemlab_tpu.engine import runner, pallas_pair

n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 3334
built, systop, _ = testsystems.build_melt(n_mols=n_mols, reactive=True)
spec, cfg = built.spec, built.cfg
st = runner.initial_forces(spec, cfg, built.state)
st = testsystems.warmup(built, st, steps=600)
st = testsystems.activate_initiators(built, systop, st, n=max(cfg.n_particles//300,4))
print(json.dumps({"n": cfg.n_particles, "cell_cap": cfg.cell_cap,
                  "dims": list(cfg.cell_dims)}), flush=True)

def kfn(kind):
    if kind == "cell":
        f = lambda s: pallas_pair.cell_pair_forces(
            s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
            spec, cfg.n_types, cfg.cell_cap, uniform_lj=cfg.uniform_lj,
            packets=False, slot_of=s.nbr.slot_of)[0]
    elif kind == "cell_scatter":
        f = lambda s: pallas_pair.cell_pair_forces(
            s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
            spec, cfg.n_types, cfg.cell_cap, uniform_lj=cfg.uniform_lj,
            packets=False, slot_of=None)[0]
    elif kind == "packet":
        f = lambda s: pallas_pair.cell_pair_forces_packets(
            s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
            spec, cfg.n_types, cfg.cell_cap, uniform_lj=cfg.uniform_lj)[0]
    elif kind == "column":
        f = lambda s: pallas_pair.cell_pair_forces_columns(
            s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
            spec, cfg.n_types, cfg.cell_cap, uniform_lj=cfg.uniform_lj,
            z_unroll=False)[0]
    elif kind in ("colt", "colt1", "colt2"):
        impl = "colt" if kind == "colt1" else "colt2"
        f = lambda s: pallas_pair.cell_pair_forces_colt(
            s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
            spec, cfg.n_types, cfg.cell_cap, uniform_lj=cfg.uniform_lj,
            slot_of=s.nbr.slot_of, impl=impl)[0]
    elif kind == "colz":
        f = lambda s: pallas_pair.cell_pair_forces_columns(
            s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
            spec, cfg.n_types, cfg.cell_cap, uniform_lj=cfg.uniform_lj,
            z_unroll=True)[0]
    else:
        f = lambda s: pallas_pair.cell_pair_forces_resident(
            s.pos, s.type_id, s.active, s.box, s.nbr.buckets, cfg.cell_dims,
            spec, cfg.n_types, cfg.cell_cap, uniform_lj=cfg.uniform_lj)[0]
    return jax.jit(f)

out = {}
kinds = ("cell", "cell_scatter", "column", "colt")
if os.environ.get("KM_KINDS"):
    kinds = tuple(os.environ["KM_KINDS"].split(","))
for kind in kinds:
    try:
        f = kfn(kind)
        r = f(st); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20): r = f(st)
        jax.block_until_ready(r)
        out["kernel_%s_ms" % kind] = round((time.perf_counter()-t0)/20*1000, 3)
    except Exception as exc:
        out["kernel_%s_ms" % kind] = "FAIL:%s" % str(exc)[:120]
print(json.dumps(out), flush=True)

# retuned caps: shrink to observed occupancy, re-measure the cell kernel
if os.environ.get("KM_RETUNE"):
    from chemlab_tpu.engine import build as build_mod
    cfg2, st2 = build_mod.shrink_neighbor_caps(cfg, spec, st)
    print(json.dumps({"retuned_cell_cap": cfg2.cell_cap,
                      "retuned_K": cfg2.max_neighbors}), flush=True)
    if cfg2.cell_cap != cfg.cell_cap:
        cfg, st = cfg2, st2
        f = kfn("cell")
        r = f(st); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20): r = f(st)
        jax.block_until_ready(r)
        print(json.dumps({"kernel_cell_retuned_ms":
                          round((time.perf_counter()-t0)/20*1000, 3)}),
              flush=True)

# fused block with the auto-dispatched kernel (resident if it fits)
s2 = runner.run_block(spec, cfg, st, 200)
jax.block_until_ready(s2.pos)
t0 = time.perf_counter()
s3 = s2
for _ in range(3): s3 = runner.run_block(spec, cfg, s3, 200)
jax.block_until_ready(s3.pos)
dt = time.perf_counter()-t0
m = runner.measure(spec, cfg, s3)
print(json.dumps({"pps_fused_auto": round(cfg.n_particles*600/dt,1),
                  "events": int(m["reaction_counts"].sum()),
                  "overflow": bool(m["overflow"])}), flush=True)
