"""Per-step collective audit of the compiled multi-device HLO.

VERDICT r3 item 5: dump the compiled 8-device HLO for one fused block and
publish a per-step collective table (op, bytes, count).  The reference
scales by spatial domain decomposition with explicit ghost exchange
(ref: start_simulation.py:155-171, espressopp DomainDecomposition); this
engine scales by GSPMD row sharding — the audit quantifies what XLA's
partitioner actually inserts so the slab/halo variant has a baseline to
strictly beat.

    python scripts/collective_audit.py [--n_mols 33334] [--steps 10]
                                       [--what block|step|rebuild]
                                       [--halo] [--pallas]

Artifact consumer: MULTICHIP_r05.md.
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all", "collective-broadcast")
DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "s32": 4,
               "u64": 8, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1}

# "= f32[100096,128]{1,0} all-gather(" / tuple shapes "= (f32[...], ...)"
_RE_OP = re.compile(
    r"=\s+(\([^)]*\)|\S+?)\s+(%s)\(" % "|".join(COLLECTIVES))
_RE_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _RE_SHAPE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def audit_hlo(hlo_text: str):
    """Collective table from compiled HLO text.  Instructions inside a
    while-loop body execute once per fused step; the audit reports every
    instruction site with its per-execution bytes (callers multiply by
    loop trips if they want totals)."""
    table = defaultdict(lambda: [0, 0])
    for m in _RE_OP.finditer(hlo_text):
        shape, op = m.group(1), m.group(2)
        table[op][0] += 1
        table[op][1] += shape_bytes(shape)
    return {op: {"count": c, "bytes": b} for op, (c, b) in sorted(table.items())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_mols", type=int, default=33334)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--what", default="block",
                    choices=("block", "step", "rebuild"))
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--halo", action="store_true",
                    help="slab+ppermute variant (implies --pallas)")
    ap.add_argument("--dump", default="", help="write full HLO text here")
    args = ap.parse_args()
    if args.halo:
        args.pallas = True
        os.environ["CHEMLAB_HALO"] = "1"
    else:
        # halo is auto-on for qualifying meshed cfgs; the non-halo leg must
        # pin the GSPMD baseline it exists to measure
        os.environ["CHEMLAB_HALO"] = "0"

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import integrate, neighbor, runner
    from chemlab_tpu.parallel import (make_mesh, meshed_cfg, shard_state,
                                      shard_system)

    built, systop, _ = testsystems.build_melt(
        n_mols=args.n_mols, reactive=True,
        **({"use_pallas": True} if args.pallas else {}),
        # the halo leg needs an x-layer count the 8-mesh divides or
        # pallas_halo.supports() silently falls back to GSPMD
        **({"slab_devices": 8} if args.halo else {}))
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)

    mesh = make_mesh(8)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    cfg_m = meshed_cfg(cfg, mesh)

    if args.what == "block":
        lowered = jax.jit(runner.run_block,
                          static_argnames=("cfg", "n_steps", "rng_seed")
                          ).lower(spec_s, cfg_m, st_s, args.steps)
    elif args.what == "step":
        lowered = jax.jit(integrate.md_step,
                          static_argnames=("cfg",)).lower(spec_s, cfg_m, st_s)
    else:
        import jax.numpy as jnp
        rc_skin = float(jnp.sqrt(jnp.max(spec.pair_cutoff2)) + spec.skin)

        def rebuild(pos, box, active, excl):
            return neighbor.build_neighbor_state(
                pos, box, active, excl, rc_skin, dims=cfg.cell_dims,
                cell_cap=cfg.cell_cap, max_neighbors=cfg.max_neighbors,
                excl_cap=cfg.excl_cap, mesh=mesh)

        lowered = jax.jit(rebuild).lower(st_s.pos, st_s.box, st_s.active,
                                         st_s.excl)
    hlo = lowered.compile().as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
    table = audit_hlo(hlo)
    total = sum(v["bytes"] for v in table.values())
    print(json.dumps({
        "n_particles": cfg.n_particles, "what": args.what,
        "use_pallas": bool(cfg.use_pallas), "halo": bool(args.halo),
        "collectives": table,
        "total_bytes": total,
        "total_mb": round(total / 2**20, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
