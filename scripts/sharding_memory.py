"""Per-device memory proof for the row-sharded engine.

Builds a reactive melt, shards it over a virtual 8-device CPU mesh, and
compares XLA's compiled memory analysis of `run_block` (per-device argument/
output/temp bytes under GSPMD) against the single-device program, plus the
actual shard shapes of the state arrays.  Artifact consumer: MULTICHIP_r*.md.

    python scripts/sharding_memory.py [--n_mols 33334]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def analyze(n_mols: int):
    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import runner
    from chemlab_tpu.parallel import (make_mesh, meshed_cfg, shard_state,
                                      shard_system)

    built, systop, _ = testsystems.build_melt(n_mols=n_mols, reactive=True)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)

    def mem(spec_x, st_x, cfg_x):
        lowered = jax.jit(
            runner.run_block, static_argnames=("cfg", "n_steps", "rng_seed")
        ).lower(spec_x, cfg_x, st_x, 10)
        ma = lowered.compile().memory_analysis()
        return {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
        }

    single = mem(spec, st, cfg)

    mesh = make_mesh(8)
    spec_s, _ = shard_system(built, mesh)
    st_s = shard_state(mesh, st)
    sharded = mem(spec_s, st_s, meshed_cfg(cfg, mesh))

    shard_shapes = {
        "pos": (st_s.pos.shape,
                st_s.pos.sharding.shard_shape(st_s.pos.shape)),
        "nbr_idx": (st_s.nbr.idx.shape,
                    st_s.nbr.idx.sharding.shard_shape(st_s.nbr.idx.shape)),
        "bonds_idx": (st_s.bonds.idx.shape,
                      st_s.bonds.idx.sharding.shard_shape(st_s.bonds.idx.shape)),
    }
    return {
        "n_particles": cfg.n_particles,
        "devices": len(jax.devices()),
        "single_device": single,
        "per_device_sharded": sharded,
        "temp_ratio": round(single["temp_mb"] / max(sharded["temp_mb"], 1e-9), 2),
        "shard_shapes": {k: [list(a), list(b)] for k, (a, b) in
                         shard_shapes.items()},
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=33334)
    a = p.parse_args()
    print(json.dumps(analyze(a.n_mols)))
