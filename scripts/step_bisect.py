"""Bisect the fused step: time run_block with components disabled."""
import json, sys, time, dataclasses
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from chemlab_tpu import testsystems
from chemlab_tpu.engine import runner, integrate

n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 3334
built, systop, _ = testsystems.build_melt(n_mols=n_mols, reactive=True)
spec, cfg = built.spec, built.cfg
st = runner.initial_forces(spec, cfg, built.state)
st = testsystems.warmup(built, st, steps=600)
st = testsystems.activate_initiators(built, systop, st, n=max(cfg.n_particles//300,4))

def bench(cfg_x, st_x, steps=200, blocks=2, label=""):
    s2 = runner.run_block(spec, cfg_x, st_x, steps)
    jax.block_until_ready(s2.pos)
    t0 = time.perf_counter()
    s3 = s2
    for _ in range(blocks):
        s3 = runner.run_block(spec, cfg_x, s3, steps)
    jax.block_until_ready(s3.pos)
    ms = (time.perf_counter()-t0)/blocks/steps*1000
    print(json.dumps({"label": label, "ms_per_step": round(ms, 3),
                      "pps": round(cfg.n_particles/ms*1000, 1)}), flush=True)

bench(cfg, st, label="full")
# reactions off (MD only)
st_off = dataclasses.replace(st, reactions_on=jnp.asarray(False))
bench(cfg, st_off, label="no_reactions")
# thermostat off
bench(dataclasses.replace(cfg, thermostat="no"), st_off, label="no_reactions_no_thermostat")
# MD with md_step only (no extension machinery): same as no_reactions via cfg has_reactions False
bench(dataclasses.replace(cfg, has_reactions=False, has_atrp=False), st_off, label="pure_md")
# bonded off
bench(dataclasses.replace(cfg, has_reactions=False, bond_funcs=(), angle_funcs=(), dihedral_funcs=()), st_off, label="pure_md_no_bonded")
