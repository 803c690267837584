"""Activate 20 random MA monomers as FA radicals when reactions start."""
import numpy as np


def hook_init_reaction(ctx):
    rng = np.random.RandomState(ctx.args.rng_seed)
    tid = np.asarray(ctx.state.type_id)
    active = np.asarray(ctx.state.active)
    rows = np.where((tid == ctx.type_id_of("MA")) & active)[0]
    for r in rng.choice(rows, 20, replace=False):
        ctx.modify_particle(int(r) + 1, type=ctx.type_id_of("FA"), state=3)
    print("hook: activated 20 initiators")
    return True
