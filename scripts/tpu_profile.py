"""Trace a fused run_block on device and dump per-op durations.

Collects a jax.profiler trace around one fused 20-step block at the given
scale, parses the xplane proto (via tensorflow's bundled tsl protobuf), and
prints the top ops per device plane — the op-level breakdown that the A/B
bisection scripts can only approximate.

Usage: python scripts/tpu_profile.py [n_mols] [steps]
"""
import collections
import glob
import json
import os
import sys

sys.path.insert(0, ".")
import jax

from chemlab_tpu import testsystems
from chemlab_tpu.engine import runner

n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 33334
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

built, _, _ = testsystems.build_melt(n_mols=n_mols, reactive=True)
spec, cfg = built.spec, built.cfg
st = runner.initial_forces(spec, cfg, built.state)
st = testsystems.warmup(built, st, steps=100)

st = runner.run_block(spec, cfg, st, steps)
jax.block_until_ready(st.pos)

traced = "/tmp/jxprof"
with jax.profiler.trace(traced):
    st = runner.run_block(spec, cfg, st, steps)
    jax.block_until_ready(st.pos)

paths = sorted(glob.glob(traced + "/plugins/profile/*/*.xplane.pb"),
               key=os.path.getmtime)
if not paths:
    print(json.dumps({"error": "no xplane produced", "dir": traced}))
    sys.exit(0)

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    name = plane.name
    # device planes carry the per-op timeline; skip pure host planes except
    # a one-line summary so we can tell whether the tunnel exports them
    per_op = collections.Counter()
    n_events = 0
    for line in plane.lines:
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            per_op[meta.name] += ev.duration_ps
            n_events += 1
    total_ms = sum(per_op.values()) / 1e9
    print(json.dumps({"plane": name, "events": n_events,
                      "sum_ms": round(total_ms, 3)}), flush=True)
    if "TPU" in name or "/device" in name.lower():
        for op, ps in per_op.most_common(25):
            print(json.dumps({"op": op[:110],
                              "ms": round(ps / 1e9, 3)}), flush=True)
