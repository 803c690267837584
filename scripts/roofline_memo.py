"""Roofline / MFU memo data for the colt2 pair kernel (VERDICT r3 item 4).

Quantifies, from a REAL equilibrated melt state:

  1. useful-pair fraction — real in-cutoff pairs vs the slot evaluations
     the kernel actually performs (packets x 27-stencil candidate lanes),
  2. the VPU op-count floor for those slots vs the measured kernel time
     (v5e VPU peak, documented assumption), and
  3. the DMA byte count of the kernel's operands vs HBM bandwidth,

then prints the compute-vs-DMA verdict and the expected win from
occupancy-packed candidate lanes.  Stats run on any backend; pass
--time to also time the kernel call on the current device.

    python scripts/roofline_memo.py [--n_mols 3334] [--time]

Artifact consumer: ROOFLINE_r05.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e per-chip paper numbers (How to Scale Your Model, table for v5e):
# 394 bf16 MXU TFLOP/s -> f32 VPU is 8 ALU ops/cycle/lane-group:
# 940 MHz x 8 sublanes x 128 lanes x 4 ALUs ~= 3.85e12 f32 op/s.
VPU_PEAK_OPS = 3.85e12
HBM_BW = 8.1e11           # 810 GB/s
MXU_PEAK_F32 = 4.9e13     # f32 ~ 1/4 of bf16 197 TFLOP/s... conservative

# per-slot VPU op count in _colt2_kernel's body (counted from the source,
# pallas_pair.py:_colt2_kernel): dx/dy/dz minimum-image (15), r2 (6),
# valid masks (5), LJ core s2/s6/e/f + where (14), f*dr + channel sums (8)
OPS_PER_SLOT_LJ = 48
# tab_cheb eval_planes adds ~4 ops per Chebyshev degree (Clenshaw) x2
# (grad+energy) on the wall piece + the same on the well piece


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_mols", type=int, default=3334)
    p.add_argument("--time", action="store_true")
    p.add_argument("--tabulated", action="store_true")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import build as build_mod
    from chemlab_tpu.engine import neighbor, runner

    builder = (testsystems.build_tabulated_melt if a.tabulated
               else testsystems.build_melt)
    built, systop, _ = builder(
        n_mols=a.n_mols, reactive=True,
        use_pallas=jax.default_backend() == "tpu")
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=600)
    cfg, st = build_mod.shrink_neighbor_caps(cfg, spec, st)
    cfg, st = build_mod.shrink_term_caps(cfg, st)
    # a short NVT stretch so the droplet structure (the real occupancy
    # distribution) forms
    st = runner.run_block(spec, cfg, st, 400)
    jax.block_until_ready(st.pos)

    n = cfg.n_particles
    dims = cfg.cell_dims
    cap = cfg.cell_cap
    n_cells = int(np.prod(dims))

    buckets, _ci, overflow, slot_of = neighbor.build_cell_buckets(
        st.pos, st.box, st.active, dims, cap)
    occ = np.asarray((buckets[:-1] >= 0).sum(axis=1))

    # --- real pairs within cutoff (directed), computed exactly ---
    pos = np.asarray(st.pos)
    box = np.asarray(st.box)
    rc = float(np.sqrt(float(spec.pair_cutoff2.max())))
    # cell-binned exact count (numpy, fine up to ~100k)
    from collections import defaultdict
    inv = np.floor(pos / box * dims).astype(int) % dims
    cell_id = (inv[:, 0] * dims[1] + inv[:, 1]) * dims[2] + inv[:, 2]
    order = np.argsort(cell_id)
    bounds = np.searchsorted(cell_id[order], np.arange(n_cells + 1))
    n_real = 0
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    cxyz = np.stack(np.unravel_index(np.arange(n_cells), dims), axis=1)
    for (dx, dy, dz) in offs:
        nb = ((cxyz + (dx, dy, dz)) % dims)
        nb_id = (nb[:, 0] * dims[1] + nb[:, 1]) * dims[2] + nb[:, 2]
        for c in range(n_cells):
            rows_i = order[bounds[c]:bounds[c + 1]]
            if not len(rows_i):
                continue
            c2 = nb_id[c]
            rows_j = order[bounds[c2]:bounds[c2 + 1]]
            if not len(rows_j):
                continue
            d = pos[rows_i][:, None, :] - pos[rows_j][None, :, :]
            d -= box * np.round(d / box)
            r2 = (d * d).sum(-1)
            n_real += int(((r2 < rc * rc) & (r2 > 1e-12)).sum())

    # --- slots the colt2 kernel evaluates ---
    # one fori_loop body per ceil(occ/8) packet per cell; each body does an
    # (8, 27*cap) tile
    packets = np.ceil(occ / 8).astype(int)
    slots = int(packets.sum()) * 8 * 27 * cap
    # occupancy-packed candidate lanes bound: candidates hold only real
    # rows (still 27 cells wide, lanes = sum over stencil of occ_j,
    # rounded to 128-lane tiles per packet)
    mean_cand = float(occ.mean()) * 27
    packed_lanes = max(128, int(np.ceil(mean_cand / 128) * 128))
    slots_packed = int(packets.sum()) * 8 * packed_lanes

    stats = {
        "n_particles": n, "n_cells": n_cells, "cap": cap,
        "dims": [int(d) for d in dims],
        "occ_mean": round(float(occ.mean()), 2),
        "occ_p99": int(np.percentile(occ, 99)), "occ_max": int(occ.max()),
        "packets": int(packets.sum()),
        "real_directed_pairs_in_rc": n_real,
        "slot_evals_per_step": slots,
        "useful_pair_fraction": round(n_real / slots, 4),
        "vpu_floor_ms_at_%d_ops" % OPS_PER_SLOT_LJ:
            round(slots * OPS_PER_SLOT_LJ / VPU_PEAK_OPS * 1e3, 3),
        "packed_lanes_bound": {
            "lanes": packed_lanes,
            "slot_evals": slots_packed,
            "speedup_vs_now": round(slots / slots_packed, 2),
        },
    }

    # --- DMA bytes: operands of one kernel launch ---
    # programs: one per (x, y) column; per program: self (1,(nz+2)cap,8)f32,
    # 9 colt refs (1,8,(nz+2)cap), counts, LUT mats (T,T)x5, out (1,nz*cap,4)
    nz = int(dims[2])
    n_prog = int(dims[0] * dims[1])
    tpad = -(-cfg.n_types // 8) * 8
    per_prog = ((nz + 2) * cap * 8 * 4 * (1 + 9)    # self + 9 columns
                + 5 * tpad * tpad * 4               # LUT mats (resident)
                + nz * cap * 4 * 4)                 # out
    dma_bytes = n_prog * per_prog
    stats["dma"] = {
        "bytes_per_kernel_launch": dma_bytes,
        "hbm_floor_ms": round(dma_bytes / HBM_BW * 1e3, 3),
    }

    if a.time:
        from chemlab_tpu.engine import pallas_pair

        cheb_kw = int(getattr(spec, "cheb_kw", 0)) if a.tabulated else 0
        cheb_ko = int(getattr(spec, "cheb_ko", 0)) if a.tabulated else 0
        fn = jax.jit(lambda pos, tid, act, box, bk, so: pallas_pair.cell_pair_forces(
            pos, tid, act, box, bk, dims, spec, cfg.n_types, cap,
            slot_of=so, cheb_kw=cheb_kw, cheb_ko=cheb_ko))
        out = fn(st.pos, st.type_id, st.active, st.box, buckets, slot_of)
        jax.block_until_ready(out)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(st.pos, st.type_id, st.active, st.box, buckets, slot_of)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        stats["measured_ms"] = round(ms, 3)
        stats["vpu_mfu"] = round(
            slots * OPS_PER_SLOT_LJ / (ms * 1e-3) / VPU_PEAK_OPS, 4)
        stats["slots_per_s"] = round(slots / (ms * 1e-3), 1)
        stats["verdict"] = (
            "DMA-bound" if stats["dma"]["hbm_floor_ms"] > 0.7 * ms else
            ("VPU-bound" if stats["vpu_mfu"] > 0.5 else
             "overhead/instruction-bound (neither floor within 2x)"))

    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
