"""Headline benchmark: reactive-melt particle-steps/sec.

Runs the atrp_lj-class reactive workload (BASELINE.md: 10k-particle melt,
LJ + harmonic bonds/angles, Langevin NVT, ATRP-style reactions every 200
steps) on the default JAX device and prints one JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is MEASURED here: ``native/baseline_md.cpp`` — a competently
written single-core C++ cell-list/Verlet MD engine running the same
workload class (LJ melt + harmonic trimer bonds + Langevin, identical
density/cutoff/dt) — timed on this machine at the same particle count,
scaled by the reference's own single-node deployment (20 MPI ranks,
examples/atrp_lj/p2ccg.pbs / rim135 run_simulation.pbs nodes=1:ppn=20)
with an assumed 85% parallel efficiency.  ``vs_baseline`` is therefore
speedup per TPU chip over a full reference-class CPU node.  Falls back to
the round-2 constant (4e6) if the native build fails.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


ESPP_BASELINE_PPS = 4.0e6   # fallback when the native baseline can't build
NODE_RANKS = 20             # the reference's single-node deployment
PAR_EFF = 0.85              # assumed MPI scaling at node scale


def measure_native_baseline(n_particles: int, steps: int = 200,
                            mode: str = "lj"):
    """Build + run the C++ baseline at the given size; returns single-node
    pps (per-core measurement x NODE_RANKS x PAR_EFF) or None.

    ``mode="tab"`` runs the baseline's tabulated pair path (per-type-pair
    linear E/F interpolation at the reference's source resolution) so the
    tabulated bench legs divide by a features-matched denominator
    (VERDICT r4 item 8)."""
    try:
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "baseline_md.cpp")
        exe = "/tmp/chemlab_baseline_md"
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src],
                           check=True, capture_output=True, timeout=120)
        r = subprocess.run([exe, str(n_particles), str(steps), mode],
                           capture_output=True, text=True, timeout=600)
        core_pps = float(r.stdout.split()[1])
        return core_pps * NODE_RANKS * PAR_EFF, core_pps
    except Exception:
        return None, None


def _probe_backend():
    """Return 'tpu' if the accelerator backend answers within a timeout, else
    a cpu label.

    The axon TPU plugin can hang for minutes or die with UNAVAILABLE when the
    tunnel is down (it was down for all of round 1, which turned bench.py into
    rc=1 and recorded nothing). Probing in a subprocess bounds the damage: on
    any failure or timeout we force the CPU platform in *this* process and
    still emit a parseable JSON line.
    """
    if os.environ.get("BENCH_FORCE_CPU"):
        return "cpu-forced"
    import subprocess
    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "120"))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLATFORM=' + jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout)
        for line in r.stdout.splitlines():
            if line.startswith("PLATFORM="):
                plat = line.split("=", 1)[1]
                return "cpu-fallback" if plat == "cpu" else plat
    except Exception:
        pass
    return "cpu-fallback"


def _bench_melt(n_mols, want_pallas, n_blocks, block_steps, tabulated=False):
    import jax
    import jax.numpy as jnp

    from chemlab_tpu import testsystems
    from chemlab_tpu.engine import build as build_mod
    from chemlab_tpu.engine import runner

    builder = (testsystems.build_tabulated_melt if tabulated
               else testsystems.build_melt)
    built, systop, _ = builder(n_mols=n_mols, reactive=True,
                               use_pallas=want_pallas)
    spec, cfg = built.spec, built.cfg
    state = runner.initial_forces(spec, cfg, built.state)
    state = testsystems.warmup(built, state, steps=600)
    if not os.environ.get("BENCH_NO_RETUNE"):
        # post-equilibration capacity retune (the CLI's --retune_caps):
        # build-time caps are sized for the packed start; the equilibrated
        # fluid runs 2-5x leaner tiles, and overflow + regrowth remains the
        # backstop if the melt densifies later
        cfg, state = build_mod.shrink_neighbor_caps(cfg, spec, state)
        cfg, state = build_mod.shrink_term_caps(cfg, state)
    state = testsystems.activate_initiators(built, systop, state,
                                            n=max(cfg.n_particles // 300, 4))

    # compile + warm the cache (one full block incl. a reaction step);
    # regrow neighbor capacities if the workload's densification exceeds the
    # static estimates (phase-separating melts at large N)
    state = runner.run_block(spec, cfg, state, block_steps)
    jax.block_until_ready(state.pos)
    for _ in range(3):
        m = runner.measure_cheap(spec, cfg, state)
        counts = {k: int(m[k]) for k in ("n_bonds", "n_angles",
                                         "n_dihedrals", "n_excl")}
        counts["excl_pair_cap"] = state.excl.shape[0]
        if build_mod.term_caps_near_full(cfg, counts):
            cfg, state = build_mod.grow_term_caps(cfg, state, counts=counts)
        elif bool(m["overflow"]):
            cfg, state = build_mod.grow_neighbor_caps(cfg, spec, state)
        else:
            break
        state = runner.run_block(spec, cfg, state, block_steps)
        jax.block_until_ready(state.pos)

    # timed run; if the sticky overflow flag latches DURING timing (the melt
    # densified past the retuned margin mid-run — the round-5 10k tabulated
    # leg did exactly that), regrow and re-time so every recorded leg is
    # overflow-free (an overflowed block silently drops pair forces)
    for _attempt in range(3):
        events_before = int(jnp.sum(state.reaction_counts))
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            state = runner.run_block(spec, cfg, state, block_steps)
        jax.block_until_ready(state.pos)
        dt = time.perf_counter() - t0
        m = runner.measure(spec, cfg, state)
        if not bool(m["overflow"]):
            break
        cfg, state = build_mod.grow_neighbor_caps(cfg, spec, state)
        state = runner.run_block(spec, cfg, state, block_steps)  # recompile
        jax.block_until_ready(state.pos)
    n_steps = n_blocks * block_steps
    events_timed = int(m["reaction_counts"].sum()) - events_before
    return {
        "n_particles": cfg.n_particles,
        "pps": round(cfg.n_particles * n_steps / dt, 1),
        "steps_timed": n_steps,
        "wall_s": round(dt, 3),
        "reaction_events": events_timed,
        "reaction_events_per_s": round(events_timed / dt, 2),
        "pallas": bool(cfg.use_pallas),
        "overflow": bool(m["overflow"]),
    }


def main():
    n_mols = int(os.environ.get("BENCH_N_MOLS", "3334"))   # ~10k particles
    n_blocks = int(os.environ.get("BENCH_BLOCKS", "5"))
    block_steps = int(os.environ.get("BENCH_BLOCK_STEPS", "200"))

    backend = _probe_backend()
    import jax
    if backend.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    else:
        # claim the device NOW with a trivial exec: the axon worker wedge
        # hits a process's FIRST device op (TPU_NUMBERS_r06 addenda) — by
        # forcing it here, the supervisor's beacon watch can kill and
        # retry a fresh process instead of hanging the whole bench
        jax.jit(lambda x: x + 1)(jax.numpy.ones(8)).block_until_ready()
    print("BENCH_DEVICE_OK %s" % backend, file=sys.stderr, flush=True)

    # TPU: the pallas cell-tile + lazy-row fast path; CPU keeps the row path
    # (interpret-mode pallas is slower). BENCH_NO_PALLAS=1 forces the row path.
    want_pallas = (backend == "tpu"
                   and not os.environ.get("BENCH_NO_PALLAS"))

    r10 = _bench_melt(n_mols, want_pallas, n_blocks, block_steps)
    node_pps, core_pps = measure_native_baseline(r10["n_particles"])
    denom = node_pps or ESPP_BASELINE_PPS

    extra = {
        **r10,
        "device": str(jax.devices()[0]),
        "backend": backend,
        "baseline": {
            "single_core_cpp_pps": core_pps,
            "single_node_pps": round(denom, 1),
            "model": "measured native/baseline_md.cpp x %d ranks x %.2f eff"
                     % (NODE_RANKS, PAR_EFF) if node_pps else
                     "fallback constant (native build failed)",
        },
    }

    # tabulated-workload number (rim135/dacron class, func-8 tables on every
    # type pair) so the recorded bench reflects the majority reference
    # workload class, not just the LJ flagship (VERDICT r3 item 6)
    if not os.environ.get("BENCH_SKIP_TAB"):
        rtab = _bench_melt(n_mols, want_pallas, max(n_blocks // 2, 2),
                           block_steps, tabulated=True)
        # features-matched denominator: the baseline's own tabulated pair
        # path (per-pair table interpolation + exclusion filtering), not the
        # cheaper analytic-LJ loop (VERDICT r4 item 8)
        tab_node, tab_core = measure_native_baseline(rtab["n_particles"],
                                                     mode="tab")
        rtab["baseline_single_node_pps"] = round(tab_node or denom, 1)
        rtab["vs_baseline"] = round(rtab["pps"] / (tab_node or denom), 3)
        extra["tabulated"] = rtab

    # 100k variant + the explicit v5e-8 gate arithmetic (BASELINE.md:
    # >=50x single-node at 100k on 8 chips; single-chip measured here,
    # aggregate projected linearly as the upper bound)
    if backend == "tpu" and not os.environ.get("BENCH_SKIP_LARGE"):
        large_mols = int(os.environ.get("BENCH_N_MOLS_LARGE", "33334"))
        r100 = _bench_melt(large_mols, want_pallas, max(n_blocks // 2, 2),
                           block_steps)
        node100, core100 = measure_native_baseline(r100["n_particles"], 100)
        denom100 = node100 or ESPP_BASELINE_PPS
        extra["large"] = {
            **r100,
            "baseline_single_node_pps": round(denom100, 1),
            "vs_baseline_1chip": round(r100["pps"] / denom100, 3),
            "gate_50x_aggregate_needed_pps": round(50 * denom100, 1),
            "gate_projection_8chip_linear": round(8 * r100["pps"], 1),
            "gate_fraction": round(8 * r100["pps"] / (50 * denom100), 4),
        }
        if not os.environ.get("BENCH_SKIP_TAB"):
            rtab100 = _bench_melt(large_mols, want_pallas, 2, block_steps,
                                  tabulated=True)
            tabn100, _ = measure_native_baseline(rtab100["n_particles"], 100,
                                                 mode="tab")
            rtab100["baseline_single_node_pps"] = round(tabn100 or denom100, 1)
            rtab100["vs_baseline_1chip"] = round(
                rtab100["pps"] / (tabn100 or denom100), 3)
            extra["large_tabulated"] = rtab100

    result = {
        "metric": "particle-steps/sec (reactive atrp_lj-class melt, %dk particles)"
                  % (r10["n_particles"] // 1000),
        "value": r10["pps"],
        "unit": "particle-steps/s",
        "vs_baseline": round(r10["pps"] / denom, 3),
        "extra": extra,
    }
    print(json.dumps(result))
    return 0


def _fallback_line(msg: str) -> None:
    print(json.dumps({
        "metric": "particle-steps/sec (reactive atrp_lj-class melt)",
        "value": 0.0,
        "unit": "particle-steps/s",
        "vs_baseline": 0.0,
        "extra": {"error": msg[:500]},
    }))


def _supervise() -> int:
    """Run the benchmark in a CHILD process, watching for the device
    beacon; kill + retry a fresh process when the claim wedges.

    The axon pool worker wedges a client's first device op after a prior
    session's disconnect, while FRESH processes can still claim within
    ~1-2 min windows (TPU_NUMBERS_r06 addenda).  A single in-process
    bench therefore risks hanging the whole round; the supervisor makes
    the recorded line robust: beacon within BENCH_CLAIM_TIMEOUT or the
    attempt is abandoned.  A cpu-fallback beacon (probe failed) is only
    accepted on the final attempt — earlier attempts retry for the TPU."""
    import subprocess
    import threading

    claim_t = float(os.environ.get("BENCH_CLAIM_TIMEOUT", "300"))
    total_t = float(os.environ.get("BENCH_TOTAL_TIMEOUT", "5400"))
    tries = int(os.environ.get("BENCH_CLAIM_RETRIES", "3"))
    for attempt in range(tries):
        env = dict(os.environ, BENCH_CHILD="1")
        p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True)
        beacon = threading.Event()
        beacon_kind = []

        def pump(proc=p, ev=beacon, kind=beacon_kind):
            for line in proc.stderr:
                sys.stderr.write(line)
                if "BENCH_DEVICE_OK" in line:
                    kind.append(line.strip().split()[-1])
                    ev.set()

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        ok = beacon.wait(claim_t)
        if ok and beacon_kind and beacon_kind[0] != "tpu" \
                and attempt < tries - 1:
            ok = False          # cpu fallback: retry for the real device
        if not ok:
            sys.stderr.write("bench supervisor: attempt %d/%d %s - "
                             "retrying fresh process\n"
                             % (attempt + 1, tries,
                                "got cpu fallback" if beacon.is_set()
                                else "no device beacon in %.0fs" % claim_t))
            p.kill()
            p.wait()
            time.sleep(float(os.environ.get("BENCH_CLAIM_BACKOFF", "40")))
            continue
        try:
            # the JSON result line is far smaller than the pipe buffer, so
            # waiting before reading cannot deadlock the child
            p.wait(timeout=total_t)
        except subprocess.TimeoutExpired:
            p.kill()
            _fallback_line("bench child exceeded BENCH_TOTAL_TIMEOUT")
            return 0
        sys.stdout.write(p.stdout.read())
        return p.returncode
    _fallback_line("no device claim in %d attempts (worker wedged)" % tries)
    return 0


if __name__ == "__main__":
    try:
        if os.environ.get("BENCH_CHILD") or os.environ.get("BENCH_FORCE_CPU"):
            sys.exit(main())
        sys.exit(_supervise())
    except Exception as exc:  # never leave a round without a parsed line
        import traceback
        traceback.print_exc(file=sys.stderr)
        _fallback_line("%s: %s" % (type(exc).__name__, str(exc)))
        sys.exit(0)
