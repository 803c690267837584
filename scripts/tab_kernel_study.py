"""Design study for the in-kernel tabulated pair fast path.

For each tabulated reference example: report the nonbonded table-stack
census (n_types, n_tables, per-table source resolution/extent, pair kinds)
and quantify how well an S-segment piecewise-cubic fit reproduces the
production table values (the 4096-bin float32 stack that IS the current
fidelity reference) over each table's live range.

The candidate kernel design evaluates tabulated E/F per candidate pair as
  seg = clamp(floor((r - r0_a) * inv_w_a), 0, S-1);  t = frac
  E   = ((c3*t + c2)*t + c1)*t + c0         (per-table per-segment coeffs)
with the (table, segment) coefficient select done MXU-side, so the cost is
~n_tables * 4S MACs/slot.  This script decides S and validates fidelity.

Usage: python scripts/tab_kernel_study.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from table_fidelity import (EXAMPLES, build_with_synthesis,  # noqa: E402
                            prep_example)


def fit_segments(vals: np.ndarray, S: int):
    """Least-squares cubic per segment over the n_bins values.

    vals: (n_bins,) float64 production grid values (the fidelity target).
    Returns coeffs (S, 4) for E = c0 + c1 t + c2 t^2 + c3 t^3, t in [0,1)
    across the segment, plus the max abs/rel fit error per segment.
    """
    n_bins = len(vals)
    # segment s covers bins [s*n_bins/S, (s+1)*n_bins/S)
    coeffs = np.zeros((S, 4))
    errs = np.zeros(n_bins)
    edges = np.linspace(0, n_bins, S + 1).astype(int)
    for s in range(S):
        lo, hi = edges[s], edges[s + 1]
        y = vals[lo:hi]
        t = (np.arange(lo, hi) - lo) / max(hi - lo, 1)
        A = np.stack([np.ones_like(t), t, t * t, t**3], 1)
        c, *_ = np.linalg.lstsq(A, y, rcond=None)
        coeffs[s] = c
        errs[lo:hi] = A @ c - y
    return coeffs, errs


def live_range(e: np.ndarray, kT: float = 1.0, emax_kT: float = 50.0):
    """Bins a thermal pair can actually visit: E - min(E) < emax_kT * kT.
    Everything below that r is the repulsive wall (Boltzmann-suppressed to
    ~e^-50); wall errors only matter through the excluded-pair correction,
    which uses the same evaluation and cancels exactly."""
    e0 = e.min()
    return (e - e0) < emax_kT * kT


def main():
    only = sys.argv[1:] or None
    for label, rel in EXAMPLES:
        if only and label not in only:
            continue
        try:
            work, synth = prep_example(rel)
            bs, opts, synth = build_with_synthesis(work, synth)
        except Exception as exc:  # noqa: BLE001
            print("%-24s BUILD FAIL: %s" % (label, exc))
            continue
        spec, cfg = bs.spec, bs.cfg
        T = int(np.asarray(spec.type_mass).shape[0])
        kinds = np.asarray(spec.pair_kind).reshape(T, T)
        tab_a = np.asarray(spec.pair_tab_a).reshape(T, T)
        ef = np.asarray(spec.nb_ef, np.float64)
        r0 = np.asarray(spec.nb_r0, np.float64)
        dr = np.asarray(spec.nb_dr, np.float64)
        n_active = int(np.asarray(bs.state.active).sum())
        from chemlab_tpu.engine.spec import PAIR_LJ, PAIR_TAB
        used = sorted(set(tab_a[kinds == PAIR_TAB].tolist()))
        caps = np.asarray(spec.pair_caprad).reshape(T, T)
        lam = np.asarray(spec.pair_lam_scale).reshape(T, T)
        mix = np.asarray(spec.pair_mix_mode).reshape(T, T)
        pps = np.asarray(spec.pair_pps_incr).reshape(T, T)
        print("%-24s N=%-7d T=%-3d nb_tables=%-3d used_tab=%-3d "
              "lj_pairs=%d tab_pairs=%d caps=%d lam=%d mix=%d pps=%d"
              % (label, n_active, T, ef.shape[0], len(used),
                 (kinds == PAIR_LJ).sum(), (kinds == PAIR_TAB).sum(),
                 (caps > 0).sum(), lam.sum(), (mix != 0).sum(),
                 (pps > 0).sum()))
        if not used:
            continue
        for S in (32, 64, 128):
            worst = []
            for a in used:
                # live bin range (exclude flat padding tail: dr carries
                # n_src via the exact-embed; find last non-flat bin)
                e = ef[a, :, 0]
                f = ef[a, :, 1]
                nb = len(e)
                tail = nb
                while tail > 2 and e[tail - 1] == e[tail - 2] \
                        and f[tail - 1] == f[tail - 2]:
                    tail -= 1
                e, f = e[:tail + 1], f[:tail + 1]
                livemask = live_range(e)
                rels = []
                for vals in (e, f):
                    c, err = fit_segments(vals, S)
                    scale = np.maximum(np.abs(vals),
                                       np.abs(vals[livemask]).max() * 1e-2)
                    rel = np.abs(err / scale)
                    rels.append(rel[livemask].max())
                worst.append((max(rels), a))
            w, wa = max(worst)
            print("   S=%-4d worst live rel err %.2e (table %d)"
                  % (S, w, wa))


if __name__ == "__main__":
    main()
