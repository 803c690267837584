"""Compacted reaction matching (S1-rows) vs the full-row path.

Candidate rows are built only for particles that can be the type_1 side of
a channel; with sparse radicals the fired event set must match the full
path's (conflicts are rare), and the end-to-end trajectory must stay
valid (each particle in at most one event, all constraints respected).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from chemlab_tpu import testsystems
from chemlab_tpu.engine import reactions, runner


def _evset(ev):
    v, a, b, r = map(np.asarray, ev[:4])
    return sorted((int(x), int(y), int(z))
                  for x, y, z, ok in zip(a, b, r, v) if ok)


def test_compact_matches_full_path_events():
    built, systop, _ = testsystems.build_melt(n_mols=400, reactive=True,
                                              max_events=32)
    spec, cfg = built.spec, built.cfg
    assert cfg.rx_compact and cfg.rx_rows_cap >= 1024
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=150)
    st = testsystems.activate_initiators(built, systop, st, n=40)
    st = dataclasses.replace(st, step=jnp.asarray(0, jnp.int32),
                             reactions_on=jnp.asarray(True))

    ev_full = reactions.match_reactions(spec, cfg, st, jnp.uint32(0))
    s1 = reactions.side1_mask(spec, cfg, st)
    order = jnp.argsort(~s1)
    rowsel = order[: cfg.rx_rows_cap].astype(jnp.int32)
    cand, excl_hit = reactions.compact_candidates_from_rows(st, rowsel)
    ev_c = reactions.match_reactions_compact(spec, cfg, st, jnp.uint32(0),
                                             rowsel, s1[rowsel], cand,
                                             excl_hit)
    full, comp = _evset(ev_full), _evset(ev_c)
    # conflict resolution differs in principle; with sparse radicals the
    # event sets should agree almost everywhere
    common = len(set(full) & set(comp))
    assert common >= 0.9 * max(len(full), 1), (full, comp)
    assert len(full) >= 5  # the fixture actually fired events

    # no particle appears in two compact events
    v, a, b = map(np.asarray, ev_c[:3])
    used = np.concatenate([a[v], b[v]])
    assert len(np.unique(used)) == len(used)


def test_compact_lazy_candidates_cover_cutoff():
    """Cell-grid compact candidates (lazy mode) find the same events as
    row-based candidates: the rx stencil must cover every pair within the
    channel cutoffs."""
    built, systop, _ = testsystems.build_melt(n_mols=400, reactive=True,
                                              max_events=32)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=150)
    st = testsystems.activate_initiators(built, systop, st, n=40)
    st = dataclasses.replace(st, step=jnp.asarray(0, jnp.int32),
                             reactions_on=jnp.asarray(True))

    s1 = reactions.side1_mask(spec, cfg, st)
    order = jnp.argsort(~s1)
    rowsel = order[: cfg.rx_rows_cap].astype(jnp.int32)
    row_ok = s1[rowsel]
    cand_r, excl_r = reactions.compact_candidates_from_rows(st, rowsel)
    ev_rows = reactions.match_reactions_compact(spec, cfg, st, jnp.uint32(0),
                                                rowsel, row_ok, cand_r, excl_r)
    cand_c, excl_c, ovf = reactions.compact_candidates_from_cells(
        spec, cfg, st, rowsel)
    assert not bool(ovf)
    ev_cells = reactions.match_reactions_compact(spec, cfg, st, jnp.uint32(0),
                                                 rowsel, row_ok, cand_c,
                                                 excl_c)
    assert _evset(ev_rows) == _evset(ev_cells)


def test_compact_end_to_end_reacts():
    built, systop, _ = testsystems.build_melt(n_mols=300, reactive=True,
                                              max_events=16)
    spec, cfg = built.spec, built.cfg
    st = runner.initial_forces(spec, cfg, built.state)
    st = testsystems.warmup(built, st, steps=150)
    st = testsystems.activate_initiators(built, systop, st, n=30)
    st = dataclasses.replace(st, step=jnp.asarray(0, jnp.int32),
                             reactions_on=jnp.asarray(True))
    st = runner.run_block(spec, cfg, st, 600)
    m = runner.measure(spec, cfg, st)
    assert int(np.asarray(m["reaction_counts"]).sum()) > 10
    assert not bool(m["overflow"])
    # bonds created by reactions are tracked in a group
    assert int(np.asarray(m["group_bonds"]).sum()) > 0
