"""Potential table stacks.

The reference engine interpolates each tabulated potential from its own
(r, E, F) file at runtime (espressopp ``Tabulated`` with itype 1/2/3 =
linear/Akima/cubic; ref: gromacs_topology.py:705-706).  On TPU we want one
dense gatherable array, so every table is resampled once on the host onto a
uniform grid and stacked:

    stack.ef : (n_tables, n_bins, 2) float32   [:, :, 0]=E, [:, :, 1]=F
    stack.r0 : (n_tables,)  grid start
    stack.dr : (n_tables,)  grid spacing

Device-side lookup is then a fused gather + linear blend (`interpolate`).
Resampling uses cubic Hermite (Akima-like) interpolation of the source
points, so itype differences between linear/spline source tables are below
resampling resolution for the default 4096 bins.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

DEFAULT_BINS = 4096


def _pchip_resample(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Monotone-friendly cubic resampling with linear fallback for tiny tables."""
    if len(x) < 4:
        return np.interp(xq, x, y)
    # Fritsch-Carlson monotone cubic (PCHIP) without scipy.
    h = np.diff(x)
    m = np.diff(y) / h
    d = np.empty_like(y)
    d[0] = m[0]
    d[-1] = m[-1]
    w1 = 2 * h[1:] + h[:-1]
    w2 = h[1:] + 2 * h[:-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        dm = (w1 + w2) / (w1 / m[:-1] + w2 / m[1:])
    dm[np.sign(m[:-1]) * np.sign(m[1:]) <= 0] = 0.0
    d[1:-1] = dm
    idx = np.clip(np.searchsorted(x, xq) - 1, 0, len(x) - 2)
    t = (xq - x[idx]) / h[idx]
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t**2 * (3 - 2 * t)
    h11 = t**2 * (t - 1)
    out = h00 * y[idx] + h10 * h[idx] * d[idx] + h01 * y[idx + 1] + h11 * h[idx] * d[idx + 1]
    # clamp extrapolation
    out = np.where(xq <= x[0], y[0], out)
    out = np.where(xq >= x[-1], y[-1], out)
    return out


@dataclasses.dataclass
class TableStack:
    """A stack of resampled potential tables (host-side numpy)."""

    ef: np.ndarray   # (n_tables, n_bins, 2)
    r0: np.ndarray   # (n_tables,)
    dr: np.ndarray   # (n_tables,)
    names: list      # n_tables source identifiers

    @property
    def n_tables(self) -> int:
        return self.ef.shape[0]

    @property
    def n_bins(self) -> int:
        return self.ef.shape[1]


class TableStackBuilder:
    """Accumulates (r, E, F) source tables, deduplicating by name."""

    def __init__(self, n_bins: int = DEFAULT_BINS):
        self.n_bins = n_bins
        self._tables = []
        self._index = {}

    def add(self, name: str, r: np.ndarray, e: np.ndarray, f: np.ndarray) -> int:
        if name in self._index:
            return self._index[name]
        idx = len(self._tables)
        self._tables.append((name, np.asarray(r, np.float64), np.asarray(e, np.float64),
                             np.asarray(f, np.float64)))
        self._index[name] = idx
        return idx

    def __contains__(self, name):
        return name in self._index

    def index(self, name: str) -> int:
        return self._index[name]

    def build(self) -> TableStack:
        n = max(len(self._tables), 1)
        ef = np.zeros((n, self.n_bins, 2), dtype=np.float32)
        r0 = np.zeros(n, dtype=np.float32)
        dr = np.ones(n, dtype=np.float32)
        names = []
        for i, (name, r, e, f) in enumerate(self._tables):
            order = np.argsort(r)
            r, e, f = r[order], e[order], f[order]
            lo, hi = float(r[0]), float(r[-1])
            grid = np.linspace(lo, hi, self.n_bins)
            ef[i, :, 0] = _pchip_resample(r, e, grid)
            ef[i, :, 1] = _pchip_resample(r, f, grid)
            r0[i] = lo
            dr[i] = (hi - lo) / (self.n_bins - 1)
            names.append(name)
        if not self._tables:
            names = ["<empty>"]
        return TableStack(ef=ef, r0=r0, dr=dr, names=names)


def interpolate(stack_ef, stack_r0, stack_dr, table_idx, r):
    """Linear interpolation of stacked tables on device.

    Args:
      stack_ef: (n_tables, n_bins, 2) energies/forces.
      stack_r0, stack_dr: per-table grid start/spacing, (n_tables,).
      table_idx: integer array, table id per query.
      r: query coordinate, same shape as table_idx.

    Returns:
      (E, F) arrays shaped like ``r``.  Queries outside the grid clamp to the
      boundary values (matching the reference engine's behavior at the table
      edges).
    """
    n_bins = stack_ef.shape[1]
    r0 = stack_r0[table_idx]
    dr = stack_dr[table_idx]
    u = (r - r0) / dr
    u = jnp.clip(u, 0.0, n_bins - 1.000001)
    i0 = u.astype(jnp.int32)
    frac = (u - i0)[..., None]
    lo = stack_ef[table_idx, i0]
    hi = stack_ef[table_idx, jnp.minimum(i0 + 1, n_bins - 1)]
    ef = lo * (1.0 - frac) + hi * frac
    return ef[..., 0], ef[..., 1]
