"""Table resampling fidelity: itype disciplines (espressopp Tabulated
itype 1 linear / 2 Akima / 3 cubic spline; ref: gromacs_topology.py:705-706)
and the exact-embed path for uniform itype-1 sources."""

import numpy as np
import pytest

from chemlab_tpu.engine import tables


def test_linear_resample_is_exact_on_segments():
    x = np.array([0.0, 1.0, 2.0, 4.0])
    y = np.array([0.0, 2.0, 0.0, 8.0])
    q = np.array([0.5, 1.5, 3.0])
    out = tables.resample(1, x, y, q)
    np.testing.assert_allclose(out, [1.0, 1.0, 4.0])


def test_akima_interpolates_knots_and_cubic_exactly():
    # Akima reproduces polynomials up to cubic on the knots themselves and
    # is exact for quadratics everywhere
    x = np.linspace(0.0, 3.0, 13)
    y = 2.0 * x**2 - x + 0.5
    q = np.linspace(0.05, 2.95, 101)
    out = tables.resample(2, x, y, q)
    np.testing.assert_allclose(out, 2.0 * q**2 - q + 0.5, rtol=1e-10)
    # knot values exact for an arbitrary function
    y2 = np.sin(3 * x)
    np.testing.assert_allclose(tables.resample(2, x, y2, x), y2, atol=1e-12)


def test_akima_avoids_overshoot_on_step():
    # classic Akima property: near-flat regions stay flat (unlike a cubic
    # spline, which rings)
    x = np.arange(10.0)
    y = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1.0])
    q = np.linspace(0.0, 4.0, 41)
    out = tables.resample(2, x, y, q)
    assert np.abs(out).max() < 1e-12


def test_cubic_spline_matches_knots_and_smooth():
    x = np.linspace(0.0, np.pi, 20)
    y = np.sin(x)
    q = np.linspace(0.0, np.pi, 301)
    out = tables.resample(3, x, y, q)
    np.testing.assert_allclose(out, np.sin(q), atol=2e-4)
    np.testing.assert_allclose(tables.resample(3, x, y, x), y, atol=1e-12)


def test_uniform_itype1_source_embeds_exactly():
    """Uniform-grid itype-1 tables go into the stack verbatim: the device
    lookup reproduces the reference's linear interpolation to f32."""
    r = 0.02 + 0.002 * np.arange(1500)
    e = 4.0 * ((0.3 / r) ** 12 - (0.3 / r) ** 6)   # smooth LJ-like table
    f = 24.0 * (2 * (0.3 / r) ** 12 - (0.3 / r) ** 6) / r
    tb = tables.TableStackBuilder(4096)
    tb.add("t", r, e, f, itype=1)
    stack = tb.build()
    np.testing.assert_allclose(stack.ef[0, :1500, 0], e.astype(np.float32))
    assert stack.dr[0] == pytest.approx(0.002)
    # padding repeats the boundary value (clamp semantics)
    assert (stack.ef[0, 1500:, 0] == np.float32(e[-1])).all()
    # report confirms f32-level fidelity
    name, itype, ae, rel, af = tb.fidelity_report(5000)[0]
    assert rel < 2e-6


def test_nonuniform_source_falls_back_to_resample():
    r = np.concatenate([np.linspace(0.1, 1.0, 50),
                        np.linspace(1.02, 3.0, 300)])
    e = 1.0 / r**2
    f = 2.0 / r**3
    tb = tables.TableStackBuilder(4096)
    tb.add("t", r, e, f, itype=1)
    stack = tb.build()
    assert stack.dr[0] == pytest.approx((3.0 - 0.1) / 4095)
    _, _, _, rel, _ = tb.fidelity_report(5000)[0]
    assert rel < 1e-3


def test_itype_keying_distinguishes_tables():
    r = np.linspace(0.1, 2.0, 100)
    e = np.exp(-r)
    f = np.exp(-r)
    tb = tables.TableStackBuilder(256)
    i1 = tb.add("same", r, e, f, itype=1)
    i2 = tb.add("same", r, e, f, itype=2)
    assert i1 != i2
    assert tb.add("same", r, e, f, itype=1) == i1
