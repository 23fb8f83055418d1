"""Regression test for the DG0-temperature choked-BC surface-averaged gamma.

With a piecewise-constant (DG0) temperature field the gamma values live on
CELLS; the surface average over a choked boundary must evaluate gamma on each
facet's adjacent cell (reference acoustic_matrices.py:75-90 integrates the
gamma *function* over ds, which dolfinx restricts to the exterior cell).
Indexing the per-cell array with facet VERTEX ids — the round-1 bug — silently
averages unrelated entries.
"""

import numpy as np

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.fem.fields import DGField, gamma_function, temperature_uniform
from helmholtz_x_tpu.mesh.builders import square_setup


def _dg0_temperature(mesh, t_left, t_right):
    """DG0 temperature: t_left on cells with centroid x<0.5, t_right elsewhere."""
    cx = mesh.points[mesh.cells][:, :, 0].mean(axis=1)
    vals = np.where(cx < 0.5, t_left, t_right)
    return DGField(vals, "temperature")


def test_dg0_uniform_matches_p1():
    """Uniform DG0 temperature must reproduce the P1 surface average exactly."""
    mesh = square_setup(8)
    T0 = 1200.0
    bcs = {1: {"ChokedInlet": 0.01}, 2: {"ChokedOutlet": 0.02}}

    mp1 = AcousticMatrices(mesh, bcs, temperature_uniform(mesh, T0))
    mdg = AcousticMatrices(mesh, dict(bcs), _dg0_temperature(mesh, T0, T0))

    g_p1 = mp1._surface_avg_gamma(1)
    g_dg = mdg._surface_avg_gamma(1)
    g_exact = gamma_function(np.array([T0]))[0]
    assert abs(g_p1 - g_exact) < 1e-13
    assert abs(g_dg - g_exact) < 1e-13

    # the Robin/choked boundary-mass operators must coincide too
    bp, bd = mp1.B.to_dense(), mdg.B.to_dense()
    assert np.allclose(bp, bd, rtol=0, atol=1e-12 * np.abs(bp).max())


def test_dg0_two_level_surface_average_exact():
    """Non-uniform DG0 temperature: every inlet-adjacent cell sits at T_left and
    every outlet-adjacent cell at T_right, so the surface averages are exactly
    gamma(T_left) / gamma(T_right).  The buggy vertex-id indexing reads cell
    entries 'vertex id' instead, which for this mesh mixes both levels."""
    mesh = square_setup(8)
    t_left, t_right = 600.0, 1800.0
    T = _dg0_temperature(mesh, t_left, t_right)
    bcs = {1: {"ChokedInlet": 0.01}, 2: {"ChokedOutlet": 0.02}}
    m = AcousticMatrices(mesh, bcs, T)

    g_in = m._surface_avg_gamma(1)   # x=0 boundary: all adjacent cells at t_left
    g_out = m._surface_avg_gamma(2)  # x=1 boundary: all adjacent cells at t_right
    assert abs(g_in - gamma_function(np.array([t_left]))[0]) < 1e-13
    assert abs(g_out - gamma_function(np.array([t_right]))[0]) < 1e-13
    assert abs(g_in - g_out) > 1e-3  # the two levels genuinely differ


def test_gamma_function_preserves_dg0():
    """gamma_function / sound_speed_variable_gamma keep per-cell fields
    per-cell (round-1 bug: DGField fell into np.asarray(dataclass))."""
    from helmholtz_x_tpu.fem.fields import sound_speed_variable_gamma

    mesh = square_setup(4)
    T = _dg0_temperature(mesh, 300.0, 900.0)
    g = gamma_function(T)
    assert isinstance(g, DGField)
    assert g.values.shape == (mesh.num_cells,)
    c = sound_speed_variable_gamma(mesh, T)
    assert isinstance(c, DGField)
    assert c.values.shape == (mesh.num_cells,)
