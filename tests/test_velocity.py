"""velocity_eigenvector validation.

The reference commits no velocity .h5 data (only XDMF XML stubs), so the
oracle is analytic: for polynomial pressure fields of the element degree,
grad(p) is globally continuous (P1: constant; P2: linear), interpolation is
unambiguous, and u = grad(p)/(i omega rho) is exact at every dof.
"""

import numpy as np

from helmholtz_x_tpu.eigenvectors import velocity_eigenvector
from helmholtz_x_tpu.fem.fields import Field
from helmholtz_x_tpu.fem.p2 import P2Space, integrate_pp_p2
from helmholtz_x_tpu.mesh.builders import one_dimensional_setup, square_setup

OMEGA = 700.0 + 3.0j
RHO = 1.17


def test_velocity_p1_linear_exact():
    mesh = square_setup(6)
    xy = mesh.points
    p = Field((2.0 + 1.5j) * xy[:, 0] + (0.5 - 3.0j) * xy[:, 1], "p")
    v = velocity_eigenvector(mesh, p, OMEGA, RHO, normalize=False)
    expect = np.array([2.0 + 1.5j, 0.5 - 3.0j]) / (1j * OMEGA * RHO)
    assert np.allclose(v.values, expect[None, :], rtol=1e-12)


def test_velocity_p2_quadratic_exact():
    mesh = square_setup(6)
    space = P2Space.build(mesh)
    xy = space.dof_coordinates()
    # complex quadratic: grad is linear => representable in vector P2
    p = Field(3.0 * xy[:, 0] ** 2 + 2j * xy[:, 0] * xy[:, 1] - xy[:, 1] ** 2
              + (4 - 1j) * xy[:, 0], "p")
    v = velocity_eigenvector(mesh, p, OMEGA, RHO, degree=2, normalize=False)
    gx = 6.0 * xy[:, 0] + 2j * xy[:, 1] + (4 - 1j)
    gy = 2j * xy[:, 0] - 2.0 * xy[:, 1]
    expect = np.stack([gx, gy], axis=1) / (1j * OMEGA * RHO)
    assert np.allclose(v.values, expect, rtol=1e-10, atol=1e-12)


def test_velocity_rho_field_divides_pointwise():
    mesh = square_setup(4)
    xy = mesh.points
    p = Field(1.0 * xy[:, 0] + 2.0 * xy[:, 1], "p")
    rho = Field(1.0 + xy[:, 0], "rho")
    v = velocity_eigenvector(mesh, p, OMEGA, rho, normalize=False)
    expect = np.stack([np.ones(len(xy)), 2 * np.ones(len(xy))], axis=1)
    expect = expect / (1j * OMEGA) / (1.0 + xy[:, 0])[:, None]
    assert np.allclose(v.values, expect, rtol=1e-12)


def test_velocity_normalization_conjugated():
    """int u . conj(u) dx = 1 (the reference's UFL inner(v,v) measure)."""
    from helmholtz_x_tpu.fem.assembly import integrate_p1_squared

    mesh = square_setup(6)
    xy = mesh.points
    p = Field((1 + 2j) * xy[:, 0] + (3 - 1j) * xy[:, 1] ** 1, "p")
    v = velocity_eigenvector(mesh, p, OMEGA, RHO, normalize=True)
    total = sum(integrate_p1_squared(mesh, v.values[:, c].real)
                + integrate_p1_squared(mesh, v.values[:, c].imag)
                for c in range(2))
    assert np.isclose(total, 1.0, rtol=1e-10)


def test_velocity_1d_scalar():
    mesh = one_dimensional_setup(50)
    x = mesh.points[:, 0]
    p = Field((2.0 - 1.0j) * x, "p")
    v = velocity_eigenvector(mesh, p, OMEGA, RHO, normalize=False)
    assert v.values.ndim == 1
    assert np.allclose(v.values, (2.0 - 1.0j) / (1j * OMEGA * RHO), rtol=1e-12)
