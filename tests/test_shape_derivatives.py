"""Shape-derivative validation by finite differences: displace one FFD
control point radially by eps, morph the mesh, re-solve the nonlinear
eigenproblem, and compare (omega(eps) - omega)/eps against the adjoint-based
Hadamard derivative.  This validates the whole chain (adjoint normalization,
surface integral, Bernstein displacement, mesh morphing) without relying on
the reference's gmsh-parametric normals.
"""

import numpy as np
import pytest

from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.fem.fields import Field, density_step, gaussian_function, temperature_step
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.shape import FFDCylindrical, deform_mesh, shape_derivatives_ffd

CASE = "/root/reference/numerical_examples/ShapeSensitivities/RijkeFFD"

r_gas, gamma = 287.0, 1.4
p_amb, rho_amb = 1e5, 1.22
rho_u, rho_d = rho_amb, 0.85
T_in = p_amb / (r_gas * rho_u)
T_out = p_amb / (r_gas * rho_d)
R_in = R_out = -0.975 - 0.05j
q_0, u_b, n_ftf, tau = 200.0, 0.1, 0.014, 0.0015
x_f = np.array([[0.0, 0.0, 0.25]])
x_r = np.array([[0.0, 0.0, 0.20]])
a_f = a_r = 0.025


def _solve(mesh, problem_type="direct"):
    bcs = {1: {"Neumann"}, 2: {"Robin": R_out}, 3: {"Robin": R_in}}
    T = temperature_step(mesh, x_f, T_in, T_out)
    matrices = AcousticMatrices(mesh, bcs, T)
    FTF = nTau(n_ftf, tau)
    rho = Field(density_step(mesh.points[:, 2], x_f[0][2], a_f, rho_d, rho_u), "rho")
    w = gaussian_function(mesh, x_r, a_r)
    h = gaussian_function(mesh, x_f, a_f)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF, gamma=gamma)
    D.assemble_submatrices(problem_type)
    E = fixed_point_iteration(matrices, D, 180 * 2 * np.pi, nev=2, i=0,
                              problem_type=problem_type)
    omega, p = normalize_eigenvector(mesh, E, 0, print_eigs=False)
    return omega, p, matrices, D


@pytest.mark.slow
def test_ffd_derivative_vs_finite_difference():
    mesh = XDMFReader(CASE + "/MeshDir/Original/mesh").mesh
    omega0, p_dir, matrices, D = _solve(mesh, "direct")
    _, p_adj, _, _ = _solve(mesh, "adjoint")

    lattice = FFDCylindrical.from_mesh(mesh, 2, 4, 9)
    derivs = shape_derivatives_ffd(mesh, lattice, 1, omega0, p_dir, p_adj,
                                   matrices.c, matrices, D)
    # pick a mid-tube control point on the outer layer
    k_z, j_phi = 4, 1
    d_adj = derivs[k_z][j_phi]

    # central difference: O(eps^2) truncation, so the adjoint derivative is
    # gated at 2% instead of the one-sided check's 15%
    eps = 2e-4
    lattice.Pr[lattice.l - 1, j_phi, k_z] += eps
    mesh_p = deform_mesh(mesh, lattice)
    omega_p, _, _, _ = _solve(mesh_p, "direct")
    lattice.Pr[lattice.l - 1, j_phi, k_z] -= 2 * eps
    mesh_m = deform_mesh(mesh, lattice)
    omega_m, _, _, _ = _solve(mesh_m, "direct")
    lattice.Pr[lattice.l - 1, j_phi, k_z] += eps
    d_fd = (omega_p - omega_m) / (2 * eps)

    assert abs(d_fd) > 0, "degenerate test: zero sensitivity"
    rel = abs(d_adj - d_fd) / abs(d_fd)
    assert rel < 0.02, (d_adj, d_fd, rel)
