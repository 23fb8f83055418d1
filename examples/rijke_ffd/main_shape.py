"""RijkeFFD — adjoint shape derivatives w.r.t. a cylindrical FFD lattice and
one optimization step (gmsh-free: mesh morphing is an array op).

Mirrors numerical_examples/ShapeSensitivities/RijkeFFD/main_shape.py +
generateOptimizedMesh.py, including the reference's degree-2 elements
(main_shape.py:68) and its nonaxisymmetric real/imag normalization.  The
derivative chain is validated against finite differences in
tests/test_shape_derivatives.py (P1 and P2).

Run:  python examples/rijke_ffd/main_shape.py [--degree 1]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np

from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.fem.fields import Field, density_step, gaussian_function, temperature_step
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.shape import (
    FFDCylindrical,
    deform_mesh,
    nonaxisymmetric_derivatives_normalize,
    shape_derivatives_ffd,
    write_ffd_points,
)
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

CASE = "/root/reference/numerical_examples/ShapeSensitivities/RijkeFFD"
start = start_time()

r_gas, gamma = 287.0, 1.4
p_amb, rho_amb = 1e5, 1.22
rho_u, rho_d = rho_amb, 0.85
T_in, T_out = p_amb / (r_gas * rho_u), p_amb / (r_gas * rho_d)
R_in = R_out = -0.975 - 0.05j
q_0, u_b, n_ftf, tau = 200.0, 0.1, 0.014, 0.0015
x_f = np.array([[0.0, 0.0, 0.25]])
x_r = np.array([[0.0, 0.0, 0.20]])
a_f = a_r = 0.025
DEGREE = 1 if "--degree" in sys.argv and sys.argv[sys.argv.index("--degree") + 1] == "1" else 2


def solve(mesh, problem_type="direct"):
    bcs = {1: {"Neumann"}, 2: {"Robin": R_out}, 3: {"Robin": R_in}}
    T = temperature_step(mesh, x_f, T_in, T_out)
    matrices = AcousticMatrices(mesh, bcs, T, degree=DEGREE)
    rho = Field(density_step(mesh.points[:, 2], 0.25, a_f, rho_d, rho_u), "rho")
    D = DistributedFlameMatrix(mesh, gaussian_function(mesh, x_r, a_r),
                               gaussian_function(mesh, x_f, a_f), rho, T,
                               q_0, u_b, nTau(n_ftf, tau), degree=DEGREE,
                               gamma=gamma)
    D.assemble_submatrices(problem_type)
    E = fixed_point_iteration(matrices, D, 180 * 2 * np.pi, nev=2, i=0,
                              problem_type=problem_type)
    omega, p = normalize_eigenvector(mesh, E, 0, degree=DEGREE,
                                     print_eigs=False)
    return omega, p, matrices, D


# the reference's degree-2 shape run happens on the committed
# MeshDir/ShapeDerivatives mesh (main_shape.py regenerates it with the same
# gmsh recipe; the .xdmf is in the tree)
mesh = XDMFReader(CASE + "/MeshDir/ShapeDerivatives/mesh").mesh

omega_dir, p_dir, matrices, D = solve(mesh, "direct")
info(f"direct  omega = {omega_dir:.6f}")
omega_adj, p_adj, _, _ = solve(mesh, "adjoint")
info(f"adjoint omega = {omega_adj:.6f}")

lattice = FFDCylindrical.from_mesh(mesh, 2, 4, 9)
write_ffd_points(lattice, RESULTS + "/FFDinitial")
derivatives = shape_derivatives_ffd(mesh, lattice, 1, omega_dir, p_dir, p_adj,
                                    matrices.c, matrices, D, degree=DEGREE)
normalized = nonaxisymmetric_derivatives_normalize(derivatives)
dict_writer(RESULTS + "/normalized", normalized)

# one descent step on the growth rate (reference generateOptimizedMesh.py:52-57)
step = 0.01
for zeta, row in normalized.items():
    for phi, d in row.items():
        lattice.Pr[lattice.l - 1, phi, zeta] -= step * np.imag(d)
mesh_opt = deform_mesh(mesh, lattice)
omega_opt, _, _, _ = solve(mesh_opt, "direct")
info(f"after one FFD step: omega = {omega_opt:.6f} "
     f"(growth-rate change {omega_opt.imag - omega_dir.imag:+.4f})")
execution_time(start)
