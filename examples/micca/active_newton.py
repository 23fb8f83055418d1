"""MICCA full annulus — Newton solver on the full nonlinear operator
L(omega) = A + omega B + omega^2 C - D(omega).

Mirrors numerical_examples/AnnularCombustor/Micca/fullAnnulus/active_newton.py.
Expected (reference Results/Active/NewtonSolver/eigenvalues.txt):
    i=0: 3249.1195+462.6225j    i=1: 3251.3257+467.4424j

Run:  python examples/micca/active_newton.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import params

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.fem.fields import q_multiple
from helmholtz_x_tpu.flame import PointwiseFlameMatrix
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.solvers.newton import newton_solver
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

start = start_time()

reader = XDMFReader(params.CASE + "/MeshDir/mesh")
mesh = reader.mesh
reader.getInfo()

matrices = AcousticMatrices(mesh, params.boundary_conditions, params.c(mesh))
h = q_multiple(mesh, params.N_sector)
D = PointwiseFlameMatrix(mesh, None, params.measurement_points(), h,
                         params.rho_amb, params.q_0, params.u_b, params.ftf())
D.assemble_submatrices("direct")

omega_1, p_1 = newton_solver(matrices, D, 3260 + 460j, i=0, nev=2, tol=1e-2)
info(f"Newton i=0: omega = {omega_1:.4f}")

write_function_xdmf(RESULTS + "/p_newton", mesh, p_1.values)
dict_writer(RESULTS + "/eigenvalues_newton", {"newton_0": omega_1})
execution_time(start)
