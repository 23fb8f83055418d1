"""MICCA full annulus — fixed-point iteration, direct + adjoint.

Mirrors numerical_examples/AnnularCombustor/Micca/fullAnnulus/active_fpi.py.
Expected (reference Results/Active/FPI): omega_1 = 3253.754657+472.569066j,
omega_2 = 3248.702502+452.115564j; adjoints conjugate.

Run:  python examples/micca/active_fpi.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np
from scipy.io import loadmat

from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.fem.fields import DGField, q_multiple
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import stateSpace
from helmholtz_x_tpu.flame import PointwiseFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, start_time

CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/fullAnnulus"
start = start_time()

# physics (reference fullAnnulus/params.py)
l_cc, r_f, theta, z_r = 0.2, 0.175, np.deg2rad(22.5), -0.02
r_gas, gamma = 287.0, 1.4
p_amb, T_amb = 101325.0, 300.0
rho_amb = p_amb / (r_gas * T_amb)
T_a, T_b = 1521.0, 1200.0
q_0, u_b = 2080.0, 0.66
R_outlet = -0.875 - 0.2j
N_sector = 16

reader = XDMFReader(CASE + "/MeshDir/mesh")
mesh = reader.mesh
reader.getInfo()

z = mesh.points[mesh.cells].mean(axis=1)[:, 2]
T = np.where(z < 0, T_amb, np.where(z < l_cc, (T_b - T_a) * (z / l_cc) ** 2 + T_a, T_b))
c = DGField(np.sqrt(gamma * r_gas * T), "soundspeed")

matrices = AcousticMatrices(mesh, {11: {"Robin": R_outlet}}, c)

mat = loadmat(CASE + "/ftf.mat")
FTF = stateSpace(mat["A"], mat["b"], mat["c"], mat["d"])
h = q_multiple(mesh, N_sector)
x_r = np.array([(r_f * np.cos(i * theta), r_f * np.sin(i * theta), z_r)
                for i in range(N_sector)])
D = PointwiseFlameMatrix(mesh, None, x_r, h, rho_amb, q_0, u_b, FTF)

D.assemble_submatrices("direct")
E = fixed_point_iteration(matrices, D, 3225.120 + 481.0j, i=0, nev=4, tol=1e-3)
omega_1, p_1 = normalize_eigenvector(mesh, E, 0)
omega_2, p_2 = normalize_eigenvector(mesh, E, 1)
write_function_xdmf(RESULTS + "/p_1_dir", mesh, p_1.values)
dict_writer(RESULTS + "/eigenvalues_dir",
            {"direct_1": omega_1, "direct_2": omega_2})

D.assemble_submatrices("adjoint")
E_adj = fixed_point_iteration(matrices, D, 3225.120 - 481.0j, i=0, nev=4,
                              tol=1e-3, problem_type="adjoint")
omega_1_adj, p_1_adj = normalize_eigenvector(mesh, E_adj, 0)
dict_writer(RESULTS + "/eigenvalues_adj", {"adjoint_1": omega_1_adj})

execution_time(start)
