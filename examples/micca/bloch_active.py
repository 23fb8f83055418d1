"""MICCA Bloch sector — active eigensolve on the 1/16 reduced problem.

Mirrors numerical_examples/AnnularCombustor/Micca/bloch/active.py.  The
geometric master/slave pairing makes the reduction exact: the sector value
3238.692+500.381j equals the full-annulus solve with 16 explicit flames
(see tests/test_micca_bloch.py for the stitched-annulus proof).

Run:  python examples/micca/bloch_active.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np
from scipy.io import loadmat

from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.fem.fields import DGField, q_volumetric
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.bloch import Blochifier
from helmholtz_x_tpu.ftf import stateSpace
from helmholtz_x_tpu.flame import PointwiseFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.utils.logging import execution_time, start_time

CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/bloch"
start = start_time()

l_cc, r_f, z_r = 0.2, 0.175, -0.02
r_gas, gamma = 287.0, 1.4
p_amb, T_amb = 101325.0, 300.0
rho_amb = p_amb / (r_gas * T_amb)
T_a, T_b = 1521.0, 1200.0
q_0, u_b = 2080.0, 0.66
R_outlet = -0.875 - 0.2j

mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh

boundary_conditions = {t: "Neumann" for t in range(1, 11)}
boundary_conditions[11] = {"Robin": R_outlet}
boundary_conditions[12] = "Master"
boundary_conditions[13] = "Slave"

z = mesh.points[mesh.cells].mean(axis=1)[:, 2]
T = np.where(z < 0, T_amb, np.where(z < l_cc, (T_b - T_a) * (z / l_cc) ** 2 + T_a, T_b))
c = DGField(np.sqrt(gamma * r_gas * T), "soundspeed")

acoustic_matrices = AcousticMatrices(mesh, boundary_conditions, c)
bloch_matrices = Blochifier(geometry=mesh, boundary_conditions=boundary_conditions,
                            N=16, passive_matrices=acoustic_matrices)

mat = loadmat(CASE + "/ftf.mat")
FTF = stateSpace(mat["A"], mat["b"], mat["c"], mat["d"])
h = q_volumetric(mesh, 1.0, flame_tag=0)
x_r = np.array([[r_f, 0.0, z_r]])
D = PointwiseFlameMatrix(mesh, None, x_r, h, rho_amb, q_0, u_b, FTF,
                         bloch_object=bloch_matrices)
D.assemble_submatrices("direct")
D.blochify()

E = fixed_point_iteration(bloch_matrices, D, 3200 + 500j, nev=3, i=0, tol=1e-3)
omega_1, p_1 = normalize_eigenvector(mesh, E, 0,
                                     BlochRemapper=bloch_matrices.remapper)
write_function_xdmf(RESULTS + "/p_1_bloch", mesh, p_1.values)
execution_time(start)
