"""RijkeFFD — re-solve the thermoacoustic eigenproblem on the optimized
(FFD-morphed) mesh produced by generate_optimized_mesh.py.

Mirrors numerical_examples/ShapeSensitivities/RijkeFFD/main_opt.py.  On the
reference's committed optimized mesh the eigenvalue moves to
1270.283630-2.230131j (growth rate improved -0.867 -> -2.230,
Results/Optimized/results.log).

Run:  python examples/rijke_ffd/main_opt.py [path/to/mesh]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")

import numpy as np

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.fem.fields import (
    Field,
    density_step,
    gaussian_function,
    temperature_step,
)
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

CASE = "/root/reference/numerical_examples/ShapeSensitivities/RijkeFFD"
start = start_time()

# default: the reference's committed optimized mesh; pass a path to use the
# one written by generate_optimized_mesh.py instead
mesh_path = sys.argv[1] if len(sys.argv) > 1 else CASE + "/MeshDir/Optimized/mesh"

r_gas, gamma = 287.0, 1.4
p_amb, rho_u, rho_d = 1e5, 1.22, 0.85
T_in, T_out = p_amb / (r_gas * rho_u), p_amb / (r_gas * rho_d)
R_in = R_out = -0.975 - 0.05j
q_0, u_b, n_ftf, tau = 200.0, 0.1, 0.014, 0.0015
x_f = np.array([[0.0, 0.0, 0.25]])
x_r = np.array([[0.0, 0.0, 0.20]])
a_f = a_r = 0.025

mesh = XDMFReader(mesh_path).mesh
bcs = {1: {"Neumann"}, 2: {"Robin": R_out}, 3: {"Robin": R_in}}
T = temperature_step(mesh, x_f, T_in, T_out)
matrices = AcousticMatrices(mesh, bcs, T)
rho = Field(density_step(mesh.points[:, 2], 0.25, a_f, rho_d, rho_u), "rho")
D = DistributedFlameMatrix(mesh, gaussian_function(mesh, x_r, a_r),
                           gaussian_function(mesh, x_f, a_f), rho, T,
                           q_0, u_b, nTau(n_ftf, tau), gamma=gamma)
D.assemble_submatrices("direct")

E = fixed_point_iteration(matrices, D, 180 * 2 * np.pi, nev=2, i=0)
omega, p = normalize_eigenvector(mesh, E, 0)
info(f"optimized-mesh omega = {omega:.6f}")

write_function_xdmf(RESULTS + "/p_optimized", mesh, p.values)
dict_writer(RESULTS + "/eigenvalue_optimized", {"direct": omega})
execution_time(start)
