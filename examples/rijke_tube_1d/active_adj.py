"""Rijke tube 1D — adjoint (left) nonlinear eigensolve.

Mirrors numerical_examples/Longitudinal/NetworkCode/RijkeTube1D/active_adj.py.
Expected eigenvalue (reference Results/Active/active_adj.log):
1242.185123-6.683160j — the conjugate of the direct mode.

Run:  python examples/rijke_tube_1d/active_adj.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np
import params

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector, velocity_eigenvector
from helmholtz_x_tpu.fem.fields import gaussian_function, rho_step, temperature_step
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.mesh import one_dimensional_setup
from helmholtz_x_tpu.mesh.xdmf import write_function_xdmf
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, start_time

start = start_time()

mesh = one_dimensional_setup(params.n_elem)
T = temperature_step(mesh, params.x_f, params.T_u, params.T_d)
matrices = AcousticMatrices(mesh, params.boundary_conditions, T)

FTF = nTau(params.n_ftf, params.tau)
rho = rho_step(mesh, params.x_f, params.a_f, params.rho_d, params.rho_u)
w = gaussian_function(mesh, params.x_r, params.a_r)
h = gaussian_function(mesh, params.x_f, params.a_f)
D = DistributedFlameMatrix(mesh, w, h, rho, T, params.q_0, params.u_b, FTF)
D.assemble_submatrices("adjoint")

target = 200 * 2 * np.pi
E = fixed_point_iteration(matrices, D, target, nev=2, i=0,
                          problem_type="adjoint")

omega, p_adjoint = normalize_eigenvector(mesh, E, 0)
v = velocity_eigenvector(mesh, p_adjoint, omega, rho)

write_function_xdmf(RESULTS + "/p_adj", mesh, p_adjoint.values)
dict_writer(RESULTS + "/eigenvalues_adj", {"adjoint": omega})
execution_time(start)
