"""Rijke tube 1D — active (nonlinear) eigensolve with the n-tau flame model.

Mirrors the reference script numerical_examples/Longitudinal/NetworkCode/
RijkeTube1D/active.py on this framework's API.  Expected eigenvalue
(reference Results/Active/active.log): 1242.185123+6.683160j.

Run:  python examples/rijke_tube_1d/active.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np

from helmholtz_x_tpu.mesh import one_dimensional_setup
from helmholtz_x_tpu.fem.fields import gaussian_function, rho_step, temperature_step
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector, velocity_eigenvector
from helmholtz_x_tpu.mesh.xdmf import write_function_xdmf
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, start_time

start = start_time()

# physics (reference RijkeTube1D/params.py)
r_gas, gamma = 287.0, 1.4
p_amb, rho_amb = 1e5, 1.22
rho_u, rho_d = rho_amb, 0.85
c_u = np.sqrt(gamma * p_amb / rho_u)
c_d = np.sqrt(gamma * p_amb / rho_d)
T_u, T_d = c_u**2 / (gamma * r_gas), c_d**2 / (gamma * r_gas)
n_ftf = 0.1 / (np.pi * 0.047**2 / 4)
q_0, u_b, tau = -27.008910380099735, 0.10066660027273297, 0.0015
x_f = np.array([[0.25, 0.0, 0.0]])
x_r = np.array([[0.20, 0.0, 0.0]])
a_f = a_r = 0.025

mesh = one_dimensional_setup(3000)
boundary_conditions = {1: {"Neumann"}, 2: {"Neumann"}}

T = temperature_step(mesh, x_f, T_u, T_d)
matrices = AcousticMatrices(mesh, boundary_conditions, T)

FTF = nTau(n_ftf, tau)
rho = rho_step(mesh, x_f, a_f, rho_d, rho_u)
w = gaussian_function(mesh, x_r, a_r)
h = gaussian_function(mesh, x_f, a_f)
D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF)
D.assemble_submatrices()

target = 200 * 2 * np.pi
E = fixed_point_iteration(matrices, D, target, nev=2, i=0)

omega, p_active = normalize_eigenvector(mesh, E, 0)
v = velocity_eigenvector(mesh, p_active, omega, rho)

write_function_xdmf(RESULTS + "/p", mesh, p_active.values)
dict_writer(RESULTS + "/eigenvalues", {"direct": omega})
execution_time(start)
