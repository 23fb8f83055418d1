"""PRF nondimensional Rijke tube — direct + adjoint active eigensolve with
Robin boundary conditions (quadratic/PEP pencil).

Mirrors the reference script numerical_examples/Longitudinal/PRF/RijkeTube1D/
active.py on this framework's API.  Expected (reference Results/Active/
active.log): direct omega = 3.422713+0.002195j, adjoint conjugate.

Run:  python examples/prf_rijke_tube/active.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np

from helmholtz_x_tpu.mesh import one_dimensional_setup
from helmholtz_x_tpu.fem.fields import (
    Field,
    c_step,
    density_step,
    gaussian_function,
    temperature_step,
)
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, start_time

start = start_time()

# nondimensionalization (reference PRF/RijkeTube1D/params.py:45-67)
r_gas, gamma = 287.0, 1.4
p_amb, rho_amb, c_amb = 1e5, 1.22, 339.0
rho_in_dim, rho_out_dim = rho_amb, 0.85
T_in_dim = p_amb / (r_gas * rho_in_dim)
T_out_dim = p_amb / (r_gas * rho_out_dim)
L_ref, U_ref, p_ref = 1.0, c_amb, p_amb
T_u = T_in_dim * r_gas / U_ref**2
T_d = T_out_dim * r_gas / U_ref**2
rho_u = rho_in_dim * U_ref**2 / p_ref
rho_d = rho_out_dim * U_ref**2 / p_ref
d_tube = 0.047
n_dim = 0.014 / (np.pi * d_tube**2 / 4)
n_ftf = n_dim / (p_ref * L_ref**2)
tau = 0.0015 * U_ref / L_ref
q_0, u_b = 200.0, 0.1
R_in = R_out = -0.975 - 0.05j
x_f = np.array([[0.25, 0.0, 0.0]])
x_r = np.array([[0.20, 0.0, 0.0]])
a_f = a_r = 0.025

c_u = np.sqrt(gamma * p_amb / rho_in_dim) / U_ref
c_d = np.sqrt(gamma * p_amb / rho_out_dim) / U_ref

mesh = one_dimensional_setup(300)
boundary_conditions = {1: {"Robin": R_in}, 2: {"Robin": R_out}}

c = c_step(mesh, x_f, c_u, c_d)
matrices = AcousticMatrices(mesh, boundary_conditions, c)

FTF = nTau(n_ftf, tau)
rho = Field(density_step(mesh.points[:, 0], x_f[0][0], a_f, rho_d, rho_u), "rho")
T = temperature_step(mesh, x_f, T_u, T_d)
w = gaussian_function(mesh, x_r, a_r)
h = gaussian_function(mesh, x_f, a_f)

results = {}
for problem_type in ("direct", "adjoint"):
    D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF, gamma=gamma)
    D.assemble_submatrices(problem_type)
    E = fixed_point_iteration(matrices, D, np.pi, nev=2,
                              problem_type=problem_type)
    omega, p = normalize_eigenvector(mesh, E, 0)
    results[problem_type] = omega

dict_writer(RESULTS + "/eigenvalues", results)
execution_time(start)
