"""Physics constants of the dimensional Rijke-tube case (values per the
reference case definition, numerical_examples/Longitudinal/NetworkCode/
RijkeTube1D/params.py:1-40)."""

import numpy as np

r_gas = 287.0
gamma = 1.4

p_amb = 1e5
rho_amb = 1.22

T_amb = p_amb / (r_gas * rho_amb)
c_amb = np.sqrt(gamma * p_amb / rho_amb)

rho_u = rho_amb
rho_d = 0.85

c_u = np.sqrt(gamma * p_amb / rho_u)
c_d = np.sqrt(gamma * p_amb / rho_d)

T_u = c_u**2 / (gamma * r_gas)
T_d = c_d**2 / (gamma * r_gas)

n = 0.1
q_0 = -27.008910380099735
u_b = 0.10066660027273297
tau = 0.0015

d_tube = 0.047
S_c = np.pi * d_tube**2 / 4
n /= S_c

x_f = np.array([[0.25, 0.0, 0.0]])
a_f = 0.025

x_r = np.array([[0.20, 0.0, 0.0]])
a_r = 0.025


def build_case(n_elem: int = 3000):
    """Assembled (mesh, matrices, D) for the dimensional Rijke-tube active
    case — shared by the FPI and Newton tests."""
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import (
        gaussian_function,
        rho_step,
        temperature_step,
    )
    from helmholtz_x_tpu.flame import DistributedFlameMatrix
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.mesh import one_dimensional_setup

    mesh = one_dimensional_setup(n_elem)
    T = temperature_step(mesh, x_f, T_u, T_d)
    matrices = AcousticMatrices(mesh, {1: {"Neumann"}, 2: {"Neumann"}}, T)
    rho = rho_step(mesh, x_f, a_f, rho_d, rho_u)
    D = DistributedFlameMatrix(mesh, gaussian_function(mesh, x_r, a_r),
                               gaussian_function(mesh, x_f, a_f), rho, T,
                               q_0, u_b, nTau(n, tau))
    D.assemble_submatrices()
    return mesh, matrices, D
