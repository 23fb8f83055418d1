"""PRF nondimensional Rijke tube 3D parameters (reference numerical_examples/
Longitudinal/PRF/RijkeTube3D/params.py).  The tube axis is z."""

import numpy as np

MESH = ("/root/reference/numerical_examples/Longitudinal/PRF/"
        "RijkeTube3D/MeshDir/mesh")

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
c_u = np.sqrt(gamma * p_amb / rho_in_dim) / U_ref
c_d = np.sqrt(gamma * p_amb / rho_out_dim) / U_ref

n_ftf = 0.014 / (p_ref * L_ref**2)  # no cross-section scaling in 3D
tau = 0.0015 * U_ref / L_ref
q_0, u_b = 200.0, 0.1
R_in = R_out = -0.975 - 0.05j

x_f = np.array([[0.0, 0.0, 0.25]])
x_r = np.array([[0.0, 0.0, 0.20]])
a_f = a_r = 0.025

boundary_conditions = {1: {"Neumann"}, 2: {"Robin": R_out}, 3: {"Robin": R_in}}
target = np.pi
